"""Device-side frequency-domain LTI filtering (XLA FFT path).

Every ``scipy.signal.lfilter`` / ``filtfilt`` / ``fftconvolve`` call in the
reference DSP chain (backend/app/pipeline.py) maps onto one of three
primitives here, all of which compile to rFFT → complex multiply → irFFT on
TPU:

- :func:`lfilter_fd`   — causal filtering with zero initial state
                         (``scipy.signal.lfilter(b, a, x)`` semantics).
- :func:`filtfilt_fd`  — zero-phase forward-backward filtering with exact
                         emulation of scipy's ``filtfilt`` edge handling
                         (odd extension + steady-state initial conditions,
                         scipy default ``padtype='odd'``,
                         ``padlen=3*max(len(a),len(b))``), or a fused
                         single-pass ``|H|²`` approximation (``exact=False``)
                         that differs only in sub-settling-length edge
                         transients.
- :func:`fftconvolve_same_fd` — FIR convolution with 'same' cropping
                         (``scipy.signal.fftconvolve(x, h, mode='same')``).

IIR responses are exact up to tail truncation at ``design.SETTLE_EPS``; the
caller supplies ``settle`` (from :func:`amw_tpu.ops.design.settle_len`) and an
FFT size with enough guard:  ``nfft >= n + 2*padlen + 3*settle`` for the exact
path.  Responses ``H`` are host-designed float64 arrays converted to
complex64/float32 device arrays — they are the "weights" of the mastering
graph and are reused across calls/batches.

All functions operate on the trailing axis and broadcast over leading axes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _rfft(x, nfft):
    return jnp.fft.rfft(x, n=nfft, axis=-1)


def _irfft(X, nfft):
    return jnp.fft.irfft(X, n=nfft, axis=-1)


def _use_mxu_fft(nfft: int) -> bool:
    """Route large power-of-two transforms through the matmul FFT
    (ops.fft_mxu) when enabled — see AMW_FFT_MXU."""
    if os.environ.get("AMW_FFT_MXU", "0") != "1":
        return False
    return nfft >= (1 << 16) and (nfft & (nfft - 1)) == 0


def _apply_response(x, H, nfft: int, conj: bool = False):
    """irfft(rfft(x, nfft) * H)[:nfft] with selectable FFT backend.

    ``H`` may be complex (causal/exact responses) or real (zero-phase power
    responses)."""
    if _use_mxu_fft(nfft):
        from .fft_mxu import irfft_mxu, rfft_mxu

        xr, xi = rfft_mxu(x, nfft)
        if jnp.iscomplexobj(H):
            Hr, Hi = jnp.real(H), jnp.imag(H)
            if conj:
                Hi = -Hi
            yr = xr * Hr - xi * Hi
            yi = xr * Hi + xi * Hr
        else:
            yr = xr * H
            yi = xi * H
        return irfft_mxu(yr, yi, nfft)
    if conj:
        H = jnp.conj(H)
    return _irfft(_rfft(x, nfft) * H, nfft)


def odd_ext(x: jax.Array, p: int) -> jax.Array:
    """Odd extension by ``p`` samples at both ends (scipy ``odd_ext``)."""
    if p <= 0:
        return x
    left = 2.0 * x[..., :1] - x[..., p:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2:-p - 2:-1]
    return jnp.concatenate([left, x, right], axis=-1)


def lfilter_fd(x: jax.Array, H: jax.Array, nfft: int) -> jax.Array:
    """Causal LTI filter, zero initial state.  ``H``: complex response on the
    rFFT grid of ``nfft``.  Requires ``nfft >= x.shape[-1] + settle``."""
    n = x.shape[-1]
    y = _apply_response(x, H, nfft)
    return y[..., :n]


def filtfilt_fd(
    x: jax.Array,
    H: jax.Array,
    nfft: int,
    *,
    padlen: int,
    settle: int,
    exact: bool = True,
) -> jax.Array:
    """Zero-phase forward-backward filter.

    exact=True  — two FFT passes reproducing scipy ``filtfilt``'s odd
                  extension and ``lfilter_zi`` steady-state initialisation
                  (emulated with a ``settle``-sample constant prefix/suffix,
                  exact to the IR truncation level).  ``H`` is the *causal*
                  cascade response (complex).
    exact=False — single fused pass multiplying by ``|H|²`` (pass
                  ``H = |H|²`` as a real array); edge transients differ from
                  scipy within ~``settle`` samples of the track ends.
    """
    n = x.shape[-1]
    p = min(padlen, max(n - 1, 0))
    core = odd_ext(x, p)  # length n + 2p
    ncore = n + 2 * p

    if not exact:
        y = _apply_response(core, H, nfft)
        return y[..., p:p + n]

    M = settle
    x0 = core[..., :1]
    prefix = jnp.broadcast_to(x0, x.shape[:-1] + (M,))
    ext1 = jnp.concatenate([prefix, core], axis=-1)
    yf = _apply_response(ext1, H, nfft)[..., M:M + ncore]

    y_end = yf[..., -1:]
    suffix = jnp.broadcast_to(y_end, x.shape[:-1] + (M,))
    ext2 = jnp.concatenate([yf, suffix], axis=-1)
    # Anti-causal pass: multiply by conj(H) == reverse, filter, reverse with
    # the right-end steady state provided by the constant suffix.
    z = _apply_response(ext2, H, nfft, conj=True)
    return z[..., p:p + n]


def fftconvolve_same_fd(x: jax.Array, h: jax.Array, nfft: int) -> jax.Array:
    """Linear convolution with 'same' cropping (centered), matching
    ``scipy.signal.fftconvolve(x, h, mode='same')``.  ``h`` is a 1-D FIR
    (device array); requires ``nfft >= n + len(h) - 1``.

    Measured on TPU v5e: XLA's single large FFT outperforms both a direct
    VPU convolution (1-channel conv lowering is poor) and batched
    overlap-save windows (~1.7x slower from the 2x halo traffic), so short
    kernels deliberately share this path.
    """
    n = x.shape[-1]
    L = h.shape[-1]
    y = _irfft(_rfft(x, nfft) * _rfft(h, nfft), nfft)
    start = (L - 1) // 2
    return y[..., start:start + n]


def _box_pallas(x2: jax.Array, k: int) -> jax.Array:
    """Pallas moving-average kernel over [R, n] (zero-padded edges).

    XLA lowers the k-term shift-add as ~k separate passes (66 ms for k=67
    at [16, 2^23] on v5e); here each grid step loads its block plus both
    neighbors and does the k adds in VMEM — bandwidth-bound at ~2 passes
    (~2 ms)."""
    from jax.experimental import pallas as pl

    R, n = x2.shape
    TB = 1 << 11
    half = k // 2
    nb = -(-n // TB)
    xp = jnp.pad(x2, ((0, 0), (0, nb * TB - n)))

    def kernel(prev_ref, cur_ref, nxt_ref, o_ref):
        j = pl.program_id(0)
        prev = jnp.where(j > 0, prev_ref[...], 0.0)
        nxt = jnp.where(j < pl.num_programs(0) - 1, nxt_ref[...], 0.0)
        win = jnp.concatenate(
            [prev[:, TB - half:], cur_ref[...], nxt[:, :half]], axis=-1)
        acc = win[:, :TB]
        for s in range(1, k):
            acc = acc + win[:, s:s + TB]
        o_ref[...] = acc * (1.0 / k)

    spec_c = pl.BlockSpec((R, TB), lambda j: (0, j))
    spec_p = pl.BlockSpec((R, TB), lambda j: (0, jnp.maximum(j - 1, 0)))
    spec_n = pl.BlockSpec(
        (R, TB), lambda j: (0, jnp.minimum(j + 1, nb - 1)))
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec_p, spec_c, spec_n],
        out_specs=spec_c,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2.dtype),
    )(xp, xp, xp)
    return out[:, :n]


def box_smooth_same(x: jax.Array, k: int) -> jax.Array:
    """Centered moving average of odd width ``k`` with zero-padded edges —
    bit-equivalent (up to f32 summation order) to
    ``fftconvolve_same_fd(x, ones(k)/k, nfft)``.

    The deesser's gain-smoothing kernel is a ~66-tap box; routing it through
    the giant track-length FFT costs a full forward+inverse pass (~109 ms
    for [16, 2^23] on v5e) and the XLA shift-add still ~66 ms; on TPU a
    Pallas halo kernel does it in ~2 HBM passes."""
    if k <= 1:
        return x
    n = x.shape[-1]
    half = k // 2
    lead = x.shape[:-1]
    import numpy as _np

    R = int(_np.prod(lead)) if lead else 1
    if k < n and half < (1 << 11) and R >= 8:
        # R < 8 (e.g. a [2, n] track under vmap) would force 4x-padded
        # sublane tiles and tiny DMAs — the halo kernel only wins with
        # enough rows per block.
        try:
            plat = jax.devices()[0].platform
        except Exception:  # noqa: BLE001
            plat = "cpu"
        if plat in ("tpu", "axon"):
            return _box_pallas(x.reshape(R, n), k).reshape(lead + (n,))
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, k - 1 - half)])
    a = 8
    b = k // a
    if b >= 2:
        # Two-level sliding sum: k = a*b + r needs a+b+r shifted adds
        # instead of k (XLA materializes each shifted add as a pass).
        r = k - a * b
        La = n + k - a
        sa = xp[..., 0:La]
        for s in range(1, a):
            sa = sa + xp[..., s:s + La]
        acc = sa[..., 0:n]
        for j in range(1, b):
            acc = acc + sa[..., j * a:j * a + n]
        for s in range(a * b, k):
            acc = acc + xp[..., s:s + n]
        return acc * (1.0 / k)
    acc = xp[..., :n]
    for s in range(1, k):
        acc = acc + xp[..., s:s + n]
    return acc * (1.0 / k)


def resample_fft(x: jax.Array, n_out: int) -> jax.Array:
    """FFT-domain resampling with ``scipy.signal.resample`` semantics for real
    input (reference: pipeline.py:920-936 and the exciter oversampling path).

    Matches scipy's rfft-based branch: spectrum truncation/zero-padding with
    Nyquist-bin halving/doubling and ``n_out/n_in`` amplitude scaling.
    """
    n_in = x.shape[-1]
    if n_out == n_in:
        return x
    X = jnp.fft.rfft(x, axis=-1)
    nyq_out = n_out // 2 + 1
    if n_out < n_in:
        X = X[..., :nyq_out]
        # When the new length is even, the new Nyquist bin aggregates both
        # conjugate halves of the old interior bin (scipy doubles it; irfft
        # then uses its real part once).
        if n_out % 2 == 0:
            X = X.at[..., -1].set(X[..., -1] * 2.0)
    else:
        if n_in % 2 == 0:
            # Old Nyquist bin becomes an interior bin: split between the
            # positive and (implicit) negative frequency.
            X = X.at[..., -1].set(X[..., -1] * 0.5)
        pad = nyq_out - X.shape[-1]
        X = jnp.concatenate(
            [X, jnp.zeros(x.shape[:-1] + (pad,), X.dtype)], axis=-1
        )
    y = jnp.fft.irfft(X, n=n_out, axis=-1)
    return y * (n_out / n_in)
