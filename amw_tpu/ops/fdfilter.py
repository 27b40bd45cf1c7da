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


def odd_ext(x: jax.Array, p: int, pad_to: int | None = None) -> jax.Array:
    """Odd extension by ``p`` samples at both ends (scipy ``odd_ext``).

    ``pad_to``: optionally zero-pad the result to this total length in the
    SAME concatenate — an FFT consumer then skips its own pad-to-nfft pass
    (one full HBM round trip of the track saved)."""
    if p <= 0:
        if pad_to is not None and pad_to > x.shape[-1]:
            return jnp.pad(x, ((0, 0),) * (x.ndim - 1)
                           + ((0, pad_to - x.shape[-1]),))
        return x
    left = 2.0 * x[..., :1] - x[..., p:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2:-p - 2:-1]
    parts = [left, x, right]
    total = x.shape[-1] + 2 * p
    if pad_to is not None and pad_to > total:
        parts.append(jnp.zeros(x.shape[:-1] + (pad_to - total,), x.dtype))
    return jnp.concatenate(parts, axis=-1)


def odd_ext_valid(x: jax.Array, p: int, nv,
                  pad_to: int | None = None) -> jax.Array:
    """Odd extension anchored at the traced valid end.

    ``x`` must be zero beyond ``nv``.  Returns a buffer of static length
    ``n + 2p`` (or ``pad_to``, see :func:`odd_ext`): left extension
    (around t=0), the signal, then the right odd extension written at
    position ``p + nv`` (zeros beyond).  With ``nv == n`` this equals
    :func:`odd_ext`."""
    if p <= 0:
        return odd_ext(x, 0, pad_to)
    n = x.shape[-1]
    tail = max(p, (pad_to - n - p) if pad_to is not None else p)
    left = 2.0 * x[..., :1] - x[..., p:0:-1]
    buf = jnp.concatenate(
        [left, x, jnp.zeros(x.shape[:-1] + (tail,), x.dtype)], axis=-1)
    from .validctx import gather_last

    last = gather_last(x, nv)
    idx = jnp.maximum(nv - 2 - jnp.arange(p), 0)
    right = 2.0 * last - x[..., idx]
    return jax.lax.dynamic_update_slice_in_dim(buf, right, p + nv, axis=-1)


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
    nv=None,
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
    nv          — traced valid length for bucket-padded input (track end at
                  ``nv`` instead of ``n``; output zeroed beyond).
    """
    n = x.shape[-1]
    p = min(padlen, max(n - 1, 0))
    core = odd_ext(x, p) if nv is None else odd_ext_valid(x, p, nv)
    ncore = n + 2 * p

    if not exact:
        y = _apply_response(core, H, nfft)[..., p:p + n]
        if nv is None:
            return y
        from .validctx import mask_tail

        return mask_tail(y, nv)

    M = settle
    x0 = core[..., :1]
    prefix = jnp.broadcast_to(x0, x.shape[:-1] + (M,))
    ext1 = jnp.concatenate([prefix, core], axis=-1)
    yf = _apply_response(ext1, H, nfft)[..., M:M + ncore]

    if nv is None:
        y_end = yf[..., -1:]
        suffix = jnp.broadcast_to(y_end, x.shape[:-1] + (M,))
        ext2 = jnp.concatenate([yf, suffix], axis=-1)
        # Anti-causal pass: multiply by conj(H) == reverse, filter, reverse
        # with the right-end steady state provided by the constant suffix.
        z = _apply_response(ext2, H, nfft, conj=True)
        return z[..., p:p + n]

    from .validctx import mask_tail

    # Valid-end variant: the forward output past the right extension
    # (position nv + 2p in core coordinates) is ringout that the exact-length
    # computation never produces — zero it, then write the steady-state
    # suffix at the traced boundary.
    end = nv + 2 * p  # core-coordinate end of the right extension
    t = jnp.arange(ncore)
    yf = jnp.where(t < end, yf, jnp.zeros((), yf.dtype))
    from .validctx import gather_last

    y_end = gather_last(yf, end)
    ext2 = jnp.concatenate(
        [yf, jnp.zeros(x.shape[:-1] + (M,), yf.dtype)], axis=-1)
    suffix = jnp.broadcast_to(y_end, x.shape[:-1] + (M,))
    ext2 = jax.lax.dynamic_update_slice_in_dim(ext2, suffix, end, axis=-1)
    z = _apply_response(ext2, H, nfft, conj=True)
    return mask_tail(z[..., p:p + n], nv)


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
    neighbors and sums in VMEM.  The sum uses the same two-level sliding
    decomposition as the XLA fallback (a=8 unit shifts, then stride-a
    shifts, then the remainder — a+b+r ≈ 19 lane-rotations instead of k):
    each unaligned lane slice costs a vreg rotation, so the flat k-term
    loop was compute-bound on rotations (17.7 ms for k=67 at [16, 7.9M]
    on v5e), ~7x the two-pass HBM floor."""
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
        a = 8
        b = k // a
        if b >= 2:
            La = TB + k - a
            sa = win[:, 0:La]
            for s in range(1, a):
                sa = sa + win[:, s:s + La]
            acc = sa[:, 0:TB]
            for j2 in range(1, b):
                acc = acc + sa[:, j2 * a:j2 * a + TB]
            for s in range(a * b, k):
                acc = acc + win[:, s:s + TB]
        else:
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
        # sublane tiles — and a time-folded variant (segments with k-1
        # halos into R*S rows) measured SLOWER under vmap (31 ms vs the
        # XLA shift-add's 20 ms at [2, 7.9M]): the batched pallas grid
        # plus the stack/crop copies eat the kernel's win.
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
        # NOTE: a binary-doubling decomposition (log2 k passes) measured
        # FASTER in isolation (18.2 vs 20.0 ms) but regressed the fused
        # chain by ~30 ms/batch-8 — the longer dependency chain of reused
        # intermediates fuses worse inside the full graph.  Keep a*b+r.
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


def fft_native_ok(n: int) -> bool:
    """Is a length-``n`` FFT in XLA-TPU's natively supported size set
    ({1,3,5}·2^k)?  Any other length is lowered as a materialized DFT
    matmul — an O(n²) catastrophe (an f32[n, n] operand) at track lengths."""
    m = n
    while m % 2 == 0 and m > 1:
        m //= 2
    return m in (1, 3, 5)


def _chirp_tables(n: int, L: int):
    """Host-side Bluestein (chirp-z) tables for a length-``n`` DFT computed
    with length-``L`` (native-size) FFTs: ``a[k] = exp(-iπk²/n)`` and the
    spectrum of the circularly packed conjugate chirp.  Phases are reduced
    mod 2n in exact integer arithmetic so float64 stays accurate at k ~ 10^7.
    Returned as stacked (re, im) float32 pairs — complex arrays must never
    cross the host↔device relay (docs/TPU_NOTES.md)."""
    import numpy as np

    k = np.arange(n, dtype=np.int64)
    ph = np.pi * ((k * k) % (2 * n)).astype(np.float64) / n
    a = np.exp(-1j * ph)
    b = np.zeros(L, np.complex128)
    b[:n] = np.conj(a)
    if n > 1:
        b[L - (n - 1):] = np.conj(a[1:])[::-1]
    Bf = np.fft.fft(b)
    return (np.stack([a.real, a.imag]).astype(np.float32),
            np.stack([Bf.real, Bf.imag]).astype(np.float32))


def resample_plan(n_in: int, n_out: int):
    """Bluestein tables for :func:`resample_fft` when either length is not a
    native FFT size.  Returns ``None`` when the plain path is safe (always
    pass the result as a *runtime argument* to the jitted caller — the
    tables are tens of MB and would overflow a remote compile as literals)."""
    from .design import next_fft_size

    plan = {}
    if n_in != n_out:
        if not fft_native_ok(n_in):
            plan["fwd"] = _chirp_tables(n_in, next_fft_size(2 * n_in - 1))
        if not fft_native_ok(n_out):
            plan["inv"] = _chirp_tables(n_out, next_fft_size(2 * n_out - 1))
    return plan or None


def _cx(pair):
    return jax.lax.complex(pair[0], pair[1])


def _bluestein_dft(z: jax.Array, tables) -> jax.Array:
    """Length-``n`` complex DFT of ``z`` via native-size FFTs (chirp-z):
    ``DFT(z)_k = a_k · IFFT_L(FFT_L(z·a) · Bf)_k``."""
    a = _cx(tables[0])
    Bf = _cx(tables[1])
    n = z.shape[-1]
    L = Bf.shape[-1]
    za = z * a
    pad = [(0, 0)] * (z.ndim - 1) + [(0, L - n)]
    Z = jnp.fft.fft(jnp.pad(za, pad), axis=-1)
    return jnp.fft.ifft(Z * Bf, axis=-1)[..., :n] * a


def _resample_1d(x: jax.Array, n_out: int, plan) -> jax.Array:
    """scipy.signal.resample spectrum surgery on the trailing axis, using
    Bluestein for whichever side has a non-native length."""
    n_in = x.shape[-1]
    nyq_out = n_out // 2 + 1
    if plan is not None and "fwd" in plan:
        X = _bluestein_dft(x.astype(jnp.complex64),
                           plan["fwd"])[..., : n_in // 2 + 1]
    else:
        X = jnp.fft.rfft(x, axis=-1)
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
    if plan is not None and "inv" in plan:
        # Hermitian-extend the rfft bins to the full spectrum, then the
        # inverse DFT via conj(DFT(conj(·)))/n.
        neg = jnp.conj(X[..., 1:n_out - nyq_out + 1])[..., ::-1]
        Xf = jnp.concatenate([X, neg], axis=-1)
        y = jnp.real(jnp.conj(_bluestein_dft(jnp.conj(Xf),
                                             plan["inv"]))) / n_out
    else:
        y = jnp.fft.irfft(X, n=n_out, axis=-1)
    return y * (n_out / n_in)


def resample_fft(x: jax.Array, n_out: int, plan=None) -> jax.Array:
    """FFT-domain resampling with ``scipy.signal.resample`` semantics for real
    input (reference: pipeline.py:920-936, the exciter oversampling path, and
    ``/api/v2/upscale``).

    Matches scipy's rfft-based branch: spectrum truncation/zero-padding with
    Nyquist-bin halving/doubling and ``n_out/n_in`` amplitude scaling.

    ``plan`` (from :func:`resample_plan`): required on TPU when either length
    is outside the native FFT size set — routes that side through a Bluestein
    chirp-z transform built from native-size FFTs.  Rows are processed
    sequentially through ``lax.map`` in that case to bound the ~2·L complex64
    working set (L can be 2^25 at track lengths)."""
    n_in = x.shape[-1]
    if n_out == n_in:
        return x
    if plan is None:
        return _resample_1d(x, n_out, None)
    rows = x.reshape((-1, n_in))
    R = rows.shape[0]
    if R <= 4:
        return _resample_1d(x, n_out, plan)
    # Largest row-chunk <= 4 dividing R: the chunk is vmapped (parallel on
    # device), chunks run sequentially under lax.map to bound peak memory.
    chunk = next(c for c in (4, 3, 2, 1) if R % c == 0)
    if chunk == 1:
        y = jax.lax.map(lambda r: _resample_1d(r, n_out, plan), rows)
    else:
        y = jax.lax.map(lambda rc: _resample_1d(rc, n_out, plan),
                        rows.reshape(R // chunk, chunk, n_in))
    return y.reshape(x.shape[:-1] + (n_out,))
