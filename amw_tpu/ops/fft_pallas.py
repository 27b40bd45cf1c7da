"""Pallas TPU FFT: three matmul stages, permuted spectrum, no transposes.

XLA's TPU FFT measures ~59 ms per direction for [16, 2^23] f32 on v5e —
roughly 10x off the HBM roofline for a transform that is fundamentally a
few bandwidth-bound passes.  This module implements the classic four-step
decomposition as three Pallas stages, with two structural choices that keep
every pass a pure streaming matmul:

1. **No transposes.**  Each stage contracts one axis of the [A, B, C] view
   of the signal (N = A·B·C) with a small DFT matrix.  The contraction axis
   is always placed on the minor-two (sublane/lane) dims of the block, so
   the MXU consumes it directly — the HBM layout never changes.  (The
   earlier matmul-FFT attempt, ops/fft_mxu.py, lost 3.4x to exactly these
   relayouts when expressed as XLA swapaxes.)

2. **Permuted spectrum.**  Stage-wise contraction without reordering yields
   X[k] stored at digit-permuted positions (k = a' + A·b' + A·B·c' stored
   at a'·BC + b'·C + c').  For convolution/filtering — this framework's
   only use of the FFT — the ordering is irrelevant: the frequency response
   is permuted host-side once (`permute_full_response`), the pointwise
   multiply happens in permuted order, and the inverse stages (adjoint,
   reversed, conjugated) restore natural order.  No bit-reversal pass ever
   touches the data.

Twiddle factors factor into outer products of tiny tables (W1[A,B]·W2[A,C]
between stages 1-2, T2[B,C] between 2-3), so they ride in VMEM instead of
adding an HBM stream.  All complex values travel as separate (re, im) f32
arrays (the TPU relay cannot transfer complex, and the MXU wants real
matmuls); matmuls run at Precision.HIGHEST for f32-accurate DFTs.

Supported sizes: N = 128·128·C with C a power of two in [128, 1024]
(i.e. N in [2^21, 2^24] — the mastering chain's track-length transforms;
smaller plans stay on XLA's FFT).  Real-input filtering enters through
`apply_response` (real signal on the full complex grid, imag=0): the extra
arithmetic is hidden under the memory streams this kernel is bound by.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

A = 128
B = 128

_HI = jax.lax.Precision.HIGHEST


def plan_ok(nfft: int) -> bool:
    if nfft % (A * B):
        return False
    c = nfft // (A * B)
    return 128 <= c <= 1024 and (c & (c - 1)) == 0


# ---------------------------------------------------------------------------
# host-side tables


@functools.lru_cache(maxsize=None)
def _tables(nfft: int, inverse: bool):
    C = nfft // (A * B)
    sign = 2.0 if inverse else -2.0
    wa = np.exp(sign * 1j * np.pi * np.outer(np.arange(A), np.arange(A)) / A)
    wb = np.exp(sign * 1j * np.pi * np.outer(np.arange(B), np.arange(B)) / B)
    wc = np.exp(sign * 1j * np.pi * np.outer(np.arange(C), np.arange(C)) / C)
    w1 = np.exp(sign * 1j * np.pi * np.outer(np.arange(A), np.arange(B) * C) / nfft)
    w2 = np.exp(sign * 1j * np.pi * np.outer(np.arange(A), np.arange(C)) / nfft)
    t2 = np.exp(sign * 1j * np.pi * np.outer(np.arange(B), np.arange(C)) / (B * C))
    f32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return tuple(map(f32, (wa, wb, wc, w1, w2, t2)))


@functools.lru_cache(maxsize=None)
def _perm(nfft: int) -> np.ndarray:
    """k at stored position (a', b', c'): k = a' + A·b' + A·B·c'."""
    C = nfft // (A * B)
    a = np.arange(A)[:, None, None]
    b = np.arange(B)[None, :, None]
    c = np.arange(C)[None, None, :]
    return (a + A * b + A * B * c).ravel()


def permute_full_response(H_half: np.ndarray, nfft: int) -> np.ndarray:
    """Half-spectrum response ([nfft//2+1], complex or real) → full
    conj-symmetric spectrum in the kernel's permuted storage order, packed
    as float32 [2, nfft] (re, im)."""
    H_half = np.asarray(H_half, np.complex128)
    full = np.empty(nfft, np.complex128)
    full[: nfft // 2 + 1] = H_half
    full[nfft // 2 + 1:] = np.conj(H_half[1: nfft // 2][::-1])
    fp = full[_perm(nfft)]
    return np.stack([fp.real, fp.imag]).astype(np.float32)


# ---------------------------------------------------------------------------
# kernels (refs arrive in in_specs order, then out refs)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _dot_l(Fr, Fi, xr, xi):
    """(F @ x): contract x's sublane axis."""
    dot = lambda m, v: jax.lax.dot_general(
        m, v, (((1,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32)
    return dot(Fr, xr) - dot(Fi, xi), dot(Fr, xi) + dot(Fi, xr)


def _dot_r(xr, xi, Fr, Fi):
    """(x @ F): contract x's lane axis."""
    dot = lambda v, m: jax.lax.dot_general(
        v, m, (((1,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32)
    return dot(xr, Fr) - dot(xi, Fi), dot(xr, Fi) + dot(xi, Fr)


def _stage_a_kernel(xr_ref, xi_ref, fr_ref, fi_ref, w1r_ref, w1i_ref,
                    w2r_ref, w2i_ref, or_ref, oi_ref, *, pre, scale):
    xr = xr_ref[0]
    xi = xi_ref[0]
    twr, twi = _cmul(w1r_ref[...], w1i_ref[...], w2r_ref[...], w2i_ref[...])
    if pre:
        xr, xi = _cmul(xr, xi, twr, twi)
    yr, yi = _dot_l(fr_ref[...], fi_ref[...], xr, xi)
    if not pre:
        yr, yi = _cmul(yr, yi, twr, twi)
    if scale != 1.0:
        yr = yr * scale
        yi = yi * scale
    or_ref[0] = yr
    oi_ref[0] = yi


def _stage_b_kernel(xr_ref, xi_ref, fr_ref, fi_ref, tr_ref, ti_ref,
                    or_ref, oi_ref, *, pre):
    xr = xr_ref[0, 0]
    xi = xi_ref[0, 0]
    twr = tr_ref[...]
    twi = ti_ref[...]
    if pre:
        xr, xi = _cmul(xr, xi, twr, twi)
    yr, yi = _dot_l(fr_ref[...], fi_ref[...], xr, xi)
    if not pre:
        yr, yi = _cmul(yr, yi, twr, twi)
    or_ref[0, 0] = yr
    oi_ref[0, 0] = yi


def _stage_c_kernel(xr_ref, xi_ref, fr_ref, fi_ref, or_ref, oi_ref):
    yr, yi = _dot_r(xr_ref[0, 0], xi_ref[0, 0], fr_ref[...], fi_ref[...])
    or_ref[0, 0] = yr
    oi_ref[0, 0] = yi


def _stage_c_resp_kernel(xr_ref, xi_ref, fr_ref, fi_ref, rr_ref, ri_ref,
                         or_ref, oi_ref, *, pre_mul):
    """Stage-C contraction with a fused pointwise response multiply —
    before the matmul on the inverse side (pre_mul=True), which is where
    the forward spectrum meets the response."""
    xr = xr_ref[0, 0]
    xi = xi_ref[0, 0]
    if pre_mul:
        xr, xi = _cmul(xr, xi, rr_ref[0], ri_ref[0])
    yr, yi = _dot_r(xr, xi, fr_ref[...], fi_ref[...])
    if not pre_mul:
        yr, yi = _cmul(yr, yi, rr_ref[0], ri_ref[0])
    or_ref[0, 0] = yr
    oi_ref[0, 0] = yi


# ---------------------------------------------------------------------------
# stage drivers


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda r, j: (0,) * nd)


def _stage_a(xr, xi, nfft, inverse, interpret=False):
    """Contract the A axis.  x: [R, nfft] viewed as [R, A, B*C]."""
    C = nfft // (A * B)
    wa, _, _, w1, w2, _ = _tables(nfft, inverse)
    R = xr.shape[0]
    xr3 = xr.reshape(R, A, B * C)
    xi3 = xi.reshape(R, A, B * C)
    scale = (1.0 / nfft) if inverse else 1.0
    kern = functools.partial(_stage_a_kernel, pre=inverse, scale=scale)
    spec_x = pl.BlockSpec((1, A, C), lambda r, j: (r, 0, j))
    spec_w1 = pl.BlockSpec((A, 1), lambda r, j: (0, j))
    out = pl.pallas_call(
        kern,
        grid=(R, B),
        in_specs=[spec_x, spec_x,
                  _const_spec((A, A)), _const_spec((A, A)),
                  spec_w1, spec_w1,
                  _const_spec((A, C)), _const_spec((A, C))],
        out_specs=[spec_x, spec_x],
        out_shape=[jax.ShapeDtypeStruct(xr3.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(xr3, xi3, jnp.asarray(wa[0]), jnp.asarray(wa[1]),
      jnp.asarray(w1[0]), jnp.asarray(w1[1]),
      jnp.asarray(w2[0]), jnp.asarray(w2[1]))
    return out[0].reshape(R, nfft), out[1].reshape(R, nfft)


def _stage_b(xr, xi, nfft, inverse, interpret=False):
    """Contract the B axis.  x viewed as [R, A, B, C]."""
    C = nfft // (A * B)
    _, wb, _, _, _, t2 = _tables(nfft, inverse)
    R = xr.shape[0]
    xr4 = xr.reshape(R, A, B, C)
    xi4 = xi.reshape(R, A, B, C)
    kern = functools.partial(_stage_b_kernel, pre=inverse)
    spec_x = pl.BlockSpec((1, 1, B, C), lambda r, i: (r, i, 0, 0))
    out = pl.pallas_call(
        kern,
        grid=(R, A),
        in_specs=[spec_x, spec_x,
                  _const_spec((B, B)), _const_spec((B, B)),
                  _const_spec((B, C)), _const_spec((B, C))],
        out_specs=[spec_x, spec_x],
        out_shape=[jax.ShapeDtypeStruct(xr4.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(xr4, xi4, jnp.asarray(wb[0]), jnp.asarray(wb[1]),
      jnp.asarray(t2[0]), jnp.asarray(t2[1]))
    return out[0].reshape(R, nfft), out[1].reshape(R, nfft)


def _stage_c(xr, xi, nfft, inverse, resp=None, interpret=False):
    """Contract the C axis; optionally fuse the permuted response multiply
    (resp: [2, nfft] f32 planes; pre-matmul when inverse)."""
    C = nfft // (A * B)
    _, _, wc, _, _, _ = _tables(nfft, inverse)
    R = xr.shape[0]
    xr4 = xr.reshape(R, A, B, C)
    xi4 = xi.reshape(R, A, B, C)
    spec_x = pl.BlockSpec((1, 1, B, C), lambda r, i: (r, i, 0, 0))
    f_in = [jnp.asarray(wc[0]), jnp.asarray(wc[1])]
    f_specs = [_const_spec((C, C)), _const_spec((C, C))]
    if resp is None:
        out = pl.pallas_call(
            _stage_c_kernel,
            grid=(R, A),
            in_specs=[spec_x, spec_x] + f_specs,
            out_specs=[spec_x, spec_x],
            out_shape=[jax.ShapeDtypeStruct(xr4.shape, jnp.float32)] * 2,
            interpret=interpret,
        )(xr4, xi4, *f_in)
    else:
        rr = resp[0].reshape(A, B, C)
        ri = resp[1].reshape(A, B, C)
        spec_r = pl.BlockSpec((1, B, C), lambda r, i: (i, 0, 0))
        kern = functools.partial(_stage_c_resp_kernel, pre_mul=inverse)
        out = pl.pallas_call(
            kern,
            grid=(R, A),
            in_specs=[spec_x, spec_x] + f_specs + [spec_r, spec_r],
            out_specs=[spec_x, spec_x],
            out_shape=[jax.ShapeDtypeStruct(xr4.shape, jnp.float32)] * 2,
            interpret=interpret,
        )(xr4, xi4, *f_in, rr, ri)
    return out[0].reshape(R, nfft), out[1].reshape(R, nfft)


# ---------------------------------------------------------------------------
# public API


def fft_permuted(xr, xi, nfft: int, interpret: bool = False):
    """Forward FFT of [R, nfft] (re, im) → permuted spectrum (re, im)."""
    xr, xi = _stage_a(xr, xi, nfft, False, interpret)
    xr, xi = _stage_b(xr, xi, nfft, False, interpret)
    return _stage_c(xr, xi, nfft, False, interpret=interpret)


def ifft_permuted(Xr, Xi, nfft: int, interpret: bool = False):
    """Inverse of :func:`fft_permuted` (adjoint stages, reversed)."""
    Xr, Xi = _stage_c(Xr, Xi, nfft, True, interpret=interpret)
    Xr, Xi = _stage_b(Xr, Xi, nfft, True, interpret)
    return _stage_a(Xr, Xi, nfft, True, interpret)


def apply_response(x, resp_perm, nfft: int, n_out: int | None = None,
                   interpret: bool = False):
    """``irfft(rfft(x, nfft) * H)[..., :n_out]`` for real ``x`` via the
    permuted-spectrum pipeline.  ``resp_perm``: [2, nfft] planes from
    :func:`permute_full_response`.  Leading dims of ``x`` flatten to rows.
    The response multiply is fused into the first inverse stage."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    xr = x.reshape(R, n)
    if n < nfft:
        xr = jnp.pad(xr, ((0, 0), (0, nfft - n)))
    elif n > nfft:
        xr = xr[:, :nfft]
    zero = jnp.zeros_like(xr)
    Xr, Xi = _stage_a(xr, zero, nfft, False, interpret)
    Xr, Xi = _stage_b(Xr, Xi, nfft, False, interpret)
    Xr, Xi = _stage_c(Xr, Xi, nfft, False, interpret=interpret)
    Yr, Yi = _stage_c(Xr, Xi, nfft, True, resp=resp_perm, interpret=interpret)
    Yr, Yi = _stage_b(Yr, Yi, nfft, True, interpret)
    Yr, _ = _stage_a(Yr, Yi, nfft, True, interpret)
    m = nfft if n_out is None else n_out
    return Yr[:, :m].reshape(lead + (m,))
