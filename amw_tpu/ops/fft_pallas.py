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
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

A = 128
B = 128

# MXU dot precision for f32 operands: DEFAULT is one bf16 pass (~3e-2
# relative error — unusable for a -90 dBFS budget); HIGHEST is the 6-pass
# decomposition (full f32).  The kernel is MXU-bound at HIGHEST, so the
# 3-pass bf16 decomposition is a ~2x lever on the dot time — and it must
# be built BY HAND: Mosaic lowers only DEFAULT and HIGHEST, silently
# degrading lax HIGH to the one-pass bf16 path (docs/TPU_NOTES.md), so a
# "high" mode is deliberately not offered.  AMW_FFT_DOT_PREC selects:
#   "highest"        — lax precision HIGHEST (6-pass, full f32)
#   "bf16x3"         — explicit 3-pass split from plain bf16 dots
#                      (a_hi·b_hi + a_hi·b_lo + a_lo·b_hi), ~1e-5 rel
#   "auto" (default) — bf16x3 on TPU backends, highest elsewhere.
#                      Gated on the v5e (scripts/bench_fft_precision.py):
#                      [16, 2^23] response pair 175 ms -> 126 ms, round-trip
#                      parity -100.1 dBFS vs the f64 oracle (budget -90).
# MXU cost is otherwise controlled by keeping every DFT factor at radix
# ≤ 128 (the C-axis stage splits C = C2·128 in-kernel: VPU radix-C2
# butterfly + one 128-point matmul per chunk — 4x fewer MACs than a
# single C×C matmul at C=512).
_MODE = os.environ.get("AMW_FFT_DOT_PREC", "auto")
if _MODE not in ("auto", "highest", "bf16x3"):
    import warnings

    warnings.warn(f"AMW_FFT_DOT_PREC={_MODE!r} is not a valid mode "
                  "(valid: auto | highest | bf16x3); falling back to 'auto'")
    _MODE = "auto"
_HI = jax.lax.Precision.HIGHEST

_DIMS = (((1,), (0,)), ((), ()))  # matrix @ block: contract lhs 1, rhs 0


def _resolve_mode() -> str:
    """Late-bound mode: 'auto' picks bf16x3 iff the default backend is a
    TPU (interpret-mode tests and any CPU fallback stay at HIGHEST, whose
    tolerances they assert).  Resolved at first dot trace, cached; never
    at import — backend init is expensive through the relay and must stay
    owned by the caller."""
    global _MODE
    if _MODE == "auto":
        try:
            _MODE = ("bf16x3" if jax.default_backend() in ("tpu", "axon")
                     else "highest")
        except Exception:  # backend not ready: don't cache a failure
            return "highest"
    return _MODE


def _split(a):
    """f32 → (hi, lo) bf16 planes with hi + lo ≈ a to ~2^-16 relative."""
    bf = jnp.bfloat16
    ah = a.astype(bf)
    return ah, (a - ah.astype(jnp.float32)).astype(bf)


def _dot3(ah, al, bh, bl):
    """3-pass bf16 product of pre-split operands (lax HIGH semantics: the
    dropped a_lo·b_lo term is ~2^-16 relative — far below the bf16
    rounding of the three kept passes)."""
    d = lambda u, v: jax.lax.dot_general(
        u, v, _DIMS, preferred_element_type=jnp.float32)
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _dot(a, b):
    """f32 [m, k] @ [k, n] on the MXU at the module's precision mode."""
    if _resolve_mode() != "bf16x3":
        return jax.lax.dot_general(a, b, _DIMS, precision=_HI,
                                   preferred_element_type=jnp.float32)
    return _dot3(*_split(a), *_split(b))


# Complex-dot shape: "kara" (default) evaluates the complex product with 3
# real contractions (Karatsuba: M1=ar·br, M2=ai·bi, M3=(ar+ai)·(br+bi),
# re=M1-M2, im=M3-M1-M2) — 9 bf16 MXU passes instead of 12 and 6 operand
# splits instead of 8.  The recombination roughly doubles the error
# constant on the imaginary plane (measured round-trip parity stays well
# inside the -90 dBFS budget — see scripts/bench_fft_stages.py).
# AMW_FFT_CPLX=split4 restores the 4-contraction form (shared splits, so
# it is bitwise-identical to the round-3 kernels at lower VPU cost).
_CPLX = os.environ.get("AMW_FFT_CPLX", "kara")


def _cdot(ar, ai, br, bi):
    """Complex contraction (a @ b) with a's minor axis against b's major:
    returns (re, im).  Shared bf16 splits across the real contractions."""
    if _resolve_mode() != "bf16x3":
        d = lambda u, v: jax.lax.dot_general(
            u, v, _DIMS, precision=_HI, preferred_element_type=jnp.float32)
        if _CPLX == "kara":
            m1 = d(ar, br)
            m2 = d(ai, bi)
            m3 = d(ar + ai, br + bi)
            return m1 - m2, m3 - m1 - m2
        return d(ar, br) - d(ai, bi), d(ar, bi) + d(ai, br)
    arh, arl = _split(ar)
    aih, ail = _split(ai)
    brh, brl = _split(br)
    bih, bil = _split(bi)
    if _CPLX == "kara":
        m1 = _dot3(arh, arl, brh, brl)
        m2 = _dot3(aih, ail, bih, bil)
        ash, asl = _split(ar + ai)
        bsh, bsl = _split(br + bi)
        m3 = _dot3(ash, asl, bsh, bsl)
        return m1 - m2, m3 - m1 - m2
    return (_dot3(arh, arl, brh, brl) - _dot3(aih, ail, bih, bil),
            _dot3(arh, arl, bih, bil) + _dot3(aih, ail, brh, brl))


def plan_ok(nfft: int) -> bool:
    if nfft % (A * B):
        return False
    c = nfft // (A * B)
    return 32 <= c <= 1024 and (c & (c - 1)) == 0


# ---------------------------------------------------------------------------
# host-side tables


@functools.lru_cache(maxsize=None)
def _tables(nfft: int, inverse: bool):
    C = nfft // (A * B)
    sign = 2.0 if inverse else -2.0
    wa = np.exp(sign * 1j * np.pi * np.outer(np.arange(A), np.arange(A)) / A)
    wb = np.exp(sign * 1j * np.pi * np.outer(np.arange(B), np.arange(B)) / B)
    wc = np.exp(sign * 1j * np.pi * np.outer(np.arange(C), np.arange(C)) / C)
    # Stage-1 twiddle exp(sign·2πi·a'·col/N) stored [A, B·C] — elementwise
    # aligned with the data's [A, B·C] view, so any lane-tile width slices
    # both identically (AMW_FFT_A_COLS).  (A (128,1)-blocked [A,B] factor
    # table is not a legal Mosaic block, and computing the angle in-kernel
    # in f32 costs ~6e-5 relative twiddle error — above the -90 dBFS
    # budget — so the f64-accurate table wins.)
    a_idx = np.arange(A)[:, None]
    col = np.arange(B * C)[None, :]
    t1 = np.exp(sign * 1j * np.pi * a_idx * col / nfft)
    t2 = np.exp(sign * 1j * np.pi * np.outer(np.arange(B), np.arange(C)) / (B * C))
    f32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return tuple(map(f32, (wa, wb, wc, t1, t2)))


@functools.lru_cache(maxsize=None)
def plan_params(nfft: int) -> list:
    """Host-side table bundle to thread through op params: the stage-1
    twiddle (64 MB at 2^23), T2 and W_C for both directions.  These MUST be
    runtime parameters — inlining them as HLO literals overflows the
    relay's remote-compile request (HTTP 413).  (The DFT matrices and
    stage-C tables are ≤ 64 KB and stay inline.)
    Order: [t1r, t1i, t2r, t2i] forward then inverse."""
    out = []
    for inverse in (False, True):
        _, _, _, t1, t2 = _tables(nfft, inverse)
        out += [t1[0], t1[1], t2[0], t2[1]]
    # device-resident and cached: every op at this nfft shares one copy,
    # and device_put of an already-device array is a no-op downstream.
    return [jax.device_put(a) for a in out]


def _tabs(tables, inverse):
    off = 4 if inverse else 0
    return tables[off:off + 4]


C1 = 128  # lane-sized sub-factor of the C axis (C = C2·C1 when C ≥ 128)


def _c1(nfft: int) -> int:
    """Per-plan C sub-factor: 128-lane chunks when C ≥ 128; a direct
    C-point DFT (C2 = 1, trivial butterfly) for the small plans C ∈
    {32, 64} (nfft 2^19/2^20 — the 10-40 s track-bucket transforms)."""
    return min(nfft // (A * B), C1)


@functools.lru_cache(maxsize=None)
def _ctab(nfft: int, inverse: bool):
    """Stage-C composite tables: W_{c1} (the c1-point DFT matmul), the
    chunk twiddle ct[k2', c1] = W_C^{c1·k2'}, and the radix-C2 butterfly
    matrix wm[c2, k2'] = W_{C2}^{c2·k2'} (scalar consts, unrolled on the
    VPU).  All ≤ 64 KB — inlined as kernel constants."""
    C = nfft // (A * B)
    c1 = _c1(nfft)
    C2 = C // c1
    sign = 2.0 if inverse else -2.0
    w128 = np.exp(sign * 1j * np.pi * np.outer(np.arange(c1), np.arange(c1)) / c1)
    ct = np.exp(sign * 1j * np.pi * np.outer(np.arange(C2), np.arange(c1)) / C)
    wm = np.exp(sign * 1j * np.pi * np.outer(np.arange(C2), np.arange(C2)) / C2)
    f32 = lambda m: (m.real.astype(np.float32), m.imag.astype(np.float32))
    return f32(w128), f32(ct), wm  # wm stays complex128 (python scalars)


@functools.lru_cache(maxsize=None)
def _perm(nfft: int) -> np.ndarray:
    """k at stored position (a', b', p): k = a' + A·b' + A·B·k_c(p), where
    the composite C stage leaves its own digits permuted too:
    k_c(p) = p//c1 + C2·(p % c1) (chunk k2' written at lanes k2'·c1)."""
    C = nfft // (A * B)
    c1 = _c1(nfft)
    C2 = C // c1
    a = np.arange(A)[:, None, None]
    b = np.arange(B)[None, :, None]
    p = np.arange(C)[None, None, :]
    kc = p // c1 + C2 * (p % c1)
    return (a + A * b + A * B * kc).ravel()


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
    return _cdot(Fr, Fi, xr, xi)


def _dot_r(xr, xi, Fr, Fi):
    """(x @ F): contract x's lane axis."""
    return _cdot(xr, xi, Fr, Fi)


def _stage_a_kernel(xr_ref, xi_ref, fr_ref, fi_ref, t1r_ref, t1i_ref,
                    or_ref, oi_ref, *, pre, scale):
    xr = xr_ref[0]
    xi = xi_ref[0]
    twr = t1r_ref[...]
    twi = t1i_ref[...]
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


def _stage_a_real_in_kernel(xr_ref, fr_ref, fi_ref, t1r_ref, t1i_ref,
                            or_ref, oi_ref):
    """Forward stage A for a REAL signal (imag=0): two MXU dots, not four."""
    xr = xr_ref[0]
    yr = _dot(fr_ref[...], xr)
    yi = _dot(fi_ref[...], xr)
    yr, yi = _cmul(yr, yi, t1r_ref[...], t1i_ref[...])
    or_ref[0] = yr
    oi_ref[0] = yi


def _stage_a_real_out_kernel(xr_ref, xi_ref, fr_ref, fi_ref, t1r_ref,
                             t1i_ref, or_ref, *, scale):
    """Final inverse stage A keeping only the REAL output: two dots."""
    xr, xi = _cmul(xr_ref[0], xi_ref[0], t1r_ref[...], t1i_ref[...])
    or_ref[0] = (_dot(fr_ref[...], xr) - _dot(fi_ref[...], xi)) * scale


def _stage_a_inv_join_kernel(xr_ref, xi_ref, fr_ref, fi_ref, t1r_ref,
                             t1i_ref, o_ref, *, scale):
    """Inverse stage A for packed rows, writing BOTH planes into one output
    array laid out [K, 2, R2, ...] — the caller reshapes to [K, 2·R2, n]
    (real rows then imag rows per response), replacing the
    ``jnp.concatenate([Yr, Yi])`` that cost a full extra HBM round trip of
    the K output planes (2 GB at K=4, [16, 2^23])."""
    xr, xi = _cmul(xr_ref[0, 0], xi_ref[0, 0], t1r_ref[...], t1i_ref[...])
    yr, yi = _dot_l(fr_ref[...], fi_ref[...], xr, xi)
    o_ref[0, 0, 0] = yr * scale
    o_ref[0, 1, 0] = yi * scale


def _cstage_fwd(xr, xi, wr, wi, ctr, cti, nfft):
    """Composite forward C transform of a [S, C] tile: radix-C2 butterfly
    across the C2 lane chunks (VPU, scalar twiddles), chunk twiddle, then
    one c1-point matmul per chunk.  Output chunk k2' at lanes k2'·c1.
    ``wr/wi``: W_{c1} planes; ``ctr/cti``: [C2, c1] chunk twiddle planes
    (kernel inputs — Pallas rejects captured array constants)."""
    _, _, wm = _ctab(nfft, False)
    C2 = wm.shape[0]
    c1 = wr.shape[0]
    chunks_r = [xr[:, c2 * c1:(c2 + 1) * c1] for c2 in range(C2)]
    chunks_i = [xi[:, c2 * c1:(c2 + 1) * c1] for c2 in range(C2)]
    out_r, out_i = [], []
    for k2 in range(C2):
        yr = yi = None
        for c2 in range(C2):
            w = wm[c2, k2]
            tr = chunks_r[c2] * np.float32(w.real) - chunks_i[c2] * np.float32(w.imag)
            ti = chunks_r[c2] * np.float32(w.imag) + chunks_i[c2] * np.float32(w.real)
            yr = tr if yr is None else yr + tr
            yi = ti if yi is None else yi + ti
        yr, yi = _cmul(yr, yi, ctr[k2:k2 + 1], cti[k2:k2 + 1])
        zr, zi = _dot_r(yr, yi, wr, wi)
        out_r.append(zr)
        out_i.append(zi)
    return jnp.concatenate(out_r, axis=-1), jnp.concatenate(out_i, axis=-1)


def _cstage_inv(xr, xi, wr, wi, ctr, cti, nfft):
    """Adjoint of :func:`_cstage_fwd`: per stored chunk k2' — conj matmul,
    conj chunk twiddle — then conj radix-C2 recombination to input order."""
    _, _, wm = _ctab(nfft, True)
    C2 = wm.shape[0]
    c1 = wr.shape[0]
    ws_r, ws_i = [], []
    for k2 in range(C2):
        vr, vi = _dot_r(xr[:, k2 * c1:(k2 + 1) * c1],
                        xi[:, k2 * c1:(k2 + 1) * c1], wr, wi)
        vr, vi = _cmul(vr, vi, ctr[k2:k2 + 1], cti[k2:k2 + 1])
        ws_r.append(vr)
        ws_i.append(vi)
    out_r, out_i = [], []
    for c2 in range(C2):
        yr = yi = None
        for k2 in range(C2):
            w = wm[c2, k2]
            tr = ws_r[k2] * np.float32(w.real) - ws_i[k2] * np.float32(w.imag)
            ti = ws_r[k2] * np.float32(w.imag) + ws_i[k2] * np.float32(w.real)
            yr = tr if yr is None else yr + tr
            yi = ti if yi is None else yi + ti
        out_r.append(yr)
        out_i.append(yi)
    return jnp.concatenate(out_r, axis=-1), jnp.concatenate(out_i, axis=-1)


def _stage_bc_kernel(xr_ref, xi_ref, fbr_ref, fbi_ref, t2r_ref, t2i_ref,
                     wr_ref, wi_ref, ctr_ref, cti_ref, or_ref, oi_ref,
                     *, nfft):
    """Fused forward stages B and C — the [B, C] tile for a fixed a holds
    everything both contractions need, so they share one HBM pass."""
    yr, yi = _dot_l(fbr_ref[...], fbi_ref[...], xr_ref[0, 0], xi_ref[0, 0])
    yr, yi = _cmul(yr, yi, t2r_ref[...], t2i_ref[...])
    yr, yi = _cstage_fwd(yr, yi, wr_ref[...], wi_ref[...],
                         ctr_ref[...], cti_ref[...], nfft)
    or_ref[0, 0] = yr
    oi_ref[0, 0] = yi


def _stage_cb_kernel(xr_ref, xi_ref, fbr_ref, fbi_ref, t2r_ref, t2i_ref,
                     wr_ref, wi_ref, ctr_ref, cti_ref, rr_ref, ri_ref,
                     or_ref, oi_ref, *, nfft, with_resp):
    """Fused inverse stages C and B: (response multiply →) inv C →
    conj T2 → inv B, one HBM pass."""
    xr = xr_ref[0, 0]
    xi = xi_ref[0, 0]
    if with_resp:
        xr, xi = _cmul(xr, xi, rr_ref[0], ri_ref[0])
    yr, yi = _cstage_inv(xr, xi, wr_ref[...], wi_ref[...],
                         ctr_ref[...], cti_ref[...], nfft)
    yr, yi = _cmul(yr, yi, t2r_ref[...], t2i_ref[...])
    yr, yi = _dot_l(fbr_ref[...], fbi_ref[...], yr, yi)
    or_ref[0, 0] = yr
    oi_ref[0, 0] = yi


def _stage_bc_cb_kernel(xr_ref, xi_ref, fbr_ref, fbi_ref, t2r_ref, t2i_ref,
                        wr_ref, wi_ref, ctr_ref, cti_ref,
                        ibr_ref, ibi_ref, it2r_ref, it2i_ref,
                        iwr_ref, iwi_ref, ictr_ref, icti_ref,
                        rr_ref, ri_ref, or_ref, oi_ref, *, nfft):
    """Fused forward B+C, response multiply, and inverse C+B — the whole
    spectrum-domain round trip on one (B, C) tile (fixed a').  The full
    spectrum is never materialized in HBM: vs separate _stage_bc +
    _stage_cb calls this saves four nfft-sized plane passes (two writes,
    two reads) and one kernel launch per response application."""
    yr, yi = _dot_l(fbr_ref[...], fbi_ref[...], xr_ref[0, 0], xi_ref[0, 0])
    yr, yi = _cmul(yr, yi, t2r_ref[...], t2i_ref[...])
    yr, yi = _cstage_fwd(yr, yi, wr_ref[...], wi_ref[...],
                         ctr_ref[...], cti_ref[...], nfft)
    yr, yi = _cmul(yr, yi, rr_ref[0], ri_ref[0])
    yr, yi = _cstage_inv(yr, yi, iwr_ref[...], iwi_ref[...],
                         ictr_ref[...], icti_ref[...], nfft)
    yr, yi = _cmul(yr, yi, it2r_ref[...], it2i_ref[...])
    yr, yi = _dot_l(ibr_ref[...], ibi_ref[...], yr, yi)
    or_ref[0, 0] = yr
    oi_ref[0, 0] = yi


def _stage_bccb_multi_kernel(xr_ref, xi_ref, fbr_ref, fbi_ref, t2r_ref,
                             t2i_ref, wr_ref, wi_ref, ctr_ref, cti_ref,
                             ibr_ref, ibi_ref, it2r_ref, it2i_ref,
                             iwr_ref, iwi_ref, ictr_ref, icti_ref,
                             rr_ref, ri_ref, or_ref, oi_ref, *, nfft, K):
    """Fused forward B+C and K-response inverse C+B on one (B, C) tile:
    the spectrum is computed, multiplied by each response, and inverted
    without ever being written to HBM."""
    yr, yi = _dot_l(fbr_ref[...], fbi_ref[...], xr_ref[0, 0], xi_ref[0, 0])
    yr, yi = _cmul(yr, yi, t2r_ref[...], t2i_ref[...])
    yr, yi = _cstage_fwd(yr, yi, wr_ref[...], wi_ref[...],
                         ctr_ref[...], cti_ref[...], nfft)
    for k in range(K):
        zr, zi = _cmul(yr, yi, rr_ref[k, 0], ri_ref[k, 0])
        zr, zi = _cstage_inv(zr, zi, iwr_ref[...], iwi_ref[...],
                             ictr_ref[...], icti_ref[...], nfft)
        zr, zi = _cmul(zr, zi, it2r_ref[...], it2i_ref[...])
        zr, zi = _dot_l(ibr_ref[...], ibi_ref[...], zr, zi)
        or_ref[k, 0, 0] = zr
        oi_ref[k, 0, 0] = zi


def _stage_cb_multi_kernel(xr_ref, xi_ref, fbr_ref, fbi_ref, t2r_ref,
                           t2i_ref, wr_ref, wi_ref, ctr_ref, cti_ref,
                           rr_ref, ri_ref, or_ref, oi_ref, *, nfft, K):
    """Fused inverse C+B over K responses sharing one forward spectrum.
    All K responses are processed per X-block load (unrolled in-kernel),
    so the spectrum streams from HBM once instead of K times."""
    xr = xr_ref[0, 0]
    xi = xi_ref[0, 0]
    for k in range(K):
        zr, zi = _cmul(xr, xi, rr_ref[k, 0], ri_ref[k, 0])
        yr, yi = _cstage_inv(zr, zi, wr_ref[...], wi_ref[...],
                             ctr_ref[...], cti_ref[...], nfft)
        yr, yi = _cmul(yr, yi, t2r_ref[...], t2i_ref[...])
        yr, yi = _dot_l(fbr_ref[...], fbi_ref[...], yr, yi)
        or_ref[k, 0, 0] = yr
        oi_ref[k, 0, 0] = yi


# ---------------------------------------------------------------------------
# stage drivers


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *idx: (0,) * nd)


def _a_cols(C: int) -> int:
    """Lane-tile width (in units of C) for the stage-A grid.  Wider tiles
    cut the grid-step count at the cost of VMEM.  Measured on v5e at
    [8 packed rows, 2^23]: m=2 helps the FLAT layout (stage A 4.75 ->
    4.17 ms) but HURTS the production vmapped roundtrip (48.8 -> 59.2 ms
    at R2=1 per element), and m=4 fails remote compile — so the default
    stays 1; flat-batch callers may set ``AMW_FFT_A_COLS=2``.

    For the small plans (C < 128) a floor of 128//C is forced: Mosaic
    requires ≥128 lanes per block, so C=64/32 tiles must span 2/4 of the
    C-axis groups."""
    try:
        m = int(os.environ.get("AMW_FFT_A_COLS", "1"))
    except (TypeError, ValueError):
        m = 1
    # Round down to a power of two so the halving loop lands on an exact
    # divisor of B (grid = B // m must cover every column group).
    m = 1 << max(int(m).bit_length() - 1, 0) if m > 1 else 1
    while m > 1 and (B % m or (C * m) * A * 4 > (4 << 20)):
        m //= 2
    return max(m, 1, C1 // C)


def _stage_a(xr, xi, nfft, inverse, tables, interpret=False,
             real_in=False, real_out=False):
    """Contract the A axis.  x: [R, nfft] viewed as [R, A, B*C].
    ``real_in``: forward with implicit zero imag (x real).  ``real_out``:
    inverse returning only the real plane (imag discarded)."""
    C = nfft // (A * B)
    wa, _, _, _, _ = _tables(nfft, inverse)
    t1r, t1i, _, _ = _tabs(tables, inverse)
    R = xr.shape[0]
    xr3 = xr.reshape(R, A, B * C)
    scale = (1.0 / nfft) if inverse else 1.0
    m = _a_cols(C)
    spec_x = pl.BlockSpec((1, A, C * m), lambda j, r: (r, 0, j))
    spec_t1 = pl.BlockSpec((A, C * m), lambda j, r: (0, j))
    f_specs = [_const_spec((A, A)), _const_spec((A, A))]
    wa_in = (jnp.asarray(wa[0]), jnp.asarray(wa[1]))
    grid = (B // m, R)
    if real_in and not inverse:
        out = pl.pallas_call(
            _stage_a_real_in_kernel,
            grid=grid,
            in_specs=[spec_x] + f_specs + [spec_t1, spec_t1],
            out_specs=[spec_x, spec_x],
            out_shape=[jax.ShapeDtypeStruct(xr3.shape, jnp.float32)] * 2,
            interpret=interpret,
        )(xr3, *wa_in, t1r, t1i)
        return out[0].reshape(R, nfft), out[1].reshape(R, nfft)
    xi3 = xi.reshape(R, A, B * C)
    if real_out and inverse:
        out = pl.pallas_call(
            functools.partial(_stage_a_real_out_kernel, scale=scale),
            grid=grid,
            in_specs=[spec_x, spec_x] + f_specs + [spec_t1, spec_t1],
            out_specs=[spec_x],
            out_shape=[jax.ShapeDtypeStruct(xr3.shape, jnp.float32)],
            interpret=interpret,
        )(xr3, xi3, *wa_in, t1r, t1i)
        return out[0].reshape(R, nfft), None
    kern = functools.partial(_stage_a_kernel, pre=inverse, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_x, spec_x] + f_specs + [spec_t1, spec_t1],
        out_specs=[spec_x, spec_x],
        out_shape=[jax.ShapeDtypeStruct(xr3.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(xr3, xi3, *wa_in, t1r, t1i)
    return out[0].reshape(R, nfft), out[1].reshape(R, nfft)


def _stage_a_inv_join(Yr, Yi, K: int, nfft: int, tables, interpret=False):
    """Packed inverse stage A over K response planes of R2 packed rows:
    [K·R2, nfft] (re, im) → ONE [K, 2·R2, nfft] array ordered (real rows,
    imag rows) per response — no post-kernel concatenate."""
    C = nfft // (A * B)
    R2 = Yr.shape[0] // K
    wa, _, _, _, _ = _tables(nfft, True)
    t1r, t1i, _, _ = _tabs(tables, True)
    yr4 = Yr.reshape(K, R2, A, B * C)
    yi4 = Yi.reshape(K, R2, A, B * C)
    m = _a_cols(C)
    spec_x = pl.BlockSpec((1, 1, A, C * m), lambda j, k, r: (k, r, 0, j))
    spec_t1 = pl.BlockSpec((A, C * m), lambda j, k, r: (0, j))
    spec_o = pl.BlockSpec((1, 2, 1, A, C * m),
                          lambda j, k, r: (k, 0, r, 0, j))
    out = pl.pallas_call(
        functools.partial(_stage_a_inv_join_kernel, scale=1.0 / nfft),
        grid=(B // m, K, R2),
        in_specs=[spec_x, spec_x,
                  _const_spec((A, A)), _const_spec((A, A)),
                  spec_t1, spec_t1],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((K, 2, R2, A, B * C), jnp.float32),
        interpret=interpret,
    )(yr4, yi4, jnp.asarray(wa[0]), jnp.asarray(wa[1]), t1r, t1i)
    return out.reshape(K, 2 * R2, nfft)


def _bc_tables(nfft, inverse, tables):
    """Inputs + specs shared by the fused B/C drivers: W_B (inline-sized
    const), T2 (runtime table), W_c1 and chunk twiddle (inline-sized)."""
    C = nfft // (A * B)
    c1 = _c1(nfft)
    C2 = C // c1
    _, wb, _, _, _ = _tables(nfft, inverse)
    _, _, t2r, t2i = _tabs(tables, inverse)
    (wcr, wci), (ctr, cti), _ = _ctab(nfft, inverse)
    ins = [jnp.asarray(wb[0]), jnp.asarray(wb[1]), t2r, t2i,
           jnp.asarray(wcr), jnp.asarray(wci),
           jnp.asarray(ctr), jnp.asarray(cti)]
    shapes = [(B, B), (B, B), (B, C), (B, C),
              (c1, c1), (c1, c1), (C2, c1), (C2, c1)]
    return ins, shapes


def _stage_bc(xr, xi, nfft, tables, interpret=False):
    """Fused forward stages B and C (one HBM pass).  x viewed [R,A,B,C]."""
    C = nfft // (A * B)
    R = xr.shape[0]
    xr4 = xr.reshape(R, A, B, C)
    xi4 = xi.reshape(R, A, B, C)
    spec_x = pl.BlockSpec((1, 1, B, C), lambda i, r: (r, i, 0, 0))
    ins, shapes = _bc_tables(nfft, False, tables)
    w_specs = [_const_spec(sh) for sh in shapes]
    out = pl.pallas_call(
        functools.partial(_stage_bc_kernel, nfft=nfft),
        grid=(A, R),
        in_specs=[spec_x, spec_x] + w_specs,
        out_specs=[spec_x, spec_x],
        out_shape=[jax.ShapeDtypeStruct(xr4.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(xr4, xi4, *ins)
    return out[0].reshape(R, nfft), out[1].reshape(R, nfft)


def _stage_cb(Xr, Xi, nfft, tables, resp=None, interpret=False):
    """Fused inverse stages C and B with optional response multiply."""
    C = nfft // (A * B)
    R = Xr.shape[0]
    xr4 = Xr.reshape(R, A, B, C)
    xi4 = Xi.reshape(R, A, B, C)
    spec_x = pl.BlockSpec((1, 1, B, C), lambda i, r: (r, i, 0, 0))
    ins, shapes = _bc_tables(nfft, True, tables)
    w_specs = [_const_spec(sh) for sh in shapes]
    if resp is None:
        # dummy single-bin response refs are still required by the kernel
        rr = jnp.ones((A, B, C), jnp.float32)
        ri = jnp.zeros((A, B, C), jnp.float32)
        with_resp = False
    else:
        rr = resp[0].reshape(A, B, C)
        ri = resp[1].reshape(A, B, C)
        with_resp = True
    spec_r = pl.BlockSpec((1, B, C), lambda i, r: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_stage_cb_kernel, nfft=nfft, with_resp=with_resp),
        grid=(A, R),
        in_specs=[spec_x, spec_x] + w_specs + [spec_r, spec_r],
        out_specs=[spec_x, spec_x],
        out_shape=[jax.ShapeDtypeStruct(xr4.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(xr4, xi4, *ins, rr, ri)
    return out[0].reshape(R, nfft), out[1].reshape(R, nfft)


def _stage_bc_cb(xr, xi, nfft, tables, resp, interpret=False):
    """Driver for the fused forward-BC → response → inverse-CB round trip.
    Input: stage-A forward output [R, nfft]; output: ready for the final
    inverse stage A."""
    C = nfft // (A * B)
    R = xr.shape[0]
    xr4 = xr.reshape(R, A, B, C)
    xi4 = xi.reshape(R, A, B, C)
    spec_x = pl.BlockSpec((1, 1, B, C), lambda i, r: (r, i, 0, 0))
    ins_f, shapes_f = _bc_tables(nfft, False, tables)
    ins_i, shapes_i = _bc_tables(nfft, True, tables)
    w_specs = [_const_spec(sh) for sh in shapes_f + shapes_i]
    rr = resp[0].reshape(A, B, C)
    ri = resp[1].reshape(A, B, C)
    spec_r = pl.BlockSpec((1, B, C), lambda i, r: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_stage_bc_cb_kernel, nfft=nfft),
        grid=(A, R),
        in_specs=[spec_x, spec_x] + w_specs + [spec_r, spec_r],
        out_specs=[spec_x, spec_x],
        out_shape=[jax.ShapeDtypeStruct(xr4.shape, jnp.float32)] * 2,
        interpret=interpret,
    )(xr4, xi4, *ins_f, *ins_i, rr, ri)
    return out[0].reshape(R, nfft), out[1].reshape(R, nfft)


def _stage_bccb_multi(xr, xi, resps, nfft, tables, interpret=False):
    """Driver for the fused forward-BC → K responses → inverse-CB pass.
    Input: stage-A forward output [R, nfft]; output [K*R, nfft] planes
    ready for the final inverse stage A."""
    C = nfft // (A * B)
    R = xr.shape[0]
    K = resps.shape[0]
    xr4 = xr.reshape(R, A, B, C)
    xi4 = xi.reshape(R, A, B, C)
    rr = resps[:, 0].reshape(K, A, B, C)
    ri = resps[:, 1].reshape(K, A, B, C)
    spec_x = pl.BlockSpec((1, 1, B, C), lambda i, r: (r, i, 0, 0))
    spec_r = pl.BlockSpec((K, 1, B, C), lambda i, r: (0, i, 0, 0))
    spec_o = pl.BlockSpec((K, 1, 1, B, C), lambda i, r: (0, r, i, 0, 0))
    ins_f, shapes_f = _bc_tables(nfft, False, tables)
    ins_i, shapes_i = _bc_tables(nfft, True, tables)
    w_specs = [_const_spec(sh) for sh in shapes_f + shapes_i]
    out = pl.pallas_call(
        functools.partial(_stage_bccb_multi_kernel, nfft=nfft, K=K),
        grid=(A, R),
        in_specs=[spec_x, spec_x] + w_specs + [spec_r, spec_r],
        out_specs=[spec_o, spec_o],
        out_shape=[jax.ShapeDtypeStruct((K, R, A, B, C), jnp.float32)] * 2,
        interpret=interpret,
    )(xr4, xi4, *ins_f, *ins_i, rr, ri)
    return out[0].reshape(K * R, nfft), out[1].reshape(K * R, nfft)


def _fused_rt() -> bool:
    import os

    return os.environ.get("AMW_FFT_FUSED_RT", "1") == "1"


def _stage_cb_multi(Xr, Xi, resps, nfft, tables, interpret=False):
    """[R, nfft] spectrum × [K, 2, nfft] responses → fused inverse C+B."""
    C = nfft // (A * B)
    R = Xr.shape[0]
    K = resps.shape[0]
    xr4 = Xr.reshape(R, A, B, C)
    xi4 = Xi.reshape(R, A, B, C)
    rr = resps[:, 0].reshape(K, A, B, C)
    ri = resps[:, 1].reshape(K, A, B, C)
    spec_x = pl.BlockSpec((1, 1, B, C), lambda i, r: (r, i, 0, 0))
    spec_r = pl.BlockSpec((K, 1, B, C), lambda i, r: (0, i, 0, 0))
    spec_o = pl.BlockSpec((K, 1, 1, B, C), lambda i, r: (0, r, i, 0, 0))
    ins, shapes = _bc_tables(nfft, True, tables)
    w_specs = [pl.BlockSpec(sh, (lambda nd: lambda i, r: (0,) * nd)(len(sh)))
               for sh in shapes]
    out = pl.pallas_call(
        functools.partial(_stage_cb_multi_kernel, nfft=nfft, K=K),
        grid=(A, R),
        in_specs=[spec_x, spec_x] + w_specs + [spec_r, spec_r],
        out_specs=[spec_o, spec_o],
        out_shape=[jax.ShapeDtypeStruct((K, R, A, B, C), jnp.float32)] * 2,
        interpret=interpret,
    )(xr4, xi4, *ins, rr, ri)
    return out[0].reshape(K * R, nfft), out[1].reshape(K * R, nfft)


# ---------------------------------------------------------------------------
# public API


def fft_permuted(xr, xi, nfft: int, tables=None, interpret: bool = False):
    """Forward FFT of [R, nfft] (re, im) → permuted spectrum (re, im)."""
    if tables is None:
        tables = plan_params(nfft)
    xr, xi = _stage_a(xr, xi, nfft, False, tables, interpret)
    return _stage_bc(xr, xi, nfft, tables, interpret)


def ifft_permuted(Xr, Xi, nfft: int, tables=None, interpret: bool = False):
    """Inverse of :func:`fft_permuted` (adjoint stages, reversed)."""
    if tables is None:
        tables = plan_params(nfft)
    Xr, Xi = _stage_cb(Xr, Xi, nfft, tables, interpret=interpret)
    return _stage_a(Xr, Xi, nfft, True, tables, interpret)


def apply_response(x, resp_perm, nfft: int, tables=None,
                   n_out: int | None = None, interpret: bool = False,
                   real_impulse: bool = True):
    """``irfft(rfft(x, nfft) * H)[..., :n_out]`` for real ``x`` via the
    permuted-spectrum pipeline.  ``resp_perm``: [2, nfft] planes from
    :func:`permute_full_response`.  Leading dims of ``x`` flatten to rows.
    The response multiply is fused into the first inverse stage.

    ``real_impulse`` declares that ``H`` is conjugate-symmetric (its
    impulse response is real) — true for every filter/EQ/meter response in
    this framework.  It gates the row-pair packing fast path, whose
    algebra (two real rows as one complex row, split after the inverse)
    only separates cleanly when ``ifft(Xk*H)`` is real; a non-symmetric
    response (Hilbert transformer, phase rotator, fractional delay) would
    silently cross-contaminate the packed rows.  Pass ``False`` for such
    responses to take the unpacked path."""
    if tables is None:
        tables = plan_params(nfft)
    lead = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    xr = x.reshape(R, n)
    if n < nfft:
        xr = jnp.pad(xr, ((0, 0), (0, nfft - n)))
    elif n > nfft:
        xr = xr[:, :nfft]
    m = nfft if n_out is None else n_out
    if real_impulse and _pack_ok(R):
        # Row-pair packing (see roundtrip_multi): responses have real
        # impulses by construction, so two real rows ride one complex row
        # and the B/C work halves.
        R2 = R // 2
        Xr, Xi = _stage_a(xr[:R2], xr[R2:], nfft, False, tables, interpret)
        if _fused_rt():
            Yr, Yi = _stage_bc_cb(Xr, Xi, nfft, tables, resp_perm,
                                  interpret=interpret)
        else:
            Xr, Xi = _stage_bc(Xr, Xi, nfft, tables, interpret)
            Yr, Yi = _stage_cb(Xr, Xi, nfft, tables, resp=resp_perm,
                               interpret=interpret)
        out = _stage_a_inv_join(Yr, Yi, 1, nfft, tables, interpret)[0]
        return out[:, :m].reshape(lead + (m,))
    Xr, Xi = _stage_a(xr, None, nfft, False, tables, interpret,
                      real_in=True)
    if _fused_rt():
        # Fused forward-BC -> response -> inverse-CB: the full spectrum
        # never touches HBM (4 plane passes + 1 launch saved per
        # application).  AMW_FFT_FUSED_RT=0 restores the split stages
        # (fallback if Mosaic rejects the larger fused kernel at some C).
        Yr, Yi = _stage_bc_cb(Xr, Xi, nfft, tables, resp_perm,
                              interpret=interpret)
    else:
        Xr, Xi = _stage_bc(Xr, Xi, nfft, tables, interpret)
        Yr, Yi = _stage_cb(Xr, Xi, nfft, tables, resp=resp_perm,
                           interpret=interpret)
    Yr, _ = _stage_a(Yr, Yi, nfft, True, tables, interpret, real_out=True)
    return Yr[:, :m].reshape(lead + (m,))


def fwd_real(x, nfft: int, tables=None, interpret: bool = False):
    """Real [..., n] → permuted spectrum (re, im) as [R, nfft] plus the
    original leading shape (for :func:`inv_multi`)."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    xr = x.reshape(R, n)
    if n < nfft:
        xr = jnp.pad(xr, ((0, 0), (0, nfft - n)))
    elif n > nfft:
        xr = xr[:, :nfft]
    if tables is None:
        tables = plan_params(nfft)
    Xr, Xi = _stage_a(xr, None, nfft, False, tables, interpret,
                      real_in=True)
    Xr, Xi = _stage_bc(Xr, Xi, nfft, tables, interpret)
    return Xr, Xi, lead


def _pack_ok(R: int) -> bool:
    import os

    return R >= 2 and R % 2 == 0 and os.environ.get(
        "AMW_FFT_PACK", "1") == "1"


def _prep_rows(x, nfft):
    lead = x.shape[:-1]
    n = x.shape[-1]
    R = int(np.prod(lead)) if lead else 1
    xr = x.reshape(R, n)
    if n < nfft:
        xr = jnp.pad(xr, ((0, 0), (0, nfft - n)))
    elif n > nfft:
        xr = xr[:, :nfft]
    return xr, lead, R


def roundtrip_multi(x, resps_perm, nfft: int, n_out: int,
                    tables=None, interpret: bool = False):
    """``[irfft(rfft(x) * H_k)[..., :n_out] for k]`` with the spectrum kept
    in VMEM across the forward/inverse boundary: real [..., n] ×
    [K, 2, nfft] responses → real [K, *lead, n_out].

    Row pairs are packed as one complex row (first half of the rows on the
    real plane, second half on the imag plane — contiguous slices, no
    strided copies): every response from :func:`permute_full_response` has
    a REAL impulse (conj-symmetric spectrum by construction), so
    ``conv(x1 + i·x2, h) = conv(x1, h) + i·conv(x2, h)`` and the B/C
    stages run on half the rows."""
    if tables is None:
        tables = plan_params(nfft)
    xr, lead, R = _prep_rows(x, nfft)
    K = resps_perm.shape[0]
    if _pack_ok(R):
        R2 = R // 2
        Xr, Xi = _stage_a(xr[:R2], xr[R2:], nfft, False, tables, interpret)
        if _fused_rt():
            Yr, Yi = _stage_bccb_multi(Xr, Xi, resps_perm, nfft, tables,
                                       interpret)
        else:
            Xr, Xi = _stage_bc(Xr, Xi, nfft, tables, interpret)
            Yr, Yi = _stage_cb_multi(Xr, Xi, resps_perm, nfft, tables,
                                     interpret)
        # single-array inverse stage A: [K, R, nfft] with real rows then
        # imag rows per response — no concatenate pass.
        out = _stage_a_inv_join(Yr, Yi, K, nfft, tables, interpret)
        return out[..., :n_out].reshape((K,) + tuple(lead) + (n_out,))
    Xr, Xi = _stage_a(xr, None, nfft, False, tables, interpret, real_in=True)
    if _fused_rt():
        Yr, Yi = _stage_bccb_multi(Xr, Xi, resps_perm, nfft, tables,
                                   interpret)
    else:
        Xr, Xi = _stage_bc(Xr, Xi, nfft, tables, interpret)
        Yr, Yi = _stage_cb_multi(Xr, Xi, resps_perm, nfft, tables, interpret)
    Yr, _ = _stage_a(Yr, Yi, nfft, True, tables, interpret, real_out=True)
    return Yr[:, :n_out].reshape((K,) + tuple(lead) + (n_out,))


def roundtrip_multi_reduce(x, resps_perm, nfft: int, n_out: int, band_fns,
                           tables=None, interpret: bool = False):
    """:func:`roundtrip_multi` composed with the per-band map + in-VMEM
    band sum of :func:`inv_multi_reduce` — one streaming pipeline from the
    real input to the summed band output, with neither the spectrum nor
    the K band signals materialized in HBM.  Row packing applies: the
    per-band maps are per-sample on the REAL planes, and the packed
    planes hold real signals (row 1 on re, row 2 on im), so the maps act
    plane-wise inside the reduce kernel."""
    if tables is None:
        tables = plan_params(nfft)
    xr, lead, R = _prep_rows(x, nfft)
    if _pack_ok(R):
        R2 = R // 2
        Xr, Xi = _stage_a(xr[:R2], xr[R2:], nfft, False, tables, interpret)
        if _fused_rt():
            Yr, Yi = _stage_bccb_multi(Xr, Xi, resps_perm, nfft, tables,
                                       interpret)
        else:
            Xr, Xi = _stage_bc(Xr, Xi, nfft, tables, interpret)
            Yr, Yi = _stage_cb_multi(Xr, Xi, resps_perm, nfft, tables,
                                     interpret)
        out = _reduce_stage_a_packed(
            Yr, Yi, resps_perm.shape[0], R2, nfft, band_fns, tables,
            interpret)
        return out[:, :n_out].reshape(tuple(lead) + (n_out,))
    Xr, Xi = _stage_a(xr, None, nfft, False, tables, interpret, real_in=True)
    if _fused_rt():
        Yr, Yi = _stage_bccb_multi(Xr, Xi, resps_perm, nfft, tables,
                                   interpret)
    else:
        Xr, Xi = _stage_bc(Xr, Xi, nfft, tables, interpret)
        Yr, Yi = _stage_cb_multi(Xr, Xi, resps_perm, nfft, tables, interpret)
    return _reduce_stage_a(Yr, Yi, resps_perm.shape[0], R, nfft, band_fns,
                           tables, interpret)[:, :n_out].reshape(
        tuple(lead) + (n_out,))


def inv_multi(Xr, Xi, resps_perm, nfft: int, lead, n_out: int,
              tables=None, interpret: bool = False):
    """Inverse transform of one spectrum under K responses (the Pallas
    analog of the batched-irfft trick): [R, nfft] × [K, 2, nfft] →
    real [K, *lead, n_out].  The spectrum blocks are re-streamed per
    response; nothing is materialized K-fold in HBM beforehand."""
    if tables is None:
        tables = plan_params(nfft)
    K = resps_perm.shape[0]
    Yr, Yi = _stage_cb_multi(Xr, Xi, resps_perm, nfft, tables, interpret)
    Yr, _ = _stage_a(Yr, Yi, nfft, True, tables, interpret, real_out=True)
    return Yr[:, :n_out].reshape((K,) + tuple(lead) + (n_out,))


def _stage_a_reduce_kernel(yr_ref, yi_ref, fr_ref, fi_ref, t1r_ref, t1i_ref,
                           o_ref, *, K, scale, band_fns):
    """Final inverse stage A over K spectra with a per-band memoryless
    map fused in and the bands summed in-VMEM.  Blocks hold strided time
    samples, which is fine for per-sample maps; the output array is the
    summed time signal in natural order."""
    twr = t1r_ref[...]
    twi = t1i_ref[...]
    acc = None
    for k in range(K):
        xr, xi = _cmul(yr_ref[k, 0], yi_ref[k, 0], twr, twi)
        y = (_dot(fr_ref[...], xr) - _dot(fi_ref[...], xi)) * scale
        y = band_fns[k](y)
        acc = y if acc is None else acc + y
    o_ref[0] = acc


def _stage_a_reduce_packed_kernel(yr_ref, yi_ref, fr_ref, fi_ref, t1r_ref,
                                  t1i_ref, o_ref, *, K, scale, band_fns):
    """Packed-rows variant of :func:`_stage_a_reduce_kernel`: full complex
    inverse stage A, per-band maps applied to EACH plane (both planes hold
    real packed signals), band sums kept per plane.  Both plane sums land
    in ONE output array [2, R2, ...] (no post-kernel concatenate)."""
    twr = t1r_ref[...]
    twi = t1i_ref[...]
    acc_r = acc_i = None
    for k in range(K):
        xr, xi = _cmul(yr_ref[k, 0], yi_ref[k, 0], twr, twi)
        zr, zi = _dot_l(fr_ref[...], fi_ref[...], xr, xi)
        zr = band_fns[k](zr * scale)
        zi = band_fns[k](zi * scale)
        acc_r = zr if acc_r is None else acc_r + zr
        acc_i = zi if acc_i is None else acc_i + zi
    o_ref[0, 0] = acc_r
    o_ref[1, 0] = acc_i


def _reduce_stage_a_packed(Yr, Yi, K, R2, nfft, band_fns, tables, interpret):
    """Packed-rows reduce: returns ONE [2·R2, nfft] array (real-plane rows
    then imag-plane rows)."""
    C = nfft // (A * B)
    wa, _, _, _, _ = _tables(nfft, True)
    t1r, t1i, _, _ = _tabs(tables, True)
    yr4 = Yr.reshape(K, R2, A, B * C)
    yi4 = Yi.reshape(K, R2, A, B * C)
    m = _a_cols(C)
    spec_y = pl.BlockSpec((K, 1, A, C * m), lambda j, r: (0, r, 0, j))
    spec_o = pl.BlockSpec((2, 1, A, C * m), lambda j, r: (0, r, 0, j))
    spec_t1 = pl.BlockSpec((A, C * m), lambda j, r: (0, j))
    out = pl.pallas_call(
        functools.partial(_stage_a_reduce_packed_kernel, K=K,
                          scale=1.0 / nfft, band_fns=tuple(band_fns)),
        grid=(B // m, R2),
        in_specs=[spec_y, spec_y,
                  _const_spec((A, A)), _const_spec((A, A)),
                  spec_t1, spec_t1],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((2, R2, A, B * C), jnp.float32),
        interpret=interpret,
    )(yr4, yi4, jnp.asarray(wa[0]), jnp.asarray(wa[1]), t1r, t1i)
    return out.reshape(2 * R2, nfft)


def _reduce_stage_a(Yr, Yi, K, R, nfft, band_fns, tables, interpret):
    """Final inverse stage A over K spectra with fused per-band map +
    in-VMEM band sum; returns the summed real [R, nfft] signal."""
    C = nfft // (A * B)
    wa, _, _, _, _ = _tables(nfft, True)
    t1r, t1i, _, _ = _tabs(tables, True)
    yr4 = Yr.reshape(K, R, A, B * C)
    yi4 = Yi.reshape(K, R, A, B * C)
    m = _a_cols(C)
    spec_y = pl.BlockSpec((K, 1, A, C * m), lambda j, r: (0, r, 0, j))
    spec_o = pl.BlockSpec((1, A, C * m), lambda j, r: (r, 0, j))
    spec_t1 = pl.BlockSpec((A, C * m), lambda j, r: (0, j))
    out = pl.pallas_call(
        functools.partial(_stage_a_reduce_kernel, K=K, scale=1.0 / nfft,
                          band_fns=tuple(band_fns)),
        grid=(B // m, R),
        in_specs=[spec_y, spec_y,
                  _const_spec((A, A)), _const_spec((A, A)),
                  spec_t1, spec_t1],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((R, A, B * C), jnp.float32),
        interpret=interpret,
    )(yr4, yi4, jnp.asarray(wa[0]), jnp.asarray(wa[1]), t1r, t1i)
    return out.reshape(R, nfft)


def inv_multi_reduce(Xr, Xi, resps_perm, nfft: int, lead, n_out: int,
                     band_fns, tables=None, interpret: bool = False):
    """Like :func:`inv_multi`, but each band passes through its (traceable,
    memoryless, per-sample) ``band_fns[k]`` and the bands are summed inside
    the final kernel — the K band signals are never materialized in HBM.
    Returns real [*lead, n_out]."""
    if tables is None:
        tables = plan_params(nfft)
    K = resps_perm.shape[0]
    R = Xr.shape[0]
    Yr, Yi = _stage_cb_multi(Xr, Xi, resps_perm, nfft, tables, interpret)
    return _reduce_stage_a(Yr, Yi, K, R, nfft, band_fns, tables,
                           interpret)[:, :n_out].reshape(
        tuple(lead) + (n_out,))


def enabled(nfft: int) -> bool:
    """Route this plan through the Pallas FFT?  Env override
    ``AMW_FFT_PALLAS`` (1/0); default: on when running on a TPU backend."""
    import os

    if not plan_ok(nfft):
        return False
    flag = os.environ.get("AMW_FFT_PALLAS")
    if flag is not None:
        return flag == "1"
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
