"""Cross-op spectrum-sharing fusions for the mastering chain's hot path.

The chain is FFT-bound on TPU (~109 ms per [16, 2^23] forward+inverse pair
on v5e), and several adjacent stages are linear up to a traced scalar, so
their *forward* transforms can be shared:

- ``target_curve → deesser`` (pipeline.py:170-273 then :480-560, adjacent
  in the v1 pipeline): the de-esser's sidechain is a zero-phase bandpass of
  the target-curve output, so ``sidechain = irfft(X·Rt·Rb)`` reuses the
  ``X = rfft(x)`` that also produces the target-curve output — one forward
  FFT instead of two.
- ``normalize_lufs → final_spectral_balance [→ style_eq]``
  (pipeline.py:644-655 then :576-607 then :1401-1434): normalization is a
  traced *scalar* gain, so the K-weighted measurement and the following EQ
  both read the same spectrum: ``out = g · irfft(X·R_eq)`` with ``g``
  derived from ``irfft(X·Hk)`` — again one forward FFT instead of two.

Fast interiors skip the scipy odd extension (it only shapes the outer
``settle+padlen`` samples, which are replaced by the spliced exact edge
windows — the same argument the hybrid strategy in ops.zphase rests on).
Edge windows apply the constituent exact two-pass ops *sequentially*, so
scipy edge semantics per op are preserved to the IR-truncation level.

Measured on v5e at batch 8 (bench.py): these two fusions plus the
final-balance/style fusion (ops.eq.build_final_balance_then_style) take the
standard-style chain from 0.942 s to ~0.83 s per batch.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..spec import GraphSpec
from . import design
from .eq import (_db, _final_balance_bas, _style_bands, _target_curve_bas,
                 build_final_spectral_balance, build_style_eq,
                 build_target_curve)
from .meters import (block_energies, gated_loudness, k_weight_settle,
                     normalize_lufs_gain, plan_blocks)
from .scan import ar_coefs, deesser_gain_combine, envelope_follower
from .zphase import PreLTI, _edge_windows, make_zp, pack_complex, scipy_padlen
from ..constants import FINAL_TRIM_DB


def _splice(y_fast, yl, yr, n: int, L: int):
    return jnp.concatenate(
        [yl[..., :L], y_fast[..., L:n - L], yr[..., -L:]], axis=-1)


def build_target_then_deesser(
    spec: GraphSpec,
    threshold_db: float = -6.0,
    ratio: float = 3.0,
    freq_lo: float = 5000.0,
    freq_hi: float = 9000.0,
    attack_ms: float = 4.0,
    release_ms: float = 85.0,
):
    """Fused ``target_curve`` (minimum-phase, per-channel) + ``deesser``.

    Returns ``None`` when the fusion does not apply (sibilance band empty at
    this sample rate, or tiny tracks where hybrid splicing is moot) — the
    caller then falls back to the two separate ops.
    """
    lo_n = min(freq_lo / spec.nyq, 0.97)
    hi_n = min(freq_hi / spec.nyq, 0.97)
    if lo_n >= hi_n or not (spec.exact and spec.hybrid):
        return None
    hp, lp, pr, md = _target_curve_bas(spec)
    g_p, g_m = _db(0.35), _db(-0.25)
    band = design.butter_ba_norm(2, (lo_n, hi_n), "band")

    settle_t = design.settle_len(hp, lp, pr, md)
    settle_b = design.settle_len(band)
    padlen = max(scipy_padlen([hp]), scipy_padlen([band]))
    # Window sized for the target∘bandpass composition (sidechain edges);
    # also (amply) valid for the target-only edges.
    L, w = _edge_windows(settle_t + settle_b, padlen, spec.n)
    if 2 * w + 16 >= spec.n:
        return None
    nfft = design.next_fft_size(
        spec.n + 2 * padlen + 3 * (settle_t + settle_b) + 16)

    Rt = design.zero_phase_power([hp], nfft) * design.zero_phase_power([lp], nfft)
    Rt = Rt * (1.0 + (g_p - 1.0) * design.zero_phase_power([pr], nfft)
               + (g_m - 1.0) * design.zero_phase_power([md], nfft))
    Rtb = Rt * design.zero_phase_power([band], nfft)

    small_spec = dataclasses.replace(spec, n=w, hybrid=False)
    p_t, f_t = build_target_curve(small_spec)
    band_zp = make_zp(small_spec, [band])

    att, rel = ar_coefs(spec.sr, attack_ms / 1000.0, release_ms / 1000.0)
    thresh = _db(threshold_db)
    k = max(3, int(spec.sr * 0.0015))
    if k % 2 == 0:
        k += 1

    from . import fft_pallas as fp

    use_pallas = fp.enabled(nfft)
    if use_pallas:
        resp2 = np.stack([fp.permute_full_response(Rt, nfft),
                          fp.permute_full_response(Rtb, nfft)])
        params = [resp2, list(p_t), list(band_zp.params),
                  fp.plan_params(nfft)]
    else:
        params = [np.stack([Rt, Rtb]).astype(np.float32),
                  list(p_t), list(band_zp.params)]
    n = spec.n

    def fn(x, params):
        from . import validctx

        R2, pt, pb = params[:3]
        nv = validctx.n_valid()
        xr = validctx.right_window(x, w, nv)
        with validctx.cleared():
            if use_pallas:
                # spectrum kept in VMEM across fwd/resp/inv (fft_pallas
                # roundtrip_multi) — saves 4 nfft-plane HBM passes.  Full
                # nfft-length outputs: the splice slices to n (no separate
                # truncation copy).
                ys = fp.roundtrip_multi(x, R2, nfft, nfft, tables=params[3])
            else:
                X = jnp.fft.rfft(x, n=nfft, axis=-1)
                # one batched irfft over both responses (faster than two)
                Rb = R2.reshape((2,) + (1,) * (X.ndim - 1) + (R2.shape[-1],))
                ys = jnp.fft.irfft(X[None] * Rb, n=nfft, axis=-1)[..., :n]
            y3_f, sc_f = ys[0], ys[1]
            # exact edges: target on raw windows, band on the exact target
            # output
            y3lr = f_t(jnp.stack([x[..., :w], xr]), pt)
            sclr = band_zp(y3lr, pb)
        y3 = validctx.splice(y3_f, y3lr[0], y3lr[1], n, L, nv)
        sc = validctx.splice(sc_f, sclr[0], sclr[1], n, L, nv)
        # Envelope -> gain -> box smoothing -> combine in one Pallas pass
        # (ops/scan.deesser_gain_combine); zeros beyond the valid end like
        # the exact-length graph's box_smooth_same.
        return deesser_gain_combine(y3, sc, att, rel, thresh, ratio, k,
                                    nv=nv)

    return params, fn


def target_curve_pre(spec: GraphSpec):
    """The minimum-phase, per-channel target curve packaged as a
    :class:`~amw_tpu.ops.zphase.PreLTI` for fusion in front of a band split
    (see ops.bands.band_split_plan)."""
    hp, lp, pr, md = _target_curve_bas(spec)
    g_p, g_m = _db(0.35), _db(-0.25)

    def power(nfft: int) -> np.ndarray:
        R = (design.zero_phase_power([hp], nfft)
             * design.zero_phase_power([lp], nfft))
        return R * (1.0 + (g_p - 1.0) * design.zero_phase_power([pr], nfft)
                    + (g_m - 1.0) * design.zero_phase_power([md], nfft))

    return PreLTI(
        settle=design.settle_len(hp, lp, pr, md),
        padlen=scipy_padlen([hp]),
        power=power,
        small_build=build_target_curve,
    )


def build_target_then_dynamics(spec: GraphSpec, **dyn_kwargs):
    """Fused ``target_curve`` (minimum-phase, per-channel) + ``dynamics``:
    the band split's shared forward FFT also carries the target-curve
    response — one FFT pair saved per track.  Used by the v2 chain, where
    the two modules are adjacent (chain.py:116-120)."""
    from .bands import build_dynamics

    return build_dynamics(spec, pre=target_curve_pre(spec), **dyn_kwargs)


def build_normalize_then_final(
    spec: GraphSpec,
    target_lufs: float = -14.0,
    style: str | None = None,
):
    """Fused ``normalize_lufs`` + ``final_spectral_balance`` and, when the
    style has EQ bands, ``style_eq`` as well.

    The normalization gain is a traced scalar, so the K-weighted loudness
    measurement and the downstream EQ share one forward FFT; the EQ output
    is simply scaled by the gain (LTI ∘ scalar commute).  The LUFS target
    stays a runtime parameter (one compiled graph serves any target).

    Returns ``(params, fn, fused_ids)`` or ``None`` when hybrid splicing
    does not apply (tiny tracks / exact-off specs).
    """
    if not (spec.exact and spec.hybrid):
        return None
    bas_fb, gains_fb = _final_balance_bas(spec)
    trim = _db(FINAL_TRIM_DB)
    bands = _style_bands(spec, style) if style is not None else []

    settle_e = design.settle_len(*bas_fb)
    padlen = scipy_padlen([bas_fb[0]])
    if bands:
        settle_e += design.settle_len(*[ba for ba, _ in bands])
        padlen = max(padlen, scipy_padlen([bands[0][0]]))
    L, w = _edge_windows(settle_e, padlen, spec.n)
    if 2 * w + 16 >= spec.n:
        return None

    settle_k = k_weight_settle(spec.sr)
    nfft = design.next_fft_size(
        spec.n + max(2 * padlen + 3 * settle_e + 16, settle_k))
    plan = plan_blocks(spec.sr, spec.n)
    Hk_c = design.cascade_response(design.k_weighting_ba(spec.sr), nfft)
    Hk = pack_complex(Hk_c)

    R = np.ones(nfft // 2 + 1, np.float64)
    for ba, g in zip(bas_fb, gains_fb):
        R = R + (g - 1.0) * design.zero_phase_power([ba], nfft) * 0.25
    R = R * trim
    for ba, g in bands:
        R = R * (1.0 + (g - 1.0) * design.zero_phase_power([ba], nfft))

    small_spec = dataclasses.replace(spec, n=w, hybrid=False)
    p_fb, f_fb = build_final_spectral_balance(small_spec)
    if bands:
        p_se, f_se = build_style_eq(small_spec, style)

        def f_small(xw, ps):
            return f_se(f_fb(xw, ps[0]), ps[1])

        p_small = [list(p_fb), list(p_se)]
        fused_ids = "normalize_lufs+final_spectral_balance+style_eq"
    else:
        f_small, p_small = f_fb, list(p_fb)
        fused_ids = "normalize_lufs+final_spectral_balance"

    from . import fft_pallas as fp

    use_pallas = fp.enabled(nfft)
    if use_pallas:
        resp2 = np.stack([fp.permute_full_response(Hk_c, nfft),
                          fp.permute_full_response(R, nfft)])
        params = [resp2, np.float32(target_lufs), p_small,
                  fp.plan_params(nfft)]
    else:
        params = [Hk, np.float32(target_lufs), R.astype(np.float32), p_small]
    n = spec.n

    def fn(x, params):
        from . import validctx

        nv = validctx.n_valid()
        xr = validctx.right_window(x, w, nv)
        with validctx.cleared():
            if use_pallas:
                # full nfft-length outputs: block_energies frames only the
                # plan's span and the splice slices to n — the [..., :n]
                # truncation copy is elided.
                R2, tgt, ps, tabs = params
                z = fp.roundtrip_multi(x, R2, nfft, nfft, tables=tabs)
            else:
                Hk_d, tgt, R_d, ps = params
                X = jnp.fft.rfft(x, n=nfft, axis=-1)
                # one batched irfft over K-weighting + EQ responses
                Y = jnp.stack([X * jax.lax.complex(Hk_d[0], Hk_d[1]),
                               X * R_d])
                z = jnp.fft.irfft(Y, n=nfft, axis=-1)[..., :n]
        # Causal K-weighting ringout past the valid end must not leak into
        # the (truncated-tail) gating blocks — the exact-length meter reads
        # zeros there.
        yk = validctx.mask_tail(z[0], nv)
        mask = None
        if nv is not None:
            n_blocks_v = jnp.round((nv / plan.sr - 0.4) / 0.1) + 1
            mask = jnp.arange(plan.n_blocks) < n_blocks_v
        lufs = gated_loudness(block_energies(yk, plan), block_mask=mask)
        g = normalize_lufs_gain(lufs, tgt)
        fast = z[1] * g
        with validctx.cleared():
            elr = f_small(jnp.stack([x[..., :w], xr]) * g, ps)
        return validctx.splice(fast, elr[0], elr[1], n, L, nv)

    return params, fn, fused_ids
