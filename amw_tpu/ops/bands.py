"""Multiband dynamics: band split, per-band compression, maximizer, limiter.

Reference: backend/app/pipeline.py:333-481 (``_split_bands`` 4-band
Butterworth-2 filtfilt split, ``apply_multiband_dynamics``) and :610-641
(``apply_dynamics`` = multiband → maximizer → brickwall at -1.5 dBTP).

Two per-band compressor paths:

- ``soft_knee`` — the reference's scipy fallback (static memoryless curve,
  pipeline.py:282-330).  Bit-parity path used by the oracle tests.
- ``envelope`` — the TPU-native replacement for the reference's optional
  Pedalboard (JUCE C++) compressor: feed-forward design with the published
  per-band ballistics (10/80, 12/130, 18/180 ms — pipeline.py:452-456), an
  attack/release envelope detector (chunked-parallel scan) and a dB-domain
  hard-knee gain computer.  Validated by window-metric regression, not
  bit-parity (the JUCE algorithm is unspecified upstream).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import (
    MULTIBAND_ATTACK_RELEASE_MS,
    MULTIBAND_CONFIG,
    MULTIBAND_CROSSOVERS_HZ,
    TRUE_PEAK_LIMIT_DB,
)
from ..spec import GraphSpec
from . import design
from .basic import compress_soft_knee, limiter, maximizer
from .scan import ar_coefs, envelope_follower
from .zphase import make_zp, make_zp_from_power, scipy_padlen


def normalize_crossovers(crossovers_hz):
    cross = (
        tuple(float(c) for c in crossovers_hz)
        if crossovers_hz and len(crossovers_hz) == 3
        else MULTIBAND_CROSSOVERS_HZ
    )
    cross = tuple(float(np.clip(c, 20.0, 20000.0)) for c in cross)
    if cross[0] >= cross[1] or cross[1] >= cross[2]:
        cross = MULTIBAND_CROSSOVERS_HZ
    return cross


def band_split_plan(spec: GraphSpec, crossovers_hz=None, pre=None,
                    band_maps=None):
    """Prepare the 4-band split.  Returns (params, split_fn) where
    ``split_fn(x, params) -> [band1..band4]`` (each same shape as x).

    ``band_maps`` (optional): K memoryless per-sample callables; when
    given, split_fn instead returns the single MIXED signal
    ``sum_k band_maps[k](band_k)``.  On the Pallas path the maps and the
    sum run inside the final inverse kernel (ops.fft_pallas
    inv_multi_reduce), so the four band signals never touch HBM.

    Hybrid mode shares ONE forward FFT across the four band responses (1
    rfft + 4 irfft for the whole track) and splices exact two-pass edge
    windows per band.

    ``pre`` (ops.zphase.PreLTI, optional): a pure-LTI op fused in *front*
    of the split — its power response multiplies into every band response
    (the shared forward FFT then also covers that op, saving a full FFT
    pair), and its exact two-pass form prefixes the edge windows."""
    import dataclasses

    import jax.numpy as jnp

    from .fdfilter import odd_ext

    cross = normalize_crossovers(crossovers_hz)
    nyq = spec.nyq
    f1, f2, f3 = (min(c / nyq, 0.99) for c in cross)
    lp = lambda f: design.butter_ba_norm(2, f, "low")
    hp = lambda f: design.butter_ba_norm(2, f, "high")
    stages = [
        [lp(f1)],
        [hp(f1), lp(f2)],
        [hp(f2), lp(f3)],
        [hp(f3)],
    ]
    all_bas = [ba for chain in stages for ba in chain]
    padlen = scipy_padlen([all_bas[0]])
    settle = design.settle_len(*all_bas)
    if pre is not None:
        padlen = max(padlen, pre.padlen)
        settle = settle + pre.settle

    def build_twopass(s, apply_maps=True):
        zps = [[make_zp(dataclasses.replace(s, hybrid=False), [ba])
                for ba in chain] for chain in stages]
        band_params = [[z.params for z in chain] for chain in zps]
        if pre is not None:
            p_pre, f_pre = pre.small_build(dataclasses.replace(s, hybrid=False))
            params = [list(p_pre), band_params]
        else:
            params = band_params

        def split_fn(x, params):
            if pre is not None:
                pp, bp = params
                x = f_pre(x, pp)
            else:
                bp = params
            out = []
            for chain, ps in zip(zps, bp):
                y = x
                for z, p in zip(chain, ps):
                    y = z(y, p)
                out.append(y)
            if band_maps is not None and apply_maps:
                return sum(band_maps[i](out[i]) for i in range(4))
            return out

        return params, split_fn

    if spec.exact and spec.hybrid:
        from .zphase import _edge_windows

        L, w_in = _edge_windows(settle, padlen, spec.n)
        if 2 * w_in + 16 < spec.n:
            n = spec.n
            nfft = design.next_fft_size(n + 2 * padlen + 3 * settle + 16)
            R_pre = pre.power(nfft) if pre is not None else 1.0
            R_half = [
                np.prod([design.zero_phase_power([ba], nfft)
                         for ba in chain], axis=0) * R_pre
                for chain in stages
            ]
            from . import fft_pallas as fp

            use_pallas = fp.enabled(nfft)
            if use_pallas:
                R = np.stack([fp.permute_full_response(r, nfft)
                              for r in R_half])  # [4, 2, nfft]
            else:
                R = np.stack(R_half).astype(np.float32)  # [4, nbins]
            small_spec = dataclasses.replace(spec, n=w_in, hybrid=False)
            p_small, f_small = build_twopass(small_spec, apply_maps=False)
            params = [R, p_small] + ([fp.plan_params(nfft)] if use_pallas
                                     else [])

            def split_fn(x, params):
                from . import validctx

                Rd, ps = params[:2]
                nv = validctx.n_valid()
                xr = validctx.right_window(x, w_in, nv)
                with validctx.cleared():
                    # pallas path: extend AND zero-pad to nfft in one
                    # concatenate (roundtrip_multi then skips its pad pass)
                    core = odd_ext(x, padlen,
                                   pad_to=nfft if use_pallas else None)
                    lr = f_small(jnp.stack([x[..., :w_in], xr]), ps)
                left = [b[0] for b in lr]
                right = [b[1] for b in lr]
                if band_maps is not None and use_pallas:
                    # fused end to end: fwd -> responses -> inv -> maps ->
                    # band sum, spectrum and band signals never in HBM.
                    # Full nfft-length output; the splice slices past the
                    # odd extension (off=padlen) — no truncation copy.
                    mix = fp.roundtrip_multi_reduce(core, Rd, nfft, nfft,
                                                    band_maps,
                                                    tables=params[2])
                    el = sum(band_maps[i](left[i]) for i in range(4))
                    er = sum(band_maps[i](right[i]) for i in range(4))
                    return validctx.splice(mix, el, er, n, L, nv,
                                           off=padlen)
                # One batched inverse over the 4 band responses — measured
                # ~50 ms faster than 4 separate transforms at [16, 2^23].
                if use_pallas:
                    # band_maps was fully handled by the reduce path above;
                    # this branch only serves the split-bands (list) output.
                    ys = fp.roundtrip_multi(core, Rd, nfft, nfft,
                                            tables=params[2])
                    return [validctx.splice(ys[i], left[i], right[i],
                                            n, L, nv, off=padlen)
                            for i in range(4)]
                X = jnp.fft.rfft(core, n=nfft, axis=-1)
                Rb = Rd.reshape((4,) + (1,) * (X.ndim - 1)
                                + (Rd.shape[-1],))
                ys = jnp.fft.irfft(X[None] * Rb, n=nfft,
                                   axis=-1)[..., padlen:padlen + n]
                out = []
                for i in range(4):
                    out.append(validctx.splice(ys[i], left[i], right[i],
                                               n, L, nv))
                if band_maps is not None:
                    return sum(band_maps[i](out[i]) for i in range(4))
                return out

            return params, split_fn
        # short signals: fall through to pure two-pass
        return build_twopass(spec)

    if spec.exact:
        return build_twopass(spec)

    nfft = design.next_fft_size(spec.n + 2 * padlen + 3 * settle + 16)
    R_pre = pre.power(nfft) if pre is not None else 1.0
    zps = []
    for chain in stages:
        R = np.ones(nfft // 2 + 1, np.float64) * R_pre
        for ba in chain:
            R = R * design.zero_phase_power([ba], nfft)
        zps.append(make_zp_from_power(spec, R, nfft, padlen, settle))
    params = [z.params for z in zps]

    def split_fn(x, params):
        out = [z(x, p) for z, p in zip(zps, params)]
        if band_maps is not None:
            return sum(band_maps[i](out[i]) for i in range(4))
        return out

    return params, split_fn


def _band_attack_release(i: int):
    return MULTIBAND_ATTACK_RELEASE_MS[min(i, 3)]


def build_multiband_dynamics(
    spec: GraphSpec,
    knee_db: float = 6.0,
    crossovers_hz=None,
    band_ratios=None,
    max_upward_boost_db: float = 12.0,
    compressor: str = "soft_knee",
    pre=None,
):
    ratios_override = (
        tuple(float(band_ratios[i]) for i in range(4))
        if band_ratios is not None and len(band_ratios) == 4
        else None
    )

    band_cfg = []
    for i in range(4):
        lim_db, comp_ratio, comp_db, gain = MULTIBAND_CONFIG[i]
        ratio = ratios_override[i] if ratios_override else comp_ratio
        atk_ms, rel_ms = _band_attack_release(i)
        band_cfg.append((lim_db, ratio, comp_db, gain, atk_ms, rel_ms))

    use_env = compressor == "envelope"

    if not use_env:
        # soft-knee is memoryless per-sample, so the per-band compress,
        # limiter, gain and the band sum all fuse into the split (and, on
        # the Pallas path, into the final inverse kernel itself).
        def _map(i):
            lim_db, ratio, comp_db, gain, _, _ = band_cfg[i]

            def m(band):
                band = compress_soft_knee(
                    band, threshold_db=comp_db, ratio=ratio,
                    knee_db=knee_db,
                    max_upward_boost_db=max_upward_boost_db)
                return limiter(band, threshold_db=lim_db) * gain

            return m

        maps = [_map(i) for i in range(4)]
        return band_split_plan(spec, crossovers_hz, pre=pre, band_maps=maps)

    params, split_fn = band_split_plan(spec, crossovers_hz, pre=pre)

    def fn(x, params):
        bands = split_fn(x, params)
        out = None
        for i, band in enumerate(bands):
            lim_db, ratio, comp_db, gain, atk_ms, rel_ms = band_cfg[i]
            if ratio >= 1.0:
                band = _envelope_compress(
                    band, spec.sr, comp_db, ratio, atk_ms, rel_ms
                )
            else:
                band = compress_soft_knee(
                    band, threshold_db=comp_db, ratio=ratio, knee_db=knee_db,
                    max_upward_boost_db=max_upward_boost_db,
                )
            band = limiter(band, threshold_db=lim_db) * gain
            out = band if out is None else out + band
        return out

    return params, fn


def _envelope_compress(band, sr, threshold_db, ratio, attack_ms, release_ms):
    """Feed-forward compressor with attack/release detector (TPU-native
    stand-in for the Pedalboard/JUCE band compressor)."""
    att, rel = ar_coefs(sr, attack_ms / 1000.0, release_ms / 1000.0)
    env = envelope_follower(jnp.abs(band), att, rel)
    env_db = 20.0 * jnp.log10(jnp.maximum(env, 1e-10))
    over = jnp.maximum(env_db - threshold_db, 0.0)
    gain_db = over * (1.0 / ratio - 1.0)
    return band * 10.0 ** (gain_db / 20.0)


def build_dynamics(
    spec: GraphSpec,
    knee_db: float = 6.0,
    crossovers_hz=None,
    band_ratios=None,
    max_upward_boost_db: float = 12.0,
    compressor: str = "soft_knee",
    pre=None,
):
    """Full dynamics stage: 4-band dynamics → maximizer → brickwall limiter.

    ``pre``: optional PreLTI fused in front of the band split (shares the
    forward FFT — see band_split_plan)."""
    params, mb_fn = build_multiband_dynamics(
        spec, knee_db, crossovers_hz, band_ratios, max_upward_boost_db,
        compressor, pre=pre,
    )

    def fn(x, params):
        y = mb_fn(x, params)
        y = maximizer(y)
        return limiter(y, threshold_db=TRUE_PEAK_LIMIT_DB)

    return params, fn
