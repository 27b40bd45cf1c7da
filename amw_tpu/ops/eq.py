"""EQ op builders: target curve, style EQ, final balance, rumble, HF trim.

Each ``build_*`` returns ``(params, fn)`` where ``params`` is a (possibly
nested) list of host numpy arrays (filter responses / IRs — the op's
"weights") and ``fn(x, params)`` is the jittable apply on ``f32[..., N]``.

Pure-LTI ops run through the hybrid strategy (ops.zphase): one combined
power-response pass over the track plus exact two-pass edges — scipy-parity
output at a fraction of the FFT cost.

Reference semantics: backend/app/pipeline.py:170-273 (target curve, incl.
linear-phase and M/S modes), :576-607 (final spectral balance), :1401-1434
(style EQ), :1449-1469 (rumble filter), :1699-1733 (high-freq trim).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import FINAL_TRIM_DB, STYLE_CONFIGS
from ..spec import GraphSpec
from . import design
from .fdfilter import fftconvolve_same_fd
from .zphase import hybridize_op, make_zp, make_zp_from_power, scipy_padlen


def _db(x):
    return 10.0 ** (x / 20.0)


def _ms_wrap(spec: GraphSpec, fn):
    """Run a per-channel op on Mid/Side instead of L/R (eq_ms mode,
    pipeline.py:248-255).  Stereo only; decode clips to ±1."""

    def ms_fn(x, params):
        mid = (x[..., 0, :] + x[..., 1, :]) * 0.5
        side = (x[..., 0, :] - x[..., 1, :]) * 0.5
        ms = jnp.stack([mid, side], axis=-2)
        out = fn(ms, params)
        m, s = out[..., 0, :], out[..., 1, :]
        return jnp.stack(
            [jnp.clip(m + s, -1.0, 1.0), jnp.clip(m - s, -1.0, 1.0)], axis=-2
        )

    return ms_fn


def _target_curve_bas(spec: GraphSpec):
    nyq = spec.nyq
    b_hp, a_hp = design.butter_ba_norm(2, min(40.0 / nyq, 0.99), "high")
    b_lp, a_lp = design.butter_ba_norm(2, min(18000.0 / nyq, 0.99), "low")
    f_pres = min(3000.0 / nyq, 0.99)
    b_pr, a_pr = design.butter_ba_norm(1, (f_pres * 0.7, f_pres * 1.3), "band")
    f_mud = min(300.0 / nyq, 0.99)
    b_md, a_md = design.butter_ba_norm(1, (f_mud * 0.7, f_mud * 1.3), "band")
    return (b_hp, a_hp), (b_lp, a_lp), (b_pr, a_pr), (b_md, a_md)


def build_target_curve(spec: GraphSpec, phase_mode: str = "minimum",
                       eq_ms: bool = False):
    """Studio curve: HP 40 Hz, LP 18 kHz, +0.35 dB presence, -0.25 dB mud."""
    hp, lp, pr, md = _target_curve_bas(spec)
    g_p, g_m = _db(0.35), _db(-0.25)

    if phase_mode == "linear_phase":
        n_fft = 4096
        H = design.cascade_response([hp, lp], n_fft)
        H = H * (1.0 + (g_p - 1.0) * design.freqz(*pr, n_fft)
                 + (g_m - 1.0) * design.freqz(*md, n_fft))
        ir = design.linear_phase_ir_from_mag(np.abs(H), n_fft).astype(np.float32)
        nfft = design.next_fft_size(spec.n + n_fft)
        params = [ir]

        def fn(x, params):
            y = fftconvolve_same_fd(x, params[0], nfft)
            return jnp.clip(y, -1.0, 1.0)

        if eq_ms and spec.channels == 2:
            fn = _ms_wrap(spec, fn)
        return params, fn

    def build(s: GraphSpec):
        if s.exact:
            zps = [make_zp(s, [ba]) for ba in (hp, lp, pr, md)]
            params = [z.params for z in zps]

            def fn(x, params):
                y = zps[0](x, params[0])
                y = zps[1](y, params[1])
                pres = zps[2](y, params[2])
                mud = zps[3](y, params[3])
                return y + (g_p - 1.0) * pres + (g_m - 1.0) * mud

        else:
            padlen = scipy_padlen([hp])
            settle = design.settle_len(hp, lp, pr, md)
            nfft = design.next_fft_size(s.n + 2 * padlen + 3 * settle + 16)
            R = design.zero_phase_power([hp], nfft) * design.zero_phase_power([lp], nfft)
            R = R * (1.0 + (g_p - 1.0) * design.zero_phase_power([pr], nfft)
                     + (g_m - 1.0) * design.zero_phase_power([md], nfft))
            zp = make_zp_from_power(s, R, nfft, padlen, settle)
            params = [zp.params]

            def fn(x, params):
                return zp(x, params[0])

        return params, fn

    settle = design.settle_len(hp, lp, pr, md)
    params, fn = hybridize_op(spec, settle, scipy_padlen([hp]), build)
    if eq_ms and spec.channels == 2:
        fn = _ms_wrap(spec, fn)
    return params, fn


def _style_bands(spec: GraphSpec, style: str):
    cfg = STYLE_CONFIGS.get(style, STYLE_CONFIGS["standard"])
    nyq = spec.nyq
    raw = [
        (30.0, 90.0, cfg["sub"]), (90.0, 280.0, cfg["bass"]),
        (700.0, 2800.0, cfg["mids"]), (2800.0, 9000.0, cfg["presence"]),
        (10000.0, min(spec.sr * 0.46, 18000.0), cfg["air"]),
    ]
    bands = []
    for f_lo, f_hi, gain_db in raw:
        if abs(gain_db) < 0.05:
            continue
        lo_n, hi_n = min(f_lo / nyq, 0.98), min(f_hi / nyq, 0.98)
        if lo_n >= hi_n:
            continue
        ba = design.butter_ba_norm(1, (lo_n, hi_n), "band")
        bands.append((ba, _db(gain_db)))
    return bands


def build_style_eq(spec: GraphSpec, style: str = "standard"):
    """Genre EQ: sequential parallel-band boosts/cuts over 5 bands."""
    bands = _style_bands(spec, style)
    if not bands:
        return [], lambda x, params: x

    def build(s: GraphSpec):
        if s.exact:
            zps = [make_zp(s, [ba]) for ba, _ in bands]
            gains = [g for _, g in bands]
            params = [z.params for z in zps]

            def fn(x, params):
                out = x
                for z, p, g in zip(zps, params, gains):
                    out = out + (g - 1.0) * z(out, p)
                return out

        else:
            padlen = scipy_padlen([bands[0][0]])
            settle = design.settle_len(*[ba for ba, _ in bands])
            nfft = design.next_fft_size(s.n + 2 * padlen + 3 * settle + 16)
            R = np.ones(nfft // 2 + 1, np.float64)
            for ba, g in bands:
                R = R * (1.0 + (g - 1.0) * design.zero_phase_power([ba], nfft))
            zp = make_zp_from_power(s, R, nfft, padlen, settle)
            params = [zp.params]

            def fn(x, params):
                return zp(x, params[0])

        return params, fn

    settle = design.settle_len(*[ba for ba, _ in bands])
    return hybridize_op(spec, settle, scipy_padlen([bands[0][0]]), build)


def _final_balance_bas(spec: GraphSpec):
    nyq = spec.nyq
    f3k = min(3000.0 / nyq, 0.99)
    b3 = design.butter_ba_norm(1, (f3k * 0.8, f3k * 1.2), "band")
    b16 = design.butter_ba_norm(2, min(16000.0 / nyq, 0.99), "high")
    blo = design.butter_ba_norm(2, min(180.0 / nyq, 0.99), "low")
    f8k = min(8000.0 / nyq, 0.99)
    b8 = design.butter_ba_norm(1, (f8k * 0.8, f8k * 1.2), "band")
    gains = (_db(-0.5), _db(-0.3), _db(0.3), _db(0.2))
    return (b3, b16, blo, b8), gains


def build_final_spectral_balance(spec: GraphSpec):
    """Final 'soothe2-style' corrections (25% mix each) + trim +0.5 dB."""
    bas, gains = _final_balance_bas(spec)
    trim = _db(FINAL_TRIM_DB)

    def build(s: GraphSpec):
        if s.exact:
            zps = [make_zp(s, [ba]) for ba in bas]
            params = [z.params for z in zps]

            def fn(x, params):
                y = x
                for z, p, g in zip(zps, params, gains):
                    y = y + (g - 1.0) * z(x, p) * 0.25
                return y * trim

        else:
            padlen = scipy_padlen([bas[0]])
            settle = design.settle_len(*bas)
            nfft = design.next_fft_size(s.n + 2 * padlen + 3 * settle + 16)
            R = np.ones(nfft // 2 + 1, np.float64)
            for ba, g in zip(bas, gains):
                R = R + (g - 1.0) * design.zero_phase_power([ba], nfft) * 0.25
            R = R * trim  # fast path applies R directly (no squaring)
            zp = make_zp_from_power(s, R, nfft, padlen, settle)
            params = [zp.params]

            def fn(x, params):
                return zp(x, params[0])

        return params, fn

    settle = design.settle_len(*bas)
    return hybridize_op(spec, settle, scipy_padlen([bas[0]]), build)


def build_final_balance_then_style(spec: GraphSpec, style: str = "standard"):
    """Fused ``final_spectral_balance → style_eq`` (pipeline.py:576-607 then
    :1401-1434, which are adjacent in both the v1 pipeline and the default
    v2 chain).

    Both ops are static LTI, so their hybrid fast passes — previously one
    FFT pair each — collapse into a single pass over the product response
    (~109 ms/batch saved on v5e at [16, 2^23]).  Edge windows apply the two
    exact two-pass ops sequentially, preserving each op's scipy edge
    semantics.  Returns ``None`` when the style has no EQ bands (caller
    should fall back to the unfused final-balance op)."""
    import dataclasses

    bands = _style_bands(spec, style)
    if not bands:
        return None
    bas_fb, gains_fb = _final_balance_bas(spec)
    trim = _db(FINAL_TRIM_DB)
    # Composition transient ≤ sum of the two ops' settles; padlen is per-op
    # (each exact sub-op does its own odd extension inside the window).
    settle = design.settle_len(*bas_fb) + design.settle_len(
        *[ba for ba, _ in bands])
    padlen = max(scipy_padlen([bas_fb[0]]), scipy_padlen([bands[0][0]]))

    def build(s: GraphSpec):
        if s.exact:
            p1, f1 = build_final_spectral_balance(
                dataclasses.replace(s, hybrid=False))
            p2, f2 = build_style_eq(
                dataclasses.replace(s, hybrid=False), style)
            params = [list(p1), list(p2)]

            def fn(x, params):
                return f2(f1(x, params[0]), params[1])

        else:
            nfft = design.next_fft_size(s.n + 2 * padlen + 3 * settle + 16)
            R = np.ones(nfft // 2 + 1, np.float64)
            for ba, g in zip(bas_fb, gains_fb):
                R = R + (g - 1.0) * design.zero_phase_power([ba], nfft) * 0.25
            R = R * trim
            for ba, g in bands:
                R = R * (1.0 + (g - 1.0) * design.zero_phase_power([ba], nfft))
            zp = make_zp_from_power(s, R, nfft, padlen, settle)
            params = [zp.params]

            def fn(x, params):
                return zp(x, params[0])

        return params, fn

    return hybridize_op(spec, settle, padlen, build)


def build_rumble_filter(spec: GraphSpec, cutoff_hz: float = 80.0):
    cutoff_hz = float(np.clip(cutoff_hz, 20.0, 200.0))
    ba = design.butter_ba_norm(2, min(cutoff_hz / spec.nyq, 0.99), "high")
    zp = make_zp(spec, [ba])
    params = [zp.params]

    def fn(x, params):
        return zp(x, params[0])

    return params, fn


def build_high_freq_trim(spec: GraphSpec, crossover_hz: float = 5000.0,
                         high_gain: float = 0.9):
    if abs(high_gain - 1.0) < 0.001:
        return [], lambda x, params: x
    ba = design.butter_ba_norm(2, min(crossover_hz / spec.nyq, 0.98), "low")
    zp = make_zp(spec, [ba])
    params = [zp.params]

    def fn(x, params):
        low = zp(x, params[0])
        return jnp.clip(low + high_gain * (x - low), -1.0, 1.0)

    return params, fn
