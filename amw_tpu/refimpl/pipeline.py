"""Numpy/scipy oracle for the mastering DSP ops (channel-major [C, N]).

Each function mirrors the corresponding reference op's math exactly
(citations: backend/app/pipeline.py) but is restructured: channel loops are
vectorized over the leading axis, and scipy filters run with ``axis=-1``.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sg

from ..constants import (
    DYNAMIC_EQ_MASTERING_BANDS,
    FINAL_TRIM_DB,
    MAXIMIZER_MARGIN_DB,
    MAXIMIZER_THRESHOLD_DB,
    MULTIBAND_CONFIG,
    MULTIBAND_CROSSOVERS_HZ,
    REVERB_PRESETS,
    STYLE_CONFIGS,
    TRUE_PEAK_LIMIT_DB,
)

__all__ = [
    "remove_dc_offset", "remove_intersample_peaks", "output_edge_fade_in",
    "safe_filtfilt", "target_curve", "limiter_np", "compress_soft_knee",
    "split_bands", "multiband_dynamics", "maximizer", "envelope_follower",
    "maximizer_transient_aware", "maximizer_lookahead", "final_spectral_balance",
    "dynamics", "integrated_lufs", "normalize_lufs", "timeline_lufs",
    "deesser", "exciter_saturate", "harmonic_exciter", "stereo_imager",
    "style_eq", "rumble_filter", "spectral_denoise", "spectral_envelope",
    "reference_match", "dynamic_eq", "high_freq_trim", "transient_designer",
    "parallel_compression", "reverb", "k_weight", "true_peak_dbfs",
    "dither_tpdf", "dither_ns_e", "dither_ns_itu", "quantize16",
    "resample_fft", "v1_pipeline",
]


def db(x):
    return 10.0 ** (x / 20.0)


def safe_filtfilt(b, a, x):
    """scipy filtfilt with the reference's fallback ladder (pipeline.py:36-52)."""
    try:
        return sg.filtfilt(b, a, x, axis=-1)
    except (np.linalg.LinAlgError, ValueError):
        try:
            return sg.lfilter(b, a, x, axis=-1)
        except Exception:
            return x


# --- basics (pipeline.py:134-167,276-330,484-492,1904) ---------------------

def remove_dc_offset(x):
    return x - np.mean(x, axis=-1, keepdims=True)


def remove_intersample_peaks(x, headroom_db=0.5):
    x = np.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
    peak = np.max(np.abs(x)) if x.size else 0.0
    limit = db(-headroom_db)
    if peak > limit:
        x = x * (limit / peak)
    return np.clip(x, -1.0, 1.0)


def output_edge_fade_in(x, sr, fade_ms=6.0):
    n = x.shape[-1]
    if fade_ms <= 0 or sr <= 0 or n == 0:
        return x
    n_fade = int(round(sr * (fade_ms / 1000.0)))
    n_fade = max(2, min(n_fade, int(sr * 0.1)))
    n_fade = min(n_fade, n)
    out = np.array(x, dtype=np.float32, copy=True)
    ramp = np.linspace(0.0, 1.0, n_fade, dtype=np.float32)
    out[..., :n_fade] *= ramp
    return out


def limiter_np(x, threshold_db=-1.0):
    lim = db(threshold_db)
    return np.clip(x, -lim, lim).astype(np.float32)


def compress_soft_knee(x, threshold_db=-18.0, ratio=2.5, knee_db=6.0,
                       max_upward_boost_db=12.0):
    if ratio <= 0.0 or ratio == 1.0:
        return x
    thresh = db(threshold_db)
    abs_x = np.abs(x)
    sign = np.sign(x)
    if ratio < 1.0:
        eps = 1e-12
        level_db = np.where(abs_x > eps, 20.0 * np.log10(np.maximum(abs_x, eps)), -100.0)
        boost = np.clip((threshold_db - level_db) * (1.0 - ratio),
                        0.0, max(0.1, float(max_upward_boost_db)))
        return (sign * np.clip(abs_x * db(boost), 0.0, 1.0)).astype(np.float32)
    knee_db = max(0.0, float(knee_db))
    if knee_db < 0.5:
        out_abs = np.minimum(abs_x, thresh + np.maximum(abs_x - thresh, 0.0) / ratio)
        return (sign * out_abs).astype(np.float32)
    lower = thresh * db(-knee_db)
    upper = thresh * db(knee_db)
    slope = (thresh + (upper - thresh) / ratio - lower) / (upper - lower)
    out_abs = np.where(
        abs_x <= lower, abs_x,
        np.where(abs_x >= upper, thresh + (abs_x - thresh) / ratio,
                 lower + (abs_x - lower) * slope),
    )
    return (sign * np.clip(out_abs, 0.0, None)).astype(np.float32)


def maximizer(x):
    ceiling = db(MAXIMIZER_MARGIN_DB)
    thresh = db(MAXIMIZER_THRESHOLD_DB)
    abs_x = np.abs(x)
    out_abs = np.where(abs_x <= thresh,
                       abs_x, thresh + (abs_x - thresh) * (ceiling - thresh) / (1.0 - thresh))
    return (np.sign(x) * np.minimum(out_abs, ceiling)).astype(np.float32)


# --- EQ (pipeline.py:170-273,576-607,1401-1434,1449-1469,1699-1733) --------

def _target_curve_coeffs(sr):
    nyq = sr / 2.0
    b_hp, a_hp = sg.butter(2, min(40.0 / nyq, 0.99), btype="high")
    b_lp, a_lp = sg.butter(2, min(18000.0 / nyq, 0.99), btype="low")
    f_pres = min(3000.0 / nyq, 0.99)
    b_pr, a_pr = sg.butter(1, [f_pres * 0.7, f_pres * 1.3], btype="band")
    f_mud = min(300.0 / nyq, 0.99)
    b_md, a_md = sg.butter(1, [f_mud * 0.7, f_mud * 1.3], btype="band")
    return (b_hp, a_hp, b_lp, a_lp, b_pr, a_pr, b_md, a_md), db(0.35), db(-0.25)


def target_curve(x, sr, phase_mode="minimum", eq_ms=False):
    if eq_ms and x.ndim == 2 and x.shape[0] == 2:
        mid = (x[0] + x[1]) * 0.5
        side = (x[0] - x[1]) * 0.5
        m = target_curve(mid[None], sr, phase_mode)[0]
        s = target_curve(side[None], sr, phase_mode)[0]
        return np.stack([np.clip(m + s, -1, 1), np.clip(m - s, -1, 1)]).astype(np.float32)
    (b_hp, a_hp, b_lp, a_lp, b_pr, a_pr, b_md, a_md), g_p, g_m = _target_curve_coeffs(sr)
    if phase_mode == "linear_phase":
        from ..ops import design
        n_fft = 4096
        coeffs = [(b_hp, a_hp), (b_lp, a_lp)]
        w_half = design.cascade_response(coeffs, n_fft)
        h_pr = design.freqz(b_pr, a_pr, n_fft)
        h_md = design.freqz(b_md, a_md, n_fft)
        H = w_half * (1.0 + (g_p - 1.0) * h_pr + (g_m - 1.0) * h_md)
        ir = design.linear_phase_ir_from_mag(np.abs(H), n_fft).astype(np.float32)
        out = np.stack([sg.fftconvolve(ch, ir, mode="same") for ch in np.atleast_2d(x)])
        out = np.clip(out, -1.0, 1.0).astype(np.float32)
        return out if x.ndim == 2 else out[0]
    y = safe_filtfilt(b_hp, a_hp, x)
    y = safe_filtfilt(b_lp, a_lp, y)
    pres = safe_filtfilt(b_pr, a_pr, y)
    mud = safe_filtfilt(b_md, a_md, y)
    return y + (g_p - 1.0) * pres + (g_m - 1.0) * mud


def final_spectral_balance(x, sr):
    nyq = sr / 2.0
    f3k = min(3000.0 / nyq, 0.99)
    b3, a3 = sg.butter(1, [f3k * 0.8, f3k * 1.2], btype="band")
    b16, a16 = sg.butter(2, min(16000.0 / nyq, 0.99), btype="high")
    blo, alo = sg.butter(2, min(180.0 / nyq, 0.99), btype="low")
    f8k = min(8000.0 / nyq, 0.99)
    b8, a8 = sg.butter(1, [f8k * 0.8, f8k * 1.2], btype="band")
    y = x
    y = y + (db(-0.5) - 1.0) * safe_filtfilt(b3, a3, x) * 0.25 \
          + (db(-0.3) - 1.0) * safe_filtfilt(b16, a16, x) * 0.25
    y = y + (db(0.3) - 1.0) * safe_filtfilt(blo, alo, x) * 0.25 \
          + (db(0.2) - 1.0) * safe_filtfilt(b8, a8, x) * 0.25
    return y * db(FINAL_TRIM_DB)


def style_eq(x, sr, style="standard"):
    cfg = STYLE_CONFIGS.get(style, STYLE_CONFIGS["standard"])
    nyq = sr / 2.0
    bands = [
        (30.0, 90.0, cfg["sub"]), (90.0, 280.0, cfg["bass"]),
        (700.0, 2800.0, cfg["mids"]), (2800.0, 9000.0, cfg["presence"]),
        (10000.0, min(sr * 0.46, 18000.0), cfg["air"]),
    ]
    out = np.array(x, dtype=np.float32, copy=True)
    for f_lo, f_hi, gain_db in bands:
        if abs(gain_db) < 0.05:
            continue
        lo_n, hi_n = min(f_lo / nyq, 0.98), min(f_hi / nyq, 0.98)
        if lo_n >= hi_n:
            continue
        b, a = sg.butter(1, [lo_n, hi_n], btype="band")
        out = (out + (db(gain_db) - 1.0) * safe_filtfilt(b, a, out)).astype(np.float32)
    return out


def rumble_filter(x, sr, cutoff_hz=80.0):
    cutoff_hz = float(np.clip(cutoff_hz, 20.0, 200.0))
    b, a = sg.butter(2, min(cutoff_hz / (sr / 2.0), 0.99), btype="high")
    return safe_filtfilt(b, a, x.astype(np.float64)).astype(np.float32)


def high_freq_trim(x, sr, crossover_hz=5000.0, high_gain=0.9):
    if abs(high_gain - 1.0) < 0.001:
        return x
    b, a = sg.butter(2, min(crossover_hz / (sr / 2.0), 0.98), btype="low")
    low = safe_filtfilt(b, a, x.astype(np.float64)).astype(np.float32)
    out = low + high_gain * (x.astype(np.float32) - low)
    return np.clip(out, -1.0, 1.0).astype(np.float32)


# --- multiband dynamics (pipeline.py:333-481,610-641) ----------------------

def split_bands(x, sr, crossovers_hz=MULTIBAND_CROSSOVERS_HZ):
    nyq = sr / 2.0
    f1, f2, f3 = (min(c / nyq, 0.99) for c in crossovers_hz)
    lp = lambda f: sg.butter(2, f, btype="low")
    hp = lambda f: sg.butter(2, f, btype="high")
    band1 = safe_filtfilt(*lp(f1), x)
    band2 = safe_filtfilt(*lp(f2), safe_filtfilt(*hp(f1), x))
    band3 = safe_filtfilt(*lp(f3), safe_filtfilt(*hp(f2), x))
    band4 = safe_filtfilt(*hp(f3), x)
    return [band1, band2, band3, band4]


def multiband_dynamics(x, sr, knee_db=6.0, crossovers_hz=None, band_ratios=None,
                       max_upward_boost_db=12.0):
    cross = crossovers_hz if crossovers_hz and len(crossovers_hz) == 3 else MULTIBAND_CROSSOVERS_HZ
    cross = tuple(float(np.clip(c, 20.0, 20000.0)) for c in cross)
    if cross[0] >= cross[1] or cross[1] >= cross[2]:
        cross = MULTIBAND_CROSSOVERS_HZ
    bands = split_bands(x, sr, cross)
    out = np.zeros_like(bands[0], dtype=np.float64)
    for i in range(4):
        lim_db, comp_ratio, comp_db, gain = MULTIBAND_CONFIG[i]
        ratio = float(band_ratios[i]) if band_ratios is not None and len(band_ratios) == 4 else comp_ratio
        band = compress_soft_knee(bands[i], threshold_db=comp_db, ratio=ratio,
                                  knee_db=knee_db, max_upward_boost_db=max_upward_boost_db)
        band = limiter_np(band, threshold_db=lim_db)
        out = out + band * gain
    return out.astype(np.float32)


def dynamics(x, sr, knee_db=6.0, crossovers_hz=None, band_ratios=None,
             max_upward_boost_db=12.0):
    y = multiband_dynamics(x.astype(np.float32), sr, knee_db, crossovers_hz,
                           band_ratios, max_upward_boost_db)
    y = maximizer(y)
    return limiter_np(y, threshold_db=TRUE_PEAK_LIMIT_DB)


# --- envelope-based ops (pipeline.py:495-573,1200-1264,1628-1797) ----------

def envelope_follower(v, sr, attack_sec, release_sec):
    """Exact sequential attack/release envelope of nonnegative ``v`` [..., N]."""
    att = float(np.exp(-1.0 / max(1e-6, sr * attack_sec)))
    rel = float(np.exp(-1.0 / max(1e-6, sr * release_sec)))
    v = np.asarray(v, np.float32)
    flat = v.reshape(-1, v.shape[-1])
    env = np.empty_like(flat)
    e = flat[:, 0].copy()
    env[:, 0] = e
    for i in range(1, flat.shape[1]):
        val = flat[:, i]
        coef = np.where(val > e, att, rel)
        e = coef * e + (1.0 - coef) * val
        env[:, i] = e
    return env.reshape(v.shape)


def maximizer_transient_aware(x, sr, sensitivity=0.5):
    limited = maximizer(x)
    mono = np.mean(np.abs(np.atleast_2d(x)), axis=0).astype(np.float32)
    fast = envelope_follower(mono, sr, 0.0005, 0.002)
    slow = envelope_follower(mono, sr, 0.01, 0.04)
    mask = np.clip(np.maximum(fast - slow, 0.0) / (slow + 1e-12) * float(sensitivity), 0.0, 1.0)
    out = limited * (1.0 - mask) + x * mask
    return np.clip(out, -1.0, 1.0).astype(np.float32)


def maximizer_lookahead(x, sr, lookahead_ms=6.0):
    n = x.shape[-1]
    delay_n = int(sr * (lookahead_ms / 1000.0))
    if delay_n <= 0 or delay_n >= n:
        return maximizer(x)
    delayed = np.concatenate([np.zeros(x.shape[:-1] + (delay_n,), x.dtype),
                              x[..., :-delay_n]], axis=-1)
    limited = maximizer(delayed)
    out = np.concatenate([x[..., :delay_n], limited[..., delay_n:]], axis=-1).astype(np.float32)
    cf = min(delay_n, max(2, int(sr * 0.002)))
    for i in range(cf):
        idx = delay_n - cf + i
        a = (i + 1) / float(cf)
        out[..., idx] = (1.0 - a) * x[..., idx] + a * limited[..., idx]
    return out


def deesser(x, sr, threshold_db=-6.0, ratio=3.0, freq_lo=5000.0, freq_hi=9000.0,
            attack_ms=4.0, release_ms=85.0):
    nyq = sr / 2.0
    lo_n, hi_n = min(freq_lo / nyq, 0.97), min(freq_hi / nyq, 0.97)
    if lo_n >= hi_n:
        return x
    b, a = sg.butter(2, [lo_n, hi_n], btype="band")
    thresh = db(threshold_db)
    sidechain = safe_filtfilt(b, a, x).astype(np.float32)
    env = envelope_follower(np.abs(sidechain), sr, attack_ms / 1000.0, release_ms / 1000.0)
    reduction = np.where(env > thresh, thresh + (env - thresh) / ratio, env)
    gain = np.where(env > 1e-10, reduction / (env + 1e-12), 1.0)
    gain = np.clip(gain, 0.35, 1.0).astype(np.float32)
    k = max(3, int(sr * 0.0015))
    if k % 2 == 0:
        k += 1
    ker = np.ones(k, np.float32) / float(k)
    gain = np.stack([np.convolve(g, ker, mode="same") for g in np.atleast_2d(gain)])
    gain = np.clip(gain, 0.35, 1.0).reshape(env.shape)
    return (x - sidechain + sidechain * gain).astype(np.float32)


def transient_designer(x, sr, attack_gain=1.0, sustain_gain=1.0):
    attack_gain = float(np.clip(attack_gain, 0.1, 3.0))
    sustain_gain = float(np.clip(sustain_gain, 0.1, 3.0))
    if abs(attack_gain - 1.0) < 0.02 and abs(sustain_gain - 1.0) < 0.02:
        return x
    abs_x = np.abs(x.astype(np.float32))
    fast = envelope_follower(abs_x, sr, 0.0005, 0.005)
    slow = envelope_follower(abs_x, sr, 0.005, 0.1)
    transient = np.maximum(fast - slow, 0.0)
    gain = np.clip((transient * attack_gain + slow * sustain_gain) / (fast + 1e-12),
                   0.0, 4.0).astype(np.float32)
    return np.clip(x * gain, -1.0, 1.0).astype(np.float32)


def parallel_compression(x, sr, mix=0.3, ratio=8.0, threshold_db=-20.0):
    mix = float(np.clip(mix, 0.0, 1.0))
    if mix < 0.01:
        return x
    compressed = compress_soft_knee(x, threshold_db=threshold_db, ratio=ratio,
                                    knee_db=6.0, max_upward_boost_db=0.0)
    return np.clip(x * (1.0 - mix) + compressed * mix, -1.0, 1.0).astype(np.float32)


def dynamic_eq(x, sr, bands=None):
    if bands is None:
        bands = DYNAMIC_EQ_MASTERING_BANDS
    nyq = sr / 2.0
    out = np.array(np.atleast_2d(x), dtype=np.float32, copy=True)
    orig = out.copy()
    for band in bands:
        freq = float(band.get("freq", 1000))
        q = float(band.get("q", 1.4))
        threshold_db = float(band.get("threshold_db", -12))
        ratio = float(band.get("ratio", 3.0))
        attack_ms = float(band.get("attack_ms", 5))
        release_ms = float(band.get("release_ms", 80))
        max_cut_db = float(band.get("max_cut_db", -6))
        if freq <= 0 or freq >= nyq * 0.98:
            continue
        w0 = float(np.clip(freq / nyq, 0.001, 0.98))
        # NOTE: the reference passes its computed *bandwidth* as iirpeak's
        # second argument, which scipy interprets as Q (pipeline.py:1660-1663)
        # — yielding unstable bells whose output is NaN-scrubbed garbage.  We
        # implement the evident intent: a stable bell with quality factor q.
        b, a = sg.iirpeak(w0, max(q, 0.1))
        thresh = db(threshold_db)
        max_cut = db(max_cut_db)
        band_sig = np.nan_to_num(
            safe_filtfilt(b, a, out.astype(np.float64)).astype(np.float32),
            nan=0.0, posinf=0.0, neginf=0.0)
        env = np.nan_to_num(
            envelope_follower(np.abs(band_sig), sr, attack_ms / 1000.0, release_ms / 1000.0),
            nan=0.0, posinf=0.0, neginf=0.0)
        gain = np.where(env > thresh,
                        np.clip((thresh + (env - thresh) / ratio) / (env + 1e-12), max_cut, 1.0),
                        1.0).astype(np.float32)
        gain = np.clip(np.nan_to_num(gain, nan=1.0, posinf=1.0, neginf=1.0), 0.3, 1.0)
        out = out - band_sig + band_sig * gain
    bad = ~np.isfinite(out)
    if np.any(bad):
        out = np.where(bad, orig, out)
    out = np.clip(out, -1.0, 1.0).astype(np.float32)
    return out if np.ndim(x) == 2 else out[0]


# --- loudness (BS.1770; mirrors amw_tpu.ops.meters semantics) --------------

def k_weight(x, sr):
    from ..ops.design import k_weighting_ba
    y = np.atleast_2d(np.asarray(x, np.float64))
    for b, a in k_weighting_ba(sr):
        y = sg.lfilter(b, a, y, axis=-1)
    return y


def integrated_lufs(x, sr):
    from ..ops.meters import plan_blocks
    x2 = np.atleast_2d(np.asarray(x, np.float64))
    y = k_weight(x2, sr)
    plan = plan_blocks(sr, x2.shape[-1])
    C = x2.shape[0]
    g = np.array([1.0, 1.0, 1.0, 1.41, 1.41][:C] if C <= 5 else [1.0] * C)
    z = np.zeros((C, plan.n_blocks))
    for j in range(plan.n_blocks):
        seg = y[:, plan.l_idx[j]:plan.u_idx[j]]
        z[:, j] = np.sum(seg * seg, axis=-1) / plan.div
    l_j = -0.691 + 10.0 * np.log10(np.maximum(g @ z, 1e-30))
    m1 = l_j > -70.0
    if not m1.any():
        return float("-inf")
    z1 = z[:, m1].mean(axis=1)
    gamma_r = -0.691 + 10.0 * np.log10(max(float(g @ z1), 1e-30)) - 10.0
    m2 = m1 & (l_j > gamma_r)
    if not m2.any():
        return float("-inf")
    z2 = z[:, m2].mean(axis=1)
    return float(-0.691 + 10.0 * np.log10(max(float(g @ z2), 1e-30)))


def normalize_lufs(x, sr, target_lufs):
    loud = integrated_lufs(x, sr)
    if not np.isfinite(loud):
        return x
    delta = float(np.clip(target_lufs - loud, -20.0, 20.0))
    return (x * db(delta)).astype(np.float32)


def timeline_lufs(x, sr, block_sec=0.4, max_points=300):
    from ..ops.meters import segment_starts
    x2 = np.atleast_2d(np.asarray(x, np.float64))
    y = k_weight(x2, sr)
    starts = segment_starts(x2.shape[-1], sr, block_sec, max_points)
    C = x2.shape[0]
    g = np.array([1.0, 1.0, 1.0, 1.41, 1.41][:C] if C <= 5 else [1.0] * C)
    B = int(sr * block_sec)
    vals = []
    for s in starts:
        seg = y[:, s:s + B]
        z = np.sum(seg * seg, axis=-1) / B
        l = -0.691 + 10.0 * np.log10(max(float(g @ z), 1e-30))
        vals.append(l if l > -70.0 else -1e9)
    return np.asarray(vals)


def true_peak_dbfs(x, sr):
    ups = sg.resample_poly(np.atleast_2d(np.asarray(x, np.float64)), 4, 1, axis=-1)
    return float(20 * np.log10(max(float(np.max(np.abs(ups))), 1e-12)))


# --- exciter / imager (pipeline.py:1179-1197,1267-1398) --------------------

def exciter_saturate(x, mode, k=2.0):
    x = np.clip(x, -1.0, 1.0)
    if mode == "transistor":
        return x - (x ** 3) / 3.0
    if mode == "tape":
        return np.tanh(k * x) / (k + 1e-8)
    if mode == "tube":
        return x + 0.3 * (x ** 2)
    if mode == "warm":
        return 0.5 * (np.tanh(k * x) / (k + 1e-8) + x + 0.3 * (x ** 2))
    if mode == "digital":
        return np.where(np.abs(x) <= 1.0, x, np.sign(x) * (2.0 - np.abs(x)))
    return np.tanh(k * x) / (k + 1e-8)


def harmonic_exciter(x, sr, exciter_db=0.0, mode="warm", oversample=1):
    if abs(exciter_db) < 0.05:
        return x
    x2 = np.atleast_2d(x)
    n = x2.shape[-1]
    os_f = max(1, min(4, int(oversample)))
    work = x2 if os_f == 1 else np.stack(
        [sg.resample(ch.astype(np.float64), n * os_f) for ch in x2]).astype(np.float32)
    work_sr = sr * os_f
    b, a = sg.butter(2, min(6000.0 / (work_sr / 2.0), 0.97), btype="high")
    gain = db(exciter_db) - 1.0
    mode = mode if mode in ("warm", "tape", "tube", "transistor", "digital") else "warm"
    k = 2.5 if mode == "warm" else 2.0
    hf = safe_filtfilt(b, a, work)
    out = work + (exciter_saturate(hf, mode, k) - hf) * gain * 0.25
    if os_f > 1:
        out = np.stack([sg.resample(ch.astype(np.float64), n) for ch in out]).astype(np.float32)
    out = out.astype(np.float32)
    return out if np.ndim(x) == 2 else out[0]


def _width_ms(left, right, width):
    mid = (left + right) * 0.5
    side = (left - right) * 0.5 * width
    return np.clip(mid + side, -1, 1), np.clip(mid - side, -1, 1)


def stereo_imager(x, width=1.0, stereoize_delay_ms=0.0, stereoize_mix=0.12,
                  sr=None, band_widths=None, crossovers_hz=None):
    if x.ndim != 2 or x.shape[0] != 2:
        return x
    left, right = x[0].astype(np.float32), x[1].astype(np.float32)
    if band_widths is not None and len(band_widths) == 4 and sr:
        cross = tuple(float(c) for c in crossovers_hz) if crossovers_hz and len(crossovers_hz) == 3 \
            else MULTIBAND_CROSSOVERS_HZ
        cross = tuple(np.clip(c, 20.0, 20000.0) for c in cross)
        if cross[0] >= cross[1] or cross[1] >= cross[2]:
            cross = MULTIBAND_CROSSOVERS_HZ
        bands = split_bands(np.stack([left, right]), sr, cross)
        out_l = np.zeros_like(left)
        out_r = np.zeros_like(right)
        for i in range(4):
            ol, orr = _width_ms(bands[i][0], bands[i][1], float(band_widths[i]))
            out_l += ol
            out_r += orr
        out_l, out_r = np.clip(out_l, -1, 1), np.clip(out_r, -1, 1)
    else:
        out_l, out_r = _width_ms(left, right, width)
    if stereoize_delay_ms > 0 and sr and stereoize_mix > 0:
        delay_n = max(0, min(int(sr * stereoize_delay_ms / 1000.0), x.shape[-1] - 1))
        mix = min(0.35, max(0.0, float(stereoize_mix)))
        if delay_n > 0:
            dr = np.concatenate([np.zeros(delay_n, np.float32), out_r[:-delay_n]])
            dl = np.concatenate([np.zeros(delay_n, np.float32), out_l[:-delay_n]])
            out_l = np.clip(out_l + mix * dr, -1, 1)
            out_r = np.clip(out_r + mix * dl, -1, 1)
    return np.stack([out_l, out_r]).astype(np.float32)


# --- spectral (pipeline.py:1472-1612) --------------------------------------

def spectral_denoise(x, sr, strength=0.5, noise_percentile=15.0):
    strength = float(np.clip(strength, 0.0, 1.0))
    if strength < 0.01:
        return x
    x2 = np.atleast_2d(x)
    n = x2.shape[-1]
    out = np.zeros_like(x2, dtype=np.float32)
    for c, ch in enumerate(x2):
        _, _, Z = sg.stft(ch.astype(np.float64), fs=sr, nperseg=2048,
                          noverlap=2048 - 512, window="hann")
        mag = np.abs(Z)
        noise = np.percentile(mag, noise_percentile, axis=1, keepdims=True)
        noise = np.maximum(noise, 1e-12)
        noise = np.minimum(noise, 0.85 * np.maximum(np.median(mag, axis=1, keepdims=True), 1e-12))
        gain = np.clip(1.0 - strength * (noise / (mag + 1e-10)) ** 2, 0.25, 1.0)
        _, rec = sg.istft(Z * gain, fs=sr, nperseg=2048, noverlap=2048 - 512, window="hann")
        rec = rec[:n] if len(rec) >= n else np.pad(rec, (0, n - len(rec)))
        out[c] = np.clip(rec, -1.0, 1.0)
    return out if np.ndim(x) == 2 else out[0]


def spectral_envelope(x, sr, n_fft=8192):
    mono = np.mean(np.atleast_2d(x), axis=0).astype(np.float32)
    hop = n_fft // 4
    window = np.hanning(n_fft).astype(np.float32)
    count = (len(mono) - n_fft) // hop + 1
    if count <= 0:
        return np.ones(n_fft // 2 + 1, np.float32)
    acc = np.zeros(n_fft // 2 + 1)
    for i in range(count):
        frame = mono[i * hop: i * hop + n_fft]
        acc += np.abs(np.fft.rfft(frame * window)) ** 2
    return np.sqrt(acc / count).astype(np.float32)


def reference_match(x, sr, ref_audio, ref_sr, strength=1.0, n_fft=8192):
    from scipy.signal import savgol_filter
    strength = float(np.clip(strength, 0.0, 1.0))
    if strength < 0.01:
        return x
    x2 = np.atleast_2d(x)
    if ref_sr != sr:
        ref_mono = np.mean(np.atleast_2d(ref_audio), axis=0)
        ref_audio = sg.resample(ref_mono.astype(np.float64),
                                int(len(ref_mono) * sr / ref_sr)).astype(np.float32)
    src_env = spectral_envelope(x2, sr, n_fft)
    ref_env = spectral_envelope(ref_audio, sr, n_fft)
    eps = 1e-8
    ratio = (ref_env.astype(np.float64) + eps) / (src_env.astype(np.float64) + eps)
    win = min(51, (len(ratio) // 4) * 2 + 1)
    win = max(5, win if win % 2 == 1 else win + 1)
    ratio = np.clip(savgol_filter(ratio, win, 3), 0.1, 10.0)
    ratio = np.clip(1.0 + (ratio - 1.0) * strength, 0.1, 10.0)
    n_bins = n_fft // 2 + 1
    H = np.zeros(n_fft, np.complex128)
    H[:n_bins] = ratio
    H[n_bins:] = ratio[1:n_fft // 2][::-1]
    ir = (np.fft.ifft(H).real * np.hanning(n_fft)).astype(np.float32)
    out = np.stack([sg.fftconvolve(ch.astype(np.float64), ir.astype(np.float64), mode="same")
                    for ch in x2])
    out = np.clip(out, -1.0, 1.0).astype(np.float32)
    return out if np.ndim(x) == 2 else out[0]


def resample_fft(x, sr, target_sr):
    if target_sr == sr:
        return np.asarray(x, np.float32)
    x2 = np.atleast_2d(np.asarray(x, np.float64))
    n_out = int(round(x2.shape[-1] * target_sr / sr))
    out = np.stack([sg.resample(ch, n_out) for ch in x2]).astype(np.float32)
    return out if np.ndim(x) == 2 else out[0]


# --- reverb (pipeline.py:1056-1176) ----------------------------------------

def _comb(x, d, g):
    if d <= 0 or d >= len(x):
        return x
    a = np.zeros(d + 1)
    a[0], a[d] = 1.0, -g
    return sg.lfilter([1.0], a, x)


def _allpass(x, d, g):
    if d <= 0 or d >= len(x):
        return x
    b = np.zeros(d + 1)
    b[0], b[d] = -g, 1.0
    a = np.zeros(d + 1)
    a[0], a[d] = 1.0, -g
    return sg.lfilter(b, a, x)


def _reverb_mono(x, sr, reverb_type, decay_sec, mix):
    preset = REVERB_PRESETS.get(reverb_type, REVERB_PRESETS["plate"])
    decay = decay_sec if decay_sec > 0 else preset[0]
    comb_d, comb_g, ap_d, ap_g = preset[1], preset[2], preset[3], preset[4]
    decay_per_sec = 0.001 ** (1.0 / max(0.1, decay))
    n = len(x)
    x = np.asarray(x, np.float64)
    wet = np.zeros(n)
    for d_ms, g in zip(comb_d, comb_g):
        d = min(int(sr * d_ms / 1000.0), n - 1)
        if d < 1:
            continue
        wet += _comb(x, d, g * (decay_per_sec ** (d_ms / 1000.0)))
    wet /= max(len(comb_d), 1)
    for d_ms, g in zip(ap_d, ap_g):
        d = min(int(sr * d_ms / 1000.0), n - 1)
        if d < 1:
            continue
        wet = _allpass(wet, d, g)
    peak = np.max(np.abs(wet)) if n else 0.0
    if peak > 1e-6:
        wet = wet / min(peak, 2.0)
    return (x * (1.0 - mix) + wet * mix).astype(np.float32)


def reverb(x, sr, reverb_type="plate", decay_sec=1.2, mix=0.15,
           mix_mid=None, mix_side=None):
    x2 = np.atleast_2d(x)
    if x2.shape[0] == 2 and (mix_mid is not None or mix_side is not None):
        mid = ((x2[0] + x2[1]) * 0.5).astype(np.float64)
        side = ((x2[0] - x2[1]) * 0.5).astype(np.float64)
        m_mid = float(np.clip(mix_mid if mix_mid is not None else mix, 0.0, 1.0))
        m_side = float(np.clip(mix_side if mix_side is not None else mix, 0.0, 1.0))
        mo = _reverb_mono(mid, sr, reverb_type, decay_sec, m_mid)
        so = _reverb_mono(side, sr, reverb_type, decay_sec, m_side)
        return np.stack([np.clip(mo + so, -1, 1), np.clip(mo - so, -1, 1)]).astype(np.float32)
    out = np.stack([_reverb_mono(ch.astype(np.float64), sr, reverb_type, decay_sec, mix)
                    for ch in x2])
    out = np.clip(out, -1.0, 1.0).astype(np.float32)
    return out if np.ndim(x) == 2 else out[0]


# --- dither / quantization (pipeline.py:830-899) ---------------------------

def dither_tpdf(shape, rng):
    return (rng.random(shape) + rng.random(shape) - 1.0).astype(np.float32)


def dither_ns_e(shape, rng):
    white = (2.0 * rng.random(shape) - 1.0).astype(np.float32)
    out = sg.lfilter([1.0, -1.0], [1.0, -0.99], white, axis=-1)
    return (out * 0.9).astype(np.float32)


def dither_ns_itu(shape, rng):
    white = (2.0 * rng.random(shape) - 1.0).astype(np.float32)
    out = sg.lfilter([1.0, -2.0, 1.0], [1.0, -1.96, 0.9604], white, axis=-1)
    return (out * 0.9).astype(np.float32)


def quantize16(x, noise):
    x = np.nan_to_num(np.asarray(x, np.float64), nan=0.0, posinf=1.0, neginf=-1.0)
    x = np.clip(x, -1.0, 1.0)
    d = np.nan_to_num(x * 32767.0 + noise, nan=0.0, posinf=32767.0, neginf=-32768.0)
    return np.clip(np.round(d), -32768, 32767).astype(np.int16)


# --- v1 fixed pipeline (pipeline.py:1800-1909) -----------------------------

def v1_pipeline(x, sr, target_lufs=-14.0, style="standard", denoise_strength=0.0,
                transient_attack=1.0, transient_sustain=1.0,
                reference_audio=None, reference_sr=None, reference_strength=0.8):
    cfg = STYLE_CONFIGS.get(style, STYLE_CONFIGS["standard"])
    a = remove_dc_offset(np.atleast_2d(np.asarray(x, np.float32)))
    a = remove_intersample_peaks(a, 0.5)
    if denoise_strength > 0.01:
        a = spectral_denoise(a, sr, strength=denoise_strength)
    a = target_curve(a, sr)
    a = deesser(a, sr)
    a = dynamics(a, sr)
    if cfg.get("parallel_mix", 0.0) > 0.01:
        a = parallel_compression(a, sr, mix=cfg["parallel_mix"])
    a = normalize_lufs(a, sr, target_lufs)
    a = final_spectral_balance(a, sr)
    if reference_audio is not None and reference_sr is not None:
        a = reference_match(a, sr, reference_audio, reference_sr, strength=reference_strength)
    a = style_eq(a, sr, style)
    if abs(transient_attack - 1.0) > 0.02 or abs(transient_sustain - 1.0) > 0.02:
        a = transient_designer(a, sr, transient_attack, transient_sustain)
    if cfg.get("exciter_db", 0.0) > 0.05:
        a = harmonic_exciter(a, sr, cfg["exciter_db"])
    if abs(cfg.get("imager_width", 1.0) - 1.0) > 0.01:
        a = stereo_imager(a, cfg["imager_width"])
    a = remove_intersample_peaks(a, 0.5)
    a = output_edge_fade_in(a, sr, 6.0)
    a = np.clip(a, -1.0, 1.0).astype(np.float32)
    return np.nan_to_num(a, nan=0.0, posinf=1.0, neginf=-1.0)
