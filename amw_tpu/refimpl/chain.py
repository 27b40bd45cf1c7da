"""Oracle v2 chain runner (mirrors backend/app/chain.py semantics)."""

from __future__ import annotations

import numpy as np

from . import pipeline as P


def _module_fn(mid: str, cfg: dict, sr: int, target_lufs=None, style=None):
    if mid == "dc_offset":
        return lambda x: P.remove_dc_offset(x)
    if mid == "peak_guard":
        h = float(cfg.get("headroom_db", 0.5))
        return lambda x: P.remove_intersample_peaks(x, h)
    if mid == "target_curve":
        return lambda x: P.target_curve(
            x, sr, phase_mode=str(cfg.get("phase_mode", "minimum")),
            eq_ms=bool(cfg.get("eq_ms", False)))
    if mid == "dynamics":
        return lambda x: P.dynamics(
            x, sr, knee_db=float(cfg.get("knee_db", 6.0)),
            crossovers_hz=cfg.get("crossovers_hz"),
            band_ratios=cfg.get("band_ratios"),
            max_upward_boost_db=float(cfg.get("max_upward_boost_db", 12.0)))
    if mid == "maximizer":
        return lambda x: P.maximizer_transient_aware(
            x, sr, float(cfg.get("sensitivity", 0.5)))
    if mid == "normalize_lufs":
        t = float(target_lufs if target_lufs is not None
                  else cfg.get("target_lufs", -14.0))
        return lambda x: P.normalize_lufs(x, sr, t)
    if mid == "final_spectral_balance":
        return lambda x: P.final_spectral_balance(x, sr)
    if mid == "style_eq":
        s = str(style if style is not None else cfg.get("style", "standard"))
        return lambda x: P.style_eq(x, sr, s)
    if mid == "exciter":
        return lambda x: P.harmonic_exciter(
            x, sr, float(cfg.get("exciter_db", 0.0)),
            str(cfg.get("mode", "warm")), int(cfg.get("oversample", 1)))
    if mid == "imager":
        return lambda x: P.stereo_imager(
            x, float(cfg.get("width", 1.0)),
            float(cfg.get("stereoize_delay_ms", 0.0)),
            float(cfg.get("stereoize_mix", 0.12)), sr,
            cfg.get("band_widths"), cfg.get("crossovers_hz"))
    if mid == "reverb":
        return lambda x: P.reverb(
            x, sr, str(cfg.get("reverb_type", "plate")),
            float(cfg.get("decay_sec", 1.2)), float(cfg.get("mix", 0.15)),
            cfg.get("mix_mid"), cfg.get("mix_side"))
    return None


def chain_process(x: np.ndarray, sr: int, config: dict, *,
                  target_lufs=None, style=None) -> np.ndarray:
    out = np.atleast_2d(np.asarray(x, np.float32))
    for item in config.get("modules", []):
        item = dict(item)
        mid = item.pop("id", None)
        if not mid or not bool(item.get("enabled", True)):
            continue
        fn = _module_fn(mid, item, sr, target_lufs, style)
        if fn is None:
            continue
        amount = float(np.clip(float(item.get("amount", 1.0)), 0.0, 1.0))
        try:
            processed = fn(out)
        except Exception:
            continue
        out = processed if amount >= 1.0 else (
            out * (1.0 - amount) + processed * amount).astype(np.float32)
    out = np.clip(out, -1.0, 1.0).astype(np.float32)
    return np.nan_to_num(out, nan=0.0, posinf=1.0, neginf=-1.0)
