"""Config-driven mastering chain → one fused jitted XLA graph.

The reference's v2 chain runtime (backend/app/chain.py) interprets a JSON
config into a list of module objects and runs them sequentially on CPU.
Here the same config *compiles*: each module id maps to an op builder that
returns ``(params, fn)``; the compiler threads the audio through all enabled
modules inside a single ``jax.jit`` graph, with per-module ``amount``
dry/wet blending resolved at trace time (base.py:33-50 semantics) and the
final clip/NaN-scrub of chain.py:93-94.

Unlike the reference, module failure→bypass (base.py:40-43) is a *build-time*
validation concern: builders raise at build if a config is unusable, and the
compiler bypasses that module (recorded in ``CompiledChain.bypassed``) —
traced graphs cannot throw per-sample.

Compiled chains are cached by (spec, canonical config) — recompilation only
happens per new shape bucket or config shape.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax

from ..constants import STYLE_CONFIGS
from ..ops import basic, meters
from ..ops.bands import build_dynamics
from ..ops.dynamics import build_maximizer_transient_aware
from ..ops import eq
from ..ops import fused as ops_fused
from ..ops.eq import (
    build_final_spectral_balance,
    build_style_eq,
    build_target_curve,
)
from ..ops.exciter import build_harmonic_exciter
from ..ops.reverb import build_reverb
from ..ops.stereo import build_stereo_imager
from ..spec import GraphSpec


def _b_dc(spec, cfg):
    return [], lambda x, p: basic.remove_dc_offset(x)


def _b_peak_guard(spec, cfg):
    headroom = float(cfg.get("headroom_db", 0.5))
    return [], lambda x, p: basic.remove_intersample_peaks(x, headroom)


def _b_target_curve(spec, cfg):
    return build_target_curve(
        spec,
        phase_mode=str(cfg.get("phase_mode", "minimum")),
        eq_ms=bool(cfg.get("eq_ms", False)),
    )


def _b_dynamics(spec, cfg):
    return build_dynamics(
        spec,
        knee_db=float(cfg.get("knee_db", 6.0)),
        crossovers_hz=cfg.get("crossovers_hz"),
        band_ratios=cfg.get("band_ratios"),
        max_upward_boost_db=float(cfg.get("max_upward_boost_db", 12.0)),
        compressor=str(cfg.get("compressor", "soft_knee")),
    )


def _b_maximizer(spec, cfg):
    return build_maximizer_transient_aware(
        spec, sensitivity=float(cfg.get("sensitivity", 0.5))
    )


def _b_normalize(spec, cfg):
    return meters.build_normalize_lufs(
        spec, target_lufs=float(cfg.get("target_lufs", -14.0))
    )


def _b_final_balance(spec, cfg):
    return build_final_spectral_balance(spec)


def _b_style_eq(spec, cfg):
    return build_style_eq(spec, style=str(cfg.get("style", "standard")))


def _b_exciter(spec, cfg):
    return build_harmonic_exciter(
        spec,
        exciter_db=float(cfg.get("exciter_db", 0.0)),
        mode=str(cfg.get("mode", "warm")),
        oversample=int(cfg.get("oversample", 1)),
    )


def _b_imager(spec, cfg):
    return build_stereo_imager(
        spec,
        width=float(cfg.get("width", 1.0)),
        stereoize_delay_ms=float(cfg.get("stereoize_delay_ms", 0.0)),
        stereoize_mix=float(cfg.get("stereoize_mix", 0.12)),
        band_widths=cfg.get("band_widths"),
        crossovers_hz=cfg.get("crossovers_hz"),
    )


def _b_reverb(spec, cfg):
    return build_reverb(
        spec,
        reverb_type=str(cfg.get("reverb_type", "plate")),
        decay_sec=float(cfg.get("decay_sec", 1.2)),
        mix=float(cfg.get("mix", 0.15)),
        mix_mid=cfg.get("mix_mid"),
        mix_side=cfg.get("mix_side"),
    )


def _b_true_peak(spec, cfg):
    from ..ops.tplimit import build_true_peak_limiter

    return build_true_peak_limiter(
        spec,
        ceiling_db=float(cfg.get("ceiling_db", -1.5)),
        lookahead_ms=float(cfg.get("lookahead_ms", 1.5)),
    )


MODULE_BUILDERS: dict[str, Callable] = {
    "dc_offset": _b_dc,
    "peak_guard": _b_peak_guard,
    "target_curve": _b_target_curve,
    "dynamics": _b_dynamics,
    "maximizer": _b_maximizer,
    "normalize_lufs": _b_normalize,
    "final_spectral_balance": _b_final_balance,
    "style_eq": _b_style_eq,
    "exciter": _b_exciter,
    "imager": _b_imager,
    "reverb": _b_reverb,
    # Optional 4x-oversampled true-peak limiter (ops/tplimit.py): enforces
    # a real dBTP ceiling where the reference only brickwalls sample peaks
    # (pipeline.py:89) and measures TP in the analyzer (tools.py:44-53).
    "true_peak_limiter": _b_true_peak,
}


def default_chain_config(target_lufs: float = -14.0, style: str = "standard") -> dict:
    """Default v2 chain config — mirrors chain.py:101-125 verbatim, including
    the 2230 Hz crossover drift."""
    cfg = STYLE_CONFIGS.get(style, STYLE_CONFIGS["standard"])
    exciter_db = cfg.get("exciter_db", 0.0)
    imager_width = cfg.get("imager_width", 1.0)
    return {
        "modules": [
            {"id": "dc_offset", "enabled": True, "amount": 1.0},
            {"id": "peak_guard", "enabled": True, "headroom_db": 0.5, "amount": 1.0},
            {"id": "target_curve", "enabled": True, "phase_mode": "minimum", "eq_ms": False, "amount": 1.0},
            {"id": "dynamics", "enabled": True, "knee_db": 6.0, "crossovers_hz": [214.0, 2230.0, 10000.0], "amount": 1.0},
            {"id": "normalize_lufs", "enabled": True, "target_lufs": target_lufs, "amount": 1.0},
            {"id": "final_spectral_balance", "enabled": True, "amount": 1.0},
            {"id": "style_eq", "enabled": True, "style": style, "amount": 1.0},
            {"id": "exciter", "enabled": abs(exciter_db) >= 0.05, "exciter_db": exciter_db, "mode": "warm", "oversample": 1, "amount": 1.0},
            {"id": "imager", "enabled": abs(imager_width - 1.0) >= 0.01, "width": imager_width, "stereoize_delay_ms": 0.0, "stereoize_mix": 0.12, "band_widths": None, "crossovers_hz": [214.0, 2230.0, 10000.0], "amount": 1.0},
            {"id": "reverb", "enabled": False, "reverb_type": "plate", "decay_sec": 1.2, "mix": 0.15, "mix_mid": None, "mix_side": None, "amount": 1.0},
            {"id": "peak_guard", "enabled": True, "headroom_db": 0.5, "amount": 1.0},
        ]
    }


@dataclass
class CompiledChain:
    spec: GraphSpec
    module_ids: list
    params: list = field(repr=False)   # per-module list of device arrays
    fn: Callable = field(repr=False)   # jitted (x, params) -> x
    raw_fn: Callable = field(repr=False, default=None)  # unjitted, for vmap/pjit
    bypassed: list = field(default_factory=list)

    def __call__(self, x):
        x = np.ascontiguousarray(x, np.float32)
        return np.asarray(self.fn(x, self.params))


_CHAIN_CACHE: dict = {}


def compile_chain(
    spec: GraphSpec,
    config: dict | None = None,
    *,
    target_lufs: float | None = None,
    style: str | None = None,
    jit: bool = True,
) -> CompiledChain:
    """Build and jit a chain from a v2-style config dict.

    ``target_lufs``/``style`` mirror the chain.process kwargs overrides
    (chain.py:86-90): they take precedence over per-module config values.
    """
    if config is None:
        config = default_chain_config(
            target_lufs if target_lufs is not None else -14.0,
            style if style is not None else "standard",
        )
    key = (spec, json.dumps(config, sort_keys=True, default=str),
           target_lufs, style, jit)
    cached = _CHAIN_CACHE.get(key)
    if cached is not None:
        return cached

    ids, params_all, fns, bypassed = build_chain_ops(
        spec, config, target_lufs=target_lufs, style=style
    )

    def chain_fn(x, params, n_valid=None):
        from ..ops import validctx

        with validctx.valid_length(n_valid):
            for f, p in zip(fns, params):
                # Keep the bucket padding silent between modules (no-op
                # without a valid-length context) — see ops.validctx.
                x = validctx.mask_tail(f(x, p))
        return basic.finalize_clip(x)

    fn = jax.jit(chain_fn) if jit else chain_fn
    params_dev = jax.device_put(params_all) if jit else params_all
    out = CompiledChain(spec=spec, module_ids=ids, params=params_dev,
                        fn=fn, raw_fn=chain_fn, bypassed=bypassed)
    _CHAIN_CACHE[key] = out
    return out


def _amount_blend(f, amount: float):
    def blended(x, p):
        return x * (1.0 - amount) + f(x, p) * amount

    return blended


def build_chain_ops(spec: GraphSpec, config: dict, *,
                    target_lufs: float | None = None, style: str | None = None):
    """Build the per-module op list for a config.  Returns
    (ids, params_list, fns, bypassed) — used by compile_chain and by the v2
    job graph (which wraps the chain with PRE/POST pro stages)."""
    fns, params_all, ids, bypassed = [], [], [], []
    modules = [dict(m) for m in config.get("modules", [])]
    skip_ids: set = set()

    def _is(idx2, mid2):
        return (0 <= idx2 < len(modules)
                and modules[idx2].get("id") == mid2
                and bool(modules[idx2].get("enabled", True))
                and float(modules[idx2].get("amount", 1.0)) >= 1.0)

    for idx, item in enumerate(modules):
        mid = item.pop("id", None)
        if not mid or mid not in MODULE_BUILDERS:
            continue
        if not bool(item.get("enabled", True)):
            continue
        if idx in skip_ids:
            continue
        full = float(item.get("amount", 1.0)) >= 1.0
        # Peephole fusions over adjacent linear(-up-to-a-scalar) modules —
        # each saves a forward FFT or a whole pair per track (ops.fused):
        #   normalize_lufs → final_spectral_balance [→ style_eq]
        #   final_spectral_balance → style_eq
        if mid == "dc_offset" and full and _is(idx + 1, "peak_guard"):
            headroom = float(modules[idx + 1].get("headroom_db", 0.5))
            skip_ids.add(idx + 1)
            fns.append(lambda x, p, _h=headroom:
                       basic.remove_dc_then_peak_guard(x, _h))
            params_all.append([])
            ids.append("dc_offset+peak_guard")
            continue
        if (mid == "target_curve" and full
                and str(item.get("phase_mode", "minimum")) == "minimum"
                and not bool(item.get("eq_ms", False))
                and _is(idx + 1, "dynamics")):
            dyn = modules[idx + 1]
            try:
                fused = ops_fused.build_target_then_dynamics(
                    spec,
                    knee_db=float(dyn.get("knee_db", 6.0)),
                    crossovers_hz=dyn.get("crossovers_hz"),
                    band_ratios=dyn.get("band_ratios"),
                    max_upward_boost_db=float(
                        dyn.get("max_upward_boost_db", 12.0)),
                    compressor=str(dyn.get("compressor", "soft_knee")),
                )
            except Exception:
                fused = None
            if fused is not None:
                skip_ids.add(idx + 1)
                fns.append(fused[1])
                params_all.append(list(fused[0]))
                ids.append("target_curve+dynamics")
                continue
        if (mid == "normalize_lufs" and full
                and _is(idx + 1, "final_spectral_balance")):
            with_style = _is(idx + 2, "style_eq")
            st = (style if style is not None
                  else modules[idx + 2].get("style", "standard")) \
                if with_style else None
            tgt = (target_lufs if target_lufs is not None
                   else float(item.get("target_lufs", -14.0)))
            try:
                fused = ops_fused.build_normalize_then_final(spec, tgt, st)
            except Exception:
                fused = None
            if fused is not None:
                p_nf, f_nf, nf_id = fused
                skip_ids.add(idx + 1)
                if with_style and nf_id.endswith("style_eq"):
                    skip_ids.add(idx + 2)
                fns.append(f_nf)
                params_all.append(list(p_nf))
                ids.append(nf_id)
                continue
        if (mid == "final_spectral_balance" and full
                and _is(idx + 1, "style_eq")):
            st = style if style is not None else modules[idx + 1].get(
                "style", "standard")
            try:
                fused = eq.build_final_balance_then_style(spec, st)
            except Exception:
                fused = None
            if fused is not None:
                skip_ids.add(idx + 1)
                fns.append(fused[1])
                params_all.append(list(fused[0]))
                ids.append("final_spectral_balance+style_eq")
                continue
        if target_lufs is not None and mid == "normalize_lufs":
            item["target_lufs"] = target_lufs
        if style is not None and mid == "style_eq":
            item["style"] = style
        amount = float(np.clip(float(item.get("amount", 1.0)), 0.0, 1.0))
        try:
            p, f = MODULE_BUILDERS[mid](spec, item)
        except Exception as exc:  # build-time bypass (reference: runtime bypass)
            bypassed.append((mid, repr(exc)))
            continue
        if amount < 1.0:
            f = _amount_blend(f, amount)
        fns.append(f)
        params_all.append(list(p))
        ids.append(mid)
    return ids, params_all, fns, bypassed
