"""The fixed v1 mastering pipeline as one fused graph.

Mirrors ``run_mastering_pipeline`` (backend/app/pipeline.py:1800-1909):
dc → peak guard → [denoise] → target curve → de-esser → dynamics(4-band +
maximizer + brickwall) → [parallel compression] → normalize LUFS → final
spectral balance → [reference match] → style EQ → [transient designer] →
[exciter] → [imager] → peak guard → fade-in → clip/scrub.
"""

from __future__ import annotations

import numpy as np
import jax

from ..constants import STYLE_CONFIGS
from ..ops import basic, meters
from ..ops.bands import build_dynamics
from ..ops.dynamics import build_deesser as _build_deesser_impl
from ..ops.dynamics import build_transient_designer
from ..ops.eq import (build_final_spectral_balance, build_style_eq,
                      build_target_curve)
from ..ops.fused import build_normalize_then_final, build_target_then_deesser
from ..ops.exciter import build_harmonic_exciter
from ..ops.spectral import build_reference_match, build_spectral_denoise
from ..ops.stereo import build_stereo_imager
from ..spec import GraphSpec


def build_v1_pipeline(
    spec: GraphSpec,
    target_lufs: float = -14.0,
    style: str = "standard",
    denoise_strength: float = 0.0,
    transient_attack: float = 1.0,
    transient_sustain: float = 1.0,
    reference_env: np.ndarray | None = None,
    reference_strength: float = 0.8,
    compressor: str = "soft_knee",
    jit: bool = True,
    stage_ticks: bool = False,
):
    """Returns ``(params, fn)``; ``fn(x, params)`` masters a [C, N] track."""
    cfg = STYLE_CONFIGS.get(style, STYLE_CONFIGS["standard"])
    exciter_db = cfg.get("exciter_db", 0.0)
    imager_width = cfg.get("imager_width", 1.0)
    parallel_mix = cfg.get("parallel_mix", 0.0)

    stages = []  # (name, params, fn)

    def add(name, built):
        stages.append((name, built[0], built[1]))

    # dc + input peak guard fused: one reduce + one elementwise pass
    # (ops/basic.remove_dc_then_peak_guard) instead of four full passes.
    add("dc_offset+peak_guard_in",
        ([], lambda x, p: basic.remove_dc_then_peak_guard(x, 0.5)))
    if denoise_strength > 0.01:
        add("spectral_denoise", build_spectral_denoise(spec, denoise_strength))
    fused_td = build_target_then_deesser(spec)
    if fused_td is not None:
        add("target_eq+deesser", fused_td)
    else:
        add("target_eq", build_target_curve(spec))
        add("deesser", _build_deesser_impl(spec))
    add("dynamics", build_dynamics(spec, compressor=compressor))
    if parallel_mix > 0.01:
        add("parallel_compress",
            ([], lambda x, p: basic.parallel_compression(x, mix=parallel_mix)))
    # normalize → final balance (→ style EQ) share one forward FFT; with a
    # reference-match stage in between, fuse only the first two.
    fused_nf = build_normalize_then_final(
        spec, target_lufs, style if reference_env is None else None)
    if fused_nf is not None:
        p_nf, f_nf, nf_id = fused_nf
        add(nf_id, (p_nf, f_nf))
        if reference_env is not None:
            add("reference_match",
                build_reference_match(spec, reference_env,
                                      strength=reference_strength))
            add("style_eq", build_style_eq(spec, style))
        elif "style_eq" not in nf_id:
            add("style_eq", build_style_eq(spec, style))
    else:
        add("normalize_lufs", meters.build_normalize_lufs(spec, target_lufs))
        add("final_spectral_balance", build_final_spectral_balance(spec))
        if reference_env is not None:
            add("reference_match",
                build_reference_match(spec, reference_env,
                                      strength=reference_strength))
        add("style_eq", build_style_eq(spec, style))
    if abs(transient_attack - 1.0) > 0.02 or abs(transient_sustain - 1.0) > 0.02:
        add("transient_designer",
            build_transient_designer(spec, transient_attack, transient_sustain))
    if exciter_db > 0.05:
        add("harmonic_exciter", build_harmonic_exciter(spec, exciter_db))
    if abs(imager_width - 1.0) > 0.01 and spec.channels == 2:
        add("stereo_imager", build_stereo_imager(spec, width=imager_width))
    add("peak_guard_out", ([], lambda x, p: basic.remove_intersample_peaks(x, 0.5)))
    add("output_fade_in", ([], lambda x, p: basic.output_edge_fade_in(x, spec.sr, 6.0)))

    names = [s[0] for s in stages]
    params = [list(s[1]) for s in stages]
    fns = [s[2] for s in stages]

    def fn(x, params, n_valid=None, prog_tok=None):
        from ..ops import validctx

        with validctx.valid_length(n_valid):
            for i, (f, p) in enumerate(zip(fns, params)):
                # Keep bucket padding silent between stages (no-op without
                # n_valid) — see ops.validctx.
                x = validctx.mask_tail(f(x, p))
                if stage_ticks and prog_tok is not None:
                    from ..runtime.progress import emit_stage_tick

                    jax.debug.callback(emit_stage_tick, prog_tok,
                                       np.int32(i), ordered=True)
        return basic.finalize_clip(x)

    fn.stage_fns = fns  # per-stage callables (stage-timing/diagnostics aid)
    if jit:
        jfn = jax.jit(fn)
        jfn.stage_fns = fns
        fn = jfn
    return params, fn, names


def master_v1(x: np.ndarray, sr: int, **kw) -> np.ndarray:
    """Convenience host entry: master one [C, N] (or [N]) track."""
    x2 = np.atleast_2d(np.asarray(x, np.float32))
    spec = GraphSpec(sr=sr, n=x2.shape[-1], channels=x2.shape[0])
    params, fn, _ = build_v1_pipeline(spec, **kw)
    out = np.asarray(fn(x2, jax.device_put(params)))
    return out if np.ndim(x) == 2 else out[0]
