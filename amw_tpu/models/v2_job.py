"""The full v2 mastering job as one fused graph: PRE pro-modules → chain →
POST pro-modules → fade-in, plus in-graph before/after loudness and the
validation stats.

Mirrors ``_run_mastering_job_v2`` (routers/mastering.py:443-637): PRE =
[rumble_filter] [spectral_denoise(preset|strength)] [de-esser]; POST =
[transient_designer] [parallel_compression] [dynamic_eq]; then the 6 ms
output fade-in.  Validation (``validate_mastered_not_silent``) and export
stay host-side.
"""

from __future__ import annotations

import numpy as np
import jax

from ..constants import DENOISE_PRESETS
from ..ops import basic, design, meters
from ..ops.dynamics import build_deesser, build_dynamic_eq, build_transient_designer
from ..ops.eq import build_rumble_filter
from ..ops.spectral import build_spectral_denoise
from ..spec import GraphSpec
from .chain import build_chain_ops, default_chain_config


def resolve_denoise(pro: dict) -> tuple[float, float]:
    """(strength, noise_percentile) per the reference's preset-else-strength
    resolution (mastering.py:503-513)."""
    preset = (pro.get("denoise_preset") or "").strip().lower()
    if preset in DENOISE_PRESETS:
        return DENOISE_PRESETS[preset]
    strength = float(pro.get("denoise_strength", 0) or 0)
    if strength > 0:
        return strength, float(pro.get("denoise_noise_percentile", 15.0))
    return 0.0, 15.0


def build_v2_job_graph(
    spec: GraphSpec,
    chain_config: dict | None,
    pro: dict | None = None,
    target_lufs: float = -14.0,
    style: str = "standard",
    jit: bool = True,
    stage_ticks: bool = False,
):
    """Returns (params, fn, stage_names); fn(x, params, n_valid, prog_tok) ->
    dict(out, before_lufs, after_lufs, peak, finite).

    ``stage_ticks``: emit a jax.debug.callback per completed stage keyed by
    the traced ``prog_tok`` (see runtime.progress) — real per-stage SSE
    progress on backends that support host callbacks."""
    pro = pro or {}
    stages = []

    def add(name, built):
        stages.append((name, list(built[0]), built[1]))

    if pro.get("rumble_enabled"):
        add("rumble_filter",
            build_rumble_filter(spec, float(pro.get("rumble_cutoff", 80.0))))
    strength, noise_pct = resolve_denoise(pro)
    if strength > 0.01:
        add("spectral_denoise", build_spectral_denoise(spec, strength, noise_pct))
    if pro.get("deesser_enabled"):
        add("deesser", build_deesser(
            spec,
            threshold_db=float(pro.get("deesser_threshold", -6.0)),
            freq_hi=float(pro.get("deesser_freq_hi", 9000.0)),
        ))

    if chain_config:
        config = chain_config
    else:
        config = default_chain_config(target_lufs=target_lufs, style=style)
    ids, chain_params, chain_fns, bypassed = build_chain_ops(
        spec, config, target_lufs=target_lufs, style=style
    )
    for mid, p, f in zip(ids, chain_params, chain_fns):
        stages.append((f"chain:{mid}", p, f))
    # chain.process final clip/NaN-scrub (chain.py:93-94)
    add("chain_finalize", ([], lambda x, p: basic.finalize_clip(x)))

    ta = pro.get("transient_attack")
    ts = pro.get("transient_sustain", 1.0)
    if ta is not None and (abs(float(ta) - 1.0) > 0.02 or abs(float(ts) - 1.0) > 0.02):
        add("transient_designer",
            build_transient_designer(spec, float(ta), float(ts)))
    pmix = pro.get("parallel_mix", 0)
    if pmix is not None and float(pmix) > 0:
        add("parallel_compression",
            ([], lambda x, p, _m=float(pmix): basic.parallel_compression(x, mix=_m)))
    if pro.get("dynamic_eq_enabled"):
        add("dynamic_eq", build_dynamic_eq(spec))
    if pro.get("true_peak_enabled"):
        # Optional 4x-oversampled true-peak ceiling (ops/tplimit.py) — last
        # gain stage before the fade, so nothing after it can re-raise TP.
        from ..ops.tplimit import build_true_peak_limiter

        add("true_peak_limiter", build_true_peak_limiter(
            spec, ceiling_db=float(pro.get("true_peak_ceiling_db", -1.5))))
    add("output_fade_in", ([], lambda x, p: basic.output_edge_fade_in(x, spec.sr, 6.0)))

    # In-graph loudness meter (before/after).
    settle = meters.k_weight_settle(spec.sr)
    nfft = design.next_fft_size(spec.n + settle)
    Hk = meters.k_weight_response(spec.sr, nfft)
    try:
        plan = meters.plan_blocks(spec.sr, spec.n)
    except ValueError:
        plan = None

    names = [s[0] for s in stages]
    params = [s[1] for s in stages] + [[Hk]]
    fns = [s[2] for s in stages]

    def fn(x, params, n_valid=None, prog_tok=None):
        from ..ops import validctx

        before = (meters.integrated_lufs(x, params[-1][0], nfft, plan,
                                         n_valid=n_valid)
                  if plan is not None else np.float32(-1e9))
        with validctx.valid_length(n_valid):
            y = x
            for i, (f, p) in enumerate(zip(fns, params[:-1])):
                # Per-stage tail mask keeps the bucket padding silent, which
                # is what makes causal/pointwise ops padding-invariant (see
                # ops.validctx); no-op when n_valid is None.
                y = validctx.mask_tail(f(y, p))
                if stage_ticks and prog_tok is not None:
                    from ..runtime.progress import emit_stage_tick

                    jax.debug.callback(emit_stage_tick, prog_tok,
                                       np.int32(i), ordered=True)
        after = (meters.integrated_lufs(y, params[-1][0], nfft, plan,
                                        n_valid=n_valid)
                 if plan is not None else np.float32(-1e9))
        finite, peak = basic.validate_stats(y)
        return {"out": y, "before_lufs": before, "after_lufs": after,
                "peak": peak, "finite": finite}

    if jit:
        fn = jax.jit(fn)
    return params, fn, names
