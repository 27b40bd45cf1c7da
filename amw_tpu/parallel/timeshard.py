"""Sequence-parallel mastering: one long track sharded over the mesh by TIME.

The audio analog of context parallelism (SURVEY §5.7): a DJ-set-length track
(up to 800 MB WAV) is split into per-device chunks processed under
``shard_map``.  Each device extends its chunk with halo regions exchanged
from its neighbors via ``ppermute`` (halo ≥ the largest filter settle /
envelope warm-up), runs local ops on the extended chunk — whose interior is
then exact — and keeps its chunk of the result.  Ops that need global state
use collectives:

- DC offset: global mean via ``psum``.
- Peak guard: global |max| via ``pmax``.
- BS.1770 normalize: per-shard gating-block energies; the two-stage gate's
  global statistics (absolute-gated energy sum/count, relative threshold,
  second gate) via ``psum`` — bit-equivalent to the full-track meter.
- Output fade-in: position-aware via ``axis_index``.
- Spectral denoise: the global per-bin noise percentile is estimated from a
  ``psum``-merged log-magnitude histogram (the only approximate stage — the
  exact percentile would need an all-gather of every STFT frame).

  Worst-case error bound (round-5 item 8): the merged histogram is the
  EXACT global histogram (per-device counts psum to the full-track
  counts), so the approximation does not grow with device count or track
  length — the only error sources are (a) the quantile's bin resolution,
  140 dB / 256 bins ≈ 0.55 dB of noise-profile error, and (b) the
  per-chunk STFT frame grid, whose frames near shard boundaries differ
  from the single-chip grid (local, confined to ±nperseg of each
  boundary).  Through the Wiener gain g = clip(1 − s·(noise/|X|)², 0.25,
  1), a ±0.55 dB profile error moves g by ≤ 0.14·s·(noise/|X|)² ≤ 0.14·s
  per STFT cell — concentrated in near-noise-floor cells, i.e. ≲ −17 dB
  relative to those cells' (already quiet) magnitude at s = 1.
  tests/test_timeshard.py::test_sp_denoise_approximate sweeps device
  counts 2–8 and several (non-chunk-aligned) track lengths with an
  explicit ≤ −22 dBFS full-output gate vs the exact single-chip denoiser,
  and test_sp_denoise_histogram_vs_exact_denoiser isolates the histogram
  term alone at ≤ −34 dBFS.

Surface parity with the engine: ``sp_master`` accepts the same v2
``(config, pro)`` pair as ``MasteringEngine.master_v2_bytes`` — PRE
[rumble] [denoise] [deesser], any module list the chain compiler accepts
(amount blend included), POST [transient designer] [parallel compression]
[dynamic EQ] — plus the v1 fixed pipeline via ``style=``-only calls.
Reverb is supported when its wet IR fits in the halo (longer decays are
rejected at build).

Track-edge semantics: every local stage is compiled in window variants —
interior (halo-extended chunk), left-edge (window anchored at the track
start) and right-edge (window ending exactly at the track end) — selected
per device with ``lax.switch`` on ``axis_index``.  The edge windows reuse
the single-chip builders' own scipy-exact odd-extension / steady-state
edge machinery, so the FULL track (edges included) matches the
single-chip graph to ≤ −90 dBFS (tests/test_timeshard.py); the window's
far edge sits ≥ halo away from any kept sample, burying its misplaced
transient below the filter settle tolerance.  When the last chunk's valid
length is shorter than the halo (tracks barely longer than ``n_dev``
chunks), the second-to-last shard's right context would cross the track
end — that shard then runs a FOURTH variant whose window also ends
exactly at the track end, keeping the full track exact; with only two
shards no such window exists (it would be the whole track) and the
builder rejects, routing the job to the single-device path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import DENOISE_PRESETS, STYLE_CONFIGS
from ..models.chain import MODULE_BUILDERS, default_chain_config
from ..models.v2_job import resolve_denoise
from ..ops import basic, design, meters
from ..ops.dynamics import (build_deesser, build_dynamic_eq,
                            build_transient_designer)
from ..ops.eq import build_rumble_filter
from ..spec import GraphSpec

DEFAULT_HALO = 1 << 17  # 131072: covers filter settles and envelope warm-ups

# Module ids handled by collectives inside the shard function rather than by
# a local op on the extended chunk.
_GLOBAL_IDS = {"dc_offset", "peak_guard", "normalize_lufs"}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _amount(f, a: float):
    if a >= 1.0:
        return f
    return lambda x, p: x * (1.0 - a) + f(x, p) * a


def _build_denoise_sp(spec_ext: GraphSpec, strength: float,
                      noise_percentile: float, axis: str):
    """Distributed STFT Wiener denoiser: local frames, global noise profile
    via a psum'd per-bin log-magnitude histogram (percentile approximated to
    the histogram resolution, ~0.35 dB)."""
    from ..ops.spectral import istft, stft

    strength = float(np.clip(strength, 0.0, 1.0))
    nbins_h = 256
    lo, hi = -120.0, 20.0  # dB range of STFT magnitudes
    edges = np.linspace(lo, hi, nbins_h + 1).astype(np.float32)

    def fn(ext, params):
        Z = stft(ext)                     # [C, T, F]
        mag = jnp.abs(Z)
        mdb = 20.0 * jnp.log10(jnp.maximum(mag, 1e-12))
        # Per-(channel, bin) histogram over local frames, merged across
        # devices — per-channel profiles match the exact single-chip
        # denoiser's percentile semantics (spectral.build_spectral_denoise
        # takes the percentile per channel, not pooled).
        binned = jnp.clip(((mdb - lo) / (hi - lo) * nbins_h).astype(jnp.int32),
                          0, nbins_h - 1)
        C, _T, F = mag.shape
        # Scatter-add into [C * F * H] segments instead of materializing a
        # [C, T, F, H] one-hot — at DJ-set chunk lengths (T ~ 50k frames)
        # the one-hot intermediate would be ~100 GB if XLA failed to fuse it
        # into the reduction.  The segment-sum working set is just the
        # flattened frame indices.
        ch_idx = jnp.arange(C)[:, None, None]
        freq_idx = jnp.arange(F)[None, None, :]
        seg = ((ch_idx * F + freq_idx) * nbins_h + binned).reshape(-1)
        hist = jax.ops.segment_sum(
            jnp.ones(seg.shape, jnp.float32), seg,
            num_segments=C * F * nbins_h).reshape(C, F, nbins_h)
        hist = jax.lax.psum(hist, axis)
        total = hist.sum(axis=-1, keepdims=True)
        cum = jnp.cumsum(hist, axis=-1)

        def quant(q):
            target = q / 100.0 * total
            idx = (cum < target).sum(axis=-1)
            idx = jnp.clip(idx, 0, nbins_h - 1)
            return 10.0 ** (jnp.asarray(edges)[idx] / 20.0)  # [C, F]

        noise = jnp.maximum(quant(noise_percentile), 1e-12)
        med = jnp.maximum(quant(50.0), 1e-12)
        noise = jnp.minimum(noise, 0.85 * med)
        gain = 1.0 - strength * (noise[:, None, :] / (mag + 1e-10)) ** 2
        gain = jnp.clip(gain, 0.25, 1.0)
        rec = istft(Z * gain, spec_ext.n)
        return jnp.clip(rec, -1.0, 1.0)

    return [], fn


def build_sp_master(
    sr: int,
    n_total: int,
    channels: int,
    mesh: Mesh,
    *,
    target_lufs: float = -14.0,
    style: str = "standard",
    chain_config: dict | None = None,
    pro: dict | None = None,
    halo: int = DEFAULT_HALO,
    batch: bool = False,
    stats: bool = False,
):
    """Compile a time-sharded mastering step with the engine's (config, pro)
    surface.

    Returns ``(fn, params, n_pad)``: ``fn(x[C, n_pad], params)`` is jitted
    with x sharded over the mesh's last ('sp') axis; pad input with zeros to
    ``n_pad`` and slice the output back to ``n_total``.

    ``stats=True`` makes ``fn`` return the engine's v2 result dict —
    ``{out, before_lufs, after_lufs, peak, finite}`` with the scalars
    computed in-graph via the same psum'd gated meter (serving needs them
    without a second full-track pass).
    """
    pro = dict(pro or {})
    axis = mesh.axis_names[-1]
    n_dev = mesh.shape[axis]
    if n_dev < 2:
        raise ValueError("sequence-parallel mastering needs >= 2 devices on "
                         "the sp axis (use the single-chip engine otherwise)")
    plan = meters.plan_blocks(sr, n_total)
    hop = plan.hop if plan.uniform else 1
    chunk = _round_up(_round_up(n_total, n_dev) // n_dev, max(hop, 256))
    n_pad = chunk * n_dev
    # A halo wider than the chunk would make the neighbor exchange
    # (x[..., -halo:]) shorter than declared and mis-slice downstream;
    # clamp — shorter halos only widen the shard-boundary error on tracks
    # short enough that sp mode is overkill anyway.
    halo = min(halo, chunk)
    n_ext = chunk + 2 * halo
    # Last chunk's valid length: the track end lands at sample ``lv`` of the
    # last shard (static — lengths are compile-time here).  Chunk rounding
    # (hop multiples) can push (n_dev-1)*chunk past a short track, leaving
    # the last shard with no valid samples — its right-edge window would
    # then have a non-positive length and the lax.switch branches would
    # disagree on shape.  Such tracks are too short to time-shard this
    # wide; reject with a clear error (the engine falls back to the
    # single-device path, and only routes long uploads here anyway).
    lv = n_total - (n_dev - 1) * chunk
    if lv <= 0:
        raise ValueError(
            f"track ({n_total} samples) too short for {n_dev}-way time "
            f"sharding (chunk {chunk}): last shard would hold no valid "
            f"samples — use fewer sp devices or the single-chip path")
    # lv < halo: the second-to-last shard's right context crosses the track
    # end, so its interior window would see zeros where the single-chip
    # graph sees the op's own exact track-end extension.  That shard gets a
    # fourth window variant ending exactly at the track end (below).  With
    # only two shards that window would span the whole track — no cheaper
    # than the single-chip graph — so reject and let the engine fall back.
    need_r2 = lv < halo
    if need_r2 and n_dev < 3:
        raise ValueError(
            f"track ({n_total} samples) too short for {n_dev}-way time "
            f"sharding (last chunk {lv} < halo {halo}): the exact track-end "
            f"window would cover the whole track — use the single-chip path")
    spec_ext = GraphSpec(sr=sr, n=n_ext, channels=channels, exact=False)
    # Track-edge windows: local ops are ALSO built at these lengths, whose
    # own (scipy-exact) edge machinery lands exactly on the track start /
    # track end — the first and last shards run these variants, so the
    # outer samples match the single-chip graph instead of seeing zero
    # history.  The window's far edge is >= halo away from any kept sample,
    # burying its (wrong-place) edge transient below the settle tolerance.
    spec_left = GraphSpec(sr=sr, n=chunk + halo, channels=channels, exact=True)
    spec_right = GraphSpec(sr=sr, n=halo + lv, channels=channels, exact=True)
    # Fourth variant (lv < halo only): the second-to-last shard's window —
    # left halo + own chunk + the last shard's lv valid samples — also ends
    # exactly at the track end, so the op's exact machinery produces the
    # true near-end samples instead of zero-history context.
    spec_right2 = (GraphSpec(sr=sr, n=halo + chunk + lv, channels=channels,
                             exact=True) if need_r2 else None)

    config = chain_config or default_chain_config(target_lufs=target_lufs,
                                                  style=style)

    # Stage plan: ("local", name, params3, fns3) run on the extended chunk
    # (edge shards via their exact windows); ("uniform", ...) for local
    # stages with internal collectives (the distributed denoiser) that every
    # device must execute identically; ("dc"|"peak"|"normalize", cfg)
    # handled with collectives.
    stages: list = []
    norm_targets: list[float] = []  # per-normalize-stage targets, in order

    def add_local(name, build, amount=1.0):
        """``build(spec) -> (params, fn)`` invoked for the interior window
        and both track-edge windows.  An edge variant that fails to build
        (e.g. a filter invalid at the short last-chunk window) falls back
        to the interior fn for that branch — zero-history edge semantics
        for that one stage rather than dropping the module entirely."""
        p, f = build(spec_ext)  # interior failure bypasses the module
        variants = {"i": (list(p), _amount(f, amount))}
        edge_specs = [("l", spec_left), ("r", spec_right)]
        if need_r2:
            edge_specs.append(("r2", spec_right2))
        for vkey, vspec in edge_specs:
            try:
                pv, fv = build(vspec)
                variants[vkey] = (list(pv), _amount(fv, amount))
            except Exception:  # noqa: BLE001 — per-branch fallback
                variants[vkey] = None
        stages.append(("local", name,
                       {k: (v[0] if v else []) for k, v in variants.items()},
                       {k: (v[1] if v else None)
                        for k, v in variants.items()}))

    def add_uniform(name, built, amount=1.0):
        p, f = built
        stages.append(("uniform", name, {"i": list(p)},
                       {"i": _amount(f, amount)}))

    # --- PRE pro modules (reference mastering.py:493-529) ---
    if pro.get("rumble_enabled"):
        add_local("rumble_filter", lambda s: build_rumble_filter(
            s, float(pro.get("rumble_cutoff", 80.0))))
    strength, noise_pct = resolve_denoise(pro)
    if strength > 0.01:
        add_uniform("spectral_denoise",
                    _build_denoise_sp(spec_ext, strength, noise_pct, axis))
    if pro.get("deesser_enabled"):
        add_local("deesser", lambda s: build_deesser(
            s,
            threshold_db=float(pro.get("deesser_threshold", -6.0)),
            freq_hi=float(pro.get("deesser_freq_hi", 9000.0))))

    # --- chain modules ---
    for item in [dict(m) for m in config.get("modules", [])]:
        mid = item.pop("id", None)
        if not mid or not bool(item.get("enabled", True)):
            continue
        amount = float(np.clip(float(item.get("amount", 1.0)), 0.0, 1.0))
        if mid == "dc_offset":
            stages.append(("dc", amount, None, None))
            continue
        if mid == "peak_guard":
            stages.append(("peak",
                           (float(item.get("headroom_db", 0.5)), amount),
                           None, None))
            continue
        if mid == "normalize_lufs":
            tgt = float(item.get("target_lufs", target_lufs))
            stages.append(("normalize", (len(norm_targets), amount),
                           None, None))
            norm_targets.append(tgt)
            continue
        if mid == "reverb":
            from ..ops.reverb import wet_ir

            decay = float(item.get("decay_sec", 1.2) or 1.2)
            ir = wet_ir(sr, n_ext, str(item.get("reverb_type", "plate")),
                        decay)
            if len(ir) > halo:
                raise ValueError(
                    f"reverb IR ({len(ir)} samples) exceeds the halo "
                    f"({halo}); raise halo= or disable reverb in SP mode")
        if mid == "style_eq" and style is not None:
            item.setdefault("style", style)
        builder = MODULE_BUILDERS.get(mid)
        if builder is None:
            continue
        try:
            add_local(f"chain:{mid}",
                      lambda s, _b=builder, _it=item: _b(s, _it), amount)
        except Exception:  # noqa: BLE001 — build-time bypass (chain.py policy)
            continue

    # --- POST pro modules (reference mastering.py:552-581) ---
    ta = pro.get("transient_attack")
    ts = pro.get("transient_sustain", 1.0)
    if ta is not None and (abs(float(ta) - 1.0) > 0.02
                           or abs(float(ts) - 1.0) > 0.02):
        add_local("transient_designer",
                  lambda s: build_transient_designer(s, float(ta), float(ts)))
    pmix = float(pro.get("parallel_mix", 0) or 0)
    if pmix > 0:
        add_local("parallel_compression",
                  lambda s: ([], lambda x, p, _m=pmix:
                             basic.parallel_compression(x, mix=_m)))
    if pro.get("dynamic_eq_enabled"):
        add_local("dynamic_eq", build_dynamic_eq)
    if pro.get("true_peak_enabled"):
        # Same ordering as the single-device graph (models/v2_job.py): the
        # 4x-oversampled TP ceiling is the last gain stage before the fade,
        # so nothing after it can re-raise the true peak.  Its smoothing
        # windows (~ms) sit far inside the halo, so the interior window is
        # exact; the edge windows reuse the op's own edge replication.
        from ..ops.tplimit import build_true_peak_limiter

        ceiling = float(pro.get("true_peak_ceiling_db", -1.5))
        add_local("true_peak_limiter",
                  lambda s: build_true_peak_limiter(s, ceiling_db=ceiling))

    # Normalize meter pieces (causal K-weighting on the extended chunk).
    settle_k = meters.k_weight_settle(sr)
    nfft_k = design.next_fft_size(n_ext + settle_k)
    Hk = meters.k_weight_response(sr, nfft_k)
    if not plan.uniform or chunk % plan.hop != 0:
        raise ValueError("sequence-parallel meter needs a uniform gating grid")
    sub_per_chunk = chunk // plan.hop

    params = {
        "stages": [p for kind, _, p, _ in stages
                   if kind in ("local", "uniform")],
        "Hk": Hk,
        "targets": np.asarray(norm_targets or [target_lufs], np.float32),
    }

    n_fade = max(2, min(int(round(sr * 0.006)), int(sr * 0.1)))
    g_weights = tuple(meters._CHANNEL_GAINS[:channels]
                      if channels <= 5 else (1.0,) * channels)
    local_fns = [(kind, name, f) for kind, name, _, f in stages
                 if kind in ("local", "uniform")]
    stage_kinds = [(kind, name) for kind, name, _, _ in stages]

    def shard_fn(x, params):
        # x: [C, chunk] local shard.
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        bwd = [((i + 1) % n_dev, i) for i in range(n_dev)]

        pos0 = idx * chunk
        local_pos = pos0 + jnp.arange(chunk)
        valid = local_pos < n_total

        def with_halo(lkind, fns, x, ps):
            left_h = jax.lax.ppermute(x[..., -halo:], axis, fwd)
            right_h = jax.lax.ppermute(x[..., :halo], axis, bwd)
            left_h = jnp.where(idx == 0, 0.0, left_h)
            right_h = jnp.where(idx == n_dev - 1, 0.0, right_h)
            ext = jnp.concatenate([left_h, x, right_h], axis=-1)
            if lkind == "uniform":
                # Stage with internal collectives (distributed denoiser):
                # every device must execute the identical program — no
                # per-device branching allowed.
                return fns["i"](ext, ps["i"])[..., halo:halo + chunk]

            def b_int(_):
                return fns["i"](ext, ps["i"])[..., halo:halo + chunk]

            def b_left(_):
                # First shard: window anchored at the track start — the
                # op's own scipy-exact edge machinery produces the
                # single-chip track-start samples.
                if fns["l"] is None:  # build fallback: interior behavior
                    return b_int(None)
                return fns["l"](ext[..., halo:], ps["l"])[..., :chunk]

            def b_right(_):
                # Last shard: window ending exactly at the track end
                # (sample ``lv`` of this chunk); zero-pad the invalid tail.
                if fns["r"] is None:  # build fallback: interior behavior
                    return b_int(None)
                y = fns["r"](ext[..., :halo + lv], ps["r"])[..., halo:]
                if lv < chunk:
                    y = jnp.concatenate(
                        [y, jnp.zeros(y.shape[:-1] + (chunk - lv,), y.dtype)],
                        axis=-1)
                return y

            def b_right2(_):
                # Second-to-last shard when lv < halo: its right context
                # crosses the track end, so the window (left halo + chunk +
                # the last shard's lv valid samples) also ends exactly at
                # the track end — exact near-end samples, not zero history.
                if fns.get("r2") is None:  # build fallback
                    return b_int(None)
                y = fns["r2"](ext[..., :halo + chunk + lv], ps["r2"])
                return y[..., halo:halo + chunk]

            if need_r2:
                branch = jnp.where(
                    idx == n_dev - 1, 2,
                    jnp.where(idx == n_dev - 2, 3,
                              jnp.where(idx == 0, 1, 0)))
                return jax.lax.switch(
                    branch, [b_int, b_left, b_right, b_right2], 0)
            branch = jnp.where(idx == n_dev - 1, 2,
                               jnp.where(idx == 0, 1, 0))
            return jax.lax.switch(branch, [b_int, b_left, b_right], 0)

        def global_peak_guard(x, headroom_db):
            x = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
            peak = jax.lax.pmax(jnp.max(jnp.abs(x)), axis)
            limit = 10.0 ** (-headroom_db / 20.0)
            scale = jnp.where(peak > limit,
                              limit / jnp.maximum(peak, 1e-12), 1.0)
            return jnp.clip(x * scale, -1.0, 1.0)

        def gated_lufs(x):
            # K-weight the halo-extended chunk: the left halo warms the
            # causal filter up, the right halo supplies the next shard's
            # samples for the gating blocks that straddle the boundary.
            # psum'd two-stage gate — bit-equivalent to the full-track
            # BS.1770 meter (ops/meters.py).
            left_h = jax.lax.ppermute(x[..., -halo:], axis, fwd)
            right_h = jax.lax.ppermute(x[..., :halo], axis, bwd)
            left_h = jnp.where(idx == 0, 0.0, left_h)
            right_h = jnp.where(idx == n_dev - 1, 0.0, right_h)
            ext = jnp.concatenate([left_h, x, right_h], axis=-1)
            Hc = jax.lax.complex(params["Hk"][0], params["Hk"][1])
            from ..ops.fdfilter import lfilter_fd

            y = lfilter_fd(ext, Hc, nfft_k)[
                ..., halo:halo + chunk + 3 * plan.hop]
            y2 = jnp.square(y)
            nsub = sub_per_chunk + 3
            ysub = y2[..., :nsub * plan.hop].reshape(
                channels, nsub, plan.hop).sum(-1)
            z = (ysub[:, 0:sub_per_chunk] + ysub[:, 1:sub_per_chunk + 1]
                 + ysub[:, 2:sub_per_chunk + 2]
                 + ysub[:, 3:sub_per_chunk + 3]) / plan.div
            j_local = idx * sub_per_chunk + jnp.arange(sub_per_chunk)
            in_range = j_local < plan.n_blocks
            g = jnp.asarray(g_weights, z.dtype)
            zsum = jnp.einsum("c,cj->j", g, z)
            l_j = -0.691 + 10.0 * jnp.log10(jnp.maximum(zsum, 1e-30))
            m1 = (l_j > -70.0) & in_range
            c1 = jax.lax.psum(m1.sum(), axis)
            s1 = jax.lax.psum((zsum * m1).sum(), axis)
            gamma_r = -0.691 + 10.0 * jnp.log10(
                jnp.maximum(s1 / jnp.maximum(c1, 1), 1e-30)) - 10.0
            m2 = m1 & (l_j > gamma_r)
            c2 = jax.lax.psum(m2.sum(), axis)
            s2 = jax.lax.psum((zsum * m2).sum(), axis)
            lufs = -0.691 + 10.0 * jnp.log10(
                jnp.maximum(s2 / jnp.maximum(c2, 1), 1e-30))
            return jnp.where(c2 > 0, lufs, -1e9)

        def global_normalize(x, target):
            return x * meters.normalize_lufs_gain(gated_lufs(x), target)

        def blend(x, y, a):
            return y if a >= 1.0 else x * (1.0 - a) + y * a

        before = gated_lufs(x) if stats else None
        li = 0
        for kind, name in stage_kinds:
            if kind == "dc":
                s = jax.lax.psum(
                    jnp.sum(jnp.where(valid, x, 0.0), axis=-1), axis)
                y = jnp.where(valid, x - (s / n_total)[..., None], 0.0)
                x = blend(x, y, name)  # name carries amount
            elif kind == "peak":
                headroom_db, a = name
                x = blend(x, global_peak_guard(x, headroom_db), a)
            elif kind == "normalize":
                norm_i, a = name
                x = blend(x, global_normalize(
                    x, params["targets"][norm_i]), a)
            else:
                lkind, _lname, fns = local_fns[li]
                x = with_halo(lkind, fns, x, params["stages"][li])
                li += 1
                x = jnp.where(valid, x, 0.0)

        # --- fade-in + clip ---
        ramp = jnp.clip(local_pos / (n_fade - 1), 0.0, 1.0)
        x = x * ramp
        out = basic.finalize_clip(jnp.where(valid, x, 0.0))
        if not stats:
            return out
        nonfinite = jax.lax.psum(jnp.sum(~jnp.isfinite(x)), axis)
        return {
            "out": out,
            "before_lufs": before,
            "after_lufs": gated_lufs(out),
            "peak": jax.lax.pmax(jnp.max(jnp.abs(out)), axis),
            "finite": nonfinite == 0,
        }

    from jax import shard_map

    pspec = {"stages": P(), "Hk": P(), "targets": P()}
    out_spec_1 = P(None, axis)
    # Stats scalars are psum/pmax results — identical on every device, so
    # they replicate cleanly under an unsharded out_spec.
    stats_spec = {"out": out_spec_1, "before_lufs": P(), "after_lufs": P(),
                  "peak": P(), "finite": P()}
    if batch:
        # 2-D (dp × sp) composition: a batch of long tracks, each row of
        # the mesh owning one track's time shards.  The sp collectives
        # (psum/pmax/ppermute over ``axis``) act within a row; vmap carries
        # the per-row local batch.  This is the v5e-pod layout for "many DJ
        # sets at once": dp rides the outer mesh dim, sp the ICI-adjacent
        # inner dim.
        dp_axis = mesh.axis_names[0]
        out_b = P(dp_axis, None, axis)
        mapped = shard_map(
            jax.vmap(shard_fn, in_axes=(0, None)), mesh=mesh,
            in_specs=(P(dp_axis, None, axis), pspec),
            out_specs=({"out": out_b, "before_lufs": P(dp_axis),
                        "after_lufs": P(dp_axis), "peak": P(dp_axis),
                        "finite": P(dp_axis)} if stats else out_b),
            check_vma=False,
        )
    else:
        mapped = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(None, axis), pspec),
            out_specs=(stats_spec if stats else out_spec_1),
            check_vma=False,
        )
    fn = jax.jit(mapped)
    params_dev = jax.device_put(
        jax.tree_util.tree_map(np.asarray, params),
        NamedSharding(mesh, P()))
    return fn, params_dev, n_pad


def sp_master(x: np.ndarray, sr: int, mesh: Mesh, **kw) -> np.ndarray:
    """Master one long [C, N] track sharded over the mesh by time.  Accepts
    the engine's v2 surface: chain_config=, pro=, target_lufs=, style=."""
    x = np.atleast_2d(np.asarray(x, np.float32))
    C, n = x.shape
    fn, params, n_pad = build_sp_master(sr, n, C, mesh, **kw)
    xp = np.pad(x, ((0, 0), (0, n_pad - n)))
    out = np.asarray(fn(xp, params))
    return out[..., :n]


def sp_batch_master(xb: np.ndarray, sr: int, mesh: Mesh, **kw) -> np.ndarray:
    """Master a batch of long [B, C, N] tracks over a 2-D ``(dp, sp)`` mesh:
    the batch is data-parallel over the first mesh axis while each track is
    time-sharded over the second.  ``B`` must divide by the dp size."""
    xb = np.asarray(xb, np.float32)
    B, C, n = xb.shape
    dp = mesh.shape[mesh.axis_names[0]]
    if B % dp:
        raise ValueError(f"batch {B} not divisible by dp axis {dp}")
    fn, params, n_pad = build_sp_master(sr, n, C, mesh, batch=True, **kw)
    xp = np.pad(xb, ((0, 0), (0, 0), (0, n_pad - n)))
    out = np.asarray(fn(xp, params))
    return out[..., :n]
