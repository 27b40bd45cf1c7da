"""Sequence-parallel mastering: one long track sharded over the mesh by TIME.

The audio analog of context parallelism (SURVEY §5.7): a DJ-set-length track
(up to 800 MB WAV) is split into per-device chunks processed under
``shard_map``.  Each device extends its chunk with halo regions exchanged
from its neighbors via ``ppermute`` (halo ≥ the largest filter settle /
envelope warm-up), runs the chain's fast-mode ops on the extended chunk —
whose interior is then exact — and keeps its chunk of the result.  Ops that
need global state use collectives:

- DC offset: global mean via ``psum``.
- Peak guard: global |max| via ``pmax``.
- BS.1770 normalize: per-shard gating-block energies; the two-stage gate's
  global statistics (absolute-gated energy sum/count, relative threshold,
  second gate) via ``psum`` — bit-equivalent to the full-track meter.
- Output fade-in: position-aware via ``axis_index``.

Supported module set = the default v2 chain (reverb is off by default there;
IRs longer than the halo are rejected at build).  Track edges use zero
history (the fast path's zero-padding semantics); everything ≥ one halo from
the track ends matches the single-device graph to float tolerance.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import STYLE_CONFIGS
from ..ops import basic, design, meters
from ..ops.bands import build_dynamics
from ..ops.dynamics import build_deesser
from ..ops.eq import build_final_spectral_balance, build_style_eq, build_target_curve
from ..ops.exciter import build_harmonic_exciter
from ..ops.stereo import build_stereo_imager
from ..spec import GraphSpec

DEFAULT_HALO = 1 << 17  # 131072: covers filter settles and envelope warm-ups


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_sp_master(
    sr: int,
    n_total: int,
    channels: int,
    mesh: Mesh,
    *,
    target_lufs: float = -14.0,
    style: str = "standard",
    halo: int = DEFAULT_HALO,
):
    """Compile a time-sharded mastering step.

    Returns ``(fn, params, n_pad)``: ``fn(x[C, n_pad], params)`` is jitted
    with x sharded over the mesh's last ('sp') axis; pad input with zeros to
    ``n_pad`` and slice the output back to ``n_total``.
    """
    axis = mesh.axis_names[-1]
    n_dev = mesh.shape[axis]
    plan = meters.plan_blocks(sr, n_total)
    hop = plan.hop if plan.uniform else 1
    chunk = _round_up(_round_up(n_total, n_dev) // n_dev, max(hop, 256))
    n_pad = chunk * n_dev
    n_ext = chunk + 2 * halo
    spec_ext = GraphSpec(sr=sr, n=n_ext, channels=channels, exact=False)

    cfg = STYLE_CONFIGS.get(style, STYLE_CONFIGS["standard"])
    exciter_db = cfg.get("exciter_db", 0.0)
    imager_width = cfg.get("imager_width", 1.0)

    # LTI / local ops on the extended chunk (fast mode: exact interior).
    ops = []

    def add(name, built):
        ops.append((name, list(built[0]), built[1]))

    add("target_curve", build_target_curve(spec_ext))
    add("deesser", build_deesser(spec_ext))
    add("dynamics", build_dynamics(spec_ext))
    post_norm = []

    def add_post(name, built):
        post_norm.append((name, list(built[0]), built[1]))

    add_post("final_spectral_balance", build_final_spectral_balance(spec_ext))
    add_post("style_eq", build_style_eq(spec_ext, style))
    if exciter_db >= 0.05:
        add_post("exciter", build_harmonic_exciter(spec_ext, exciter_db))
    if abs(imager_width - 1.0) >= 0.01 and channels == 2:
        add_post("imager", build_stereo_imager(spec_ext, width=imager_width))

    # Normalize meter pieces (causal K-weighting on the extended chunk).
    settle_k = meters.k_weight_settle(sr)
    nfft_k = design.next_fft_size(n_ext + settle_k)
    Hk = meters.k_weight_response(sr, nfft_k)
    if not plan.uniform or chunk % plan.hop != 0:
        raise ValueError("sequence-parallel meter needs a uniform gating grid")
    sub_per_chunk = chunk // plan.hop

    params = {
        "ops": [p for _, p, _ in ops],
        "post": [p for _, p, _ in post_norm],
        "Hk": Hk,
        "target": np.float32(target_lufs),
    }

    n_fade = max(2, min(int(round(sr * 0.006)), int(sr * 0.1)))
    g_weights = tuple(meters._CHANNEL_GAINS[:channels]
                      if channels <= 5 else (1.0,) * channels)

    def shard_fn(x, params):
        # x: [C, chunk] local shard.
        idx = jax.lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        bwd = [((i + 1) % n_dev, i) for i in range(n_dev)]
        left = jax.lax.ppermute(x[..., -halo:], axis, fwd)
        right = jax.lax.ppermute(x[..., :halo], axis, bwd)
        left = jnp.where(idx == 0, 0.0, left)
        right = jnp.where(idx == n_dev - 1, 0.0, right)

        # position mask for valid samples (track may be zero-padded globally)
        pos0 = idx * chunk
        local_pos = pos0 + jnp.arange(chunk)
        valid = local_pos < n_total

        # --- dc offset (global mean over valid samples) ---
        s = jax.lax.psum(jnp.sum(jnp.where(valid, x, 0.0), axis=-1), axis)
        x = jnp.where(valid, x - (s / n_total)[..., None], 0.0)

        # --- peak guard (global) ---
        x = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
        peak = jax.lax.pmax(jnp.max(jnp.abs(x)), axis)
        limit = 10.0 ** (-0.5 / 20.0)
        scale = jnp.where(peak > limit, limit / jnp.maximum(peak, 1e-12), 1.0)
        x = jnp.clip(x * scale, -1.0, 1.0)

        def with_halo(fn_local, x, p):
            left_h = jax.lax.ppermute(x[..., -halo:], axis, fwd)
            right_h = jax.lax.ppermute(x[..., :halo], axis, bwd)
            left_h = jnp.where(idx == 0, 0.0, left_h)
            right_h = jnp.where(idx == n_dev - 1, 0.0, right_h)
            ext = jnp.concatenate([left_h, x, right_h], axis=-1)
            out = fn_local(ext, p)
            return out[..., halo:halo + chunk]

        for (name, _, f), p in zip(ops, params["ops"]):
            x = with_halo(f, x, p)

        # --- normalize_lufs (global gated meter) ---
        left_h = jax.lax.ppermute(x[..., -halo:], axis, fwd)
        right_h = jax.lax.ppermute(x[..., :halo], axis, bwd)
        left_h = jnp.where(idx == 0, 0.0, left_h)
        right_h = jnp.where(idx == n_dev - 1, 0.0, right_h)
        ext = jnp.concatenate([left_h, x, right_h], axis=-1)
        Hc = jax.lax.complex(params["Hk"][0], params["Hk"][1])
        from ..ops.fdfilter import lfilter_fd

        y = lfilter_fd(ext, Hc, nfft_k)[..., halo:halo + chunk + 3 * plan.hop]
        # block j (global) starts at hop*j; local blocks start in this chunk.
        y2 = jnp.square(y)
        nsub = sub_per_chunk + 3
        ysub = y2[..., :nsub * plan.hop].reshape(channels, nsub, plan.hop).sum(-1)
        z = (ysub[:, 0:sub_per_chunk] + ysub[:, 1:sub_per_chunk + 1]
             + ysub[:, 2:sub_per_chunk + 2] + ysub[:, 3:sub_per_chunk + 3]) / plan.div
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
        lufs = jnp.where(c2 > 0, lufs, -1e9)
        x = x * meters.normalize_lufs_gain(lufs, params["target"])

        for (name, _, f), p in zip(post_norm, params["post"]):
            x = with_halo(f, x, p)

        # --- final peak guard (global) + fade-in + clip ---
        x = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
        peak = jax.lax.pmax(jnp.max(jnp.abs(x)), axis)
        scale = jnp.where(peak > limit, limit / jnp.maximum(peak, 1e-12), 1.0)
        x = jnp.clip(x * scale, -1.0, 1.0)
        ramp = jnp.clip(local_pos / (n_fade - 1), 0.0, 1.0)
        x = x * ramp
        return basic.finalize_clip(jnp.where(valid, x, 0.0))

    from jax import shard_map

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis), {"ops": P(), "post": P(), "Hk": P(),
                                  "target": P()}),
        out_specs=P(None, axis),
        check_vma=False,
    )
    x_sh = NamedSharding(mesh, P(None, axis))
    fn = jax.jit(mapped)
    params_dev = jax.device_put(
        jax.tree_util.tree_map(np.asarray, params),
        NamedSharding(mesh, P()))
    return fn, params_dev, n_pad


def sp_master(x: np.ndarray, sr: int, mesh: Mesh, **kw) -> np.ndarray:
    """Master one long [C, N] track sharded over the mesh by time."""
    x = np.atleast_2d(np.asarray(x, np.float32))
    C, n = x.shape
    fn, params, n_pad = build_sp_master(sr, n, C, mesh, **kw)
    xp = np.pad(x, ((0, 0), (0, n_pad - n)))
    out = np.asarray(fn(xp, params))
    return out[..., :n]
