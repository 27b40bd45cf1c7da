"""Batch mastering: vmapped chain over [B, C, N], optionally mesh-sharded.

Length bucketing: tracks are padded (with zeros) up to a bucket length so one
compiled graph serves a range of durations; each track's true length travels
as a per-track ``n_valid`` (ops.validctx) so LUFS gating, filter edge
semantics, and fades anchor at the real track end — padded output sliced to
``n_valid`` equals the exact-length graph's output (tests/test_valid_masking,
tests/test_batch_mesh).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.chain import compile_chain
from ..spec import GraphSpec

# The long tail (> 600 s) covers DJ-set uploads (reference: 800 MB WAV ≈
# 75 min of 16-bit stereo, config.py:26-33): ~1.4× spaced so padding waste
# stays ≤ 40 % while distinct long uploads share one masked executable —
# cold-start latency is one ladder compile (persistently cached) instead of
# a fresh exact-length compile per distinct length.  The serving engine
# caps how far up the ladder it buckets via ``engine_max_bucket_sec``
# (HBM-bound: the stacked band-response working set is ~32·nfft bytes).
DEFAULT_BUCKETS_SEC = tuple(float(s) for s in
                            (15, 30, 60, 90, 120, 150, 180, 240, 300, 420,
                             600, 900, 1260, 1800, 2520, 3600))


def pad_to_bucket(x: np.ndarray, sr: int, buckets_sec=DEFAULT_BUCKETS_SEC):
    """Pad [C, N] to the smallest bucket >= N.  Returns (padded, n_valid)."""
    n = x.shape[-1]
    for s in buckets_sec:
        bn = int(round(s * sr))
        if bn >= n:
            pad = bn - n
            return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]), n
    return x, n


# Minimum per-track valid length (seconds) accepted with bucket padding:
# the valid-end edge windows (ops.validctx / ops.fdfilter.odd_ext_valid)
# clamp their indices, so a valid region that does not dominate the largest
# filter settle/edge window would silently get wrong edge semantics instead
# of an error.  The serving engine compiles sub-3 s tracks at exact length
# (MasteringEngine.MIN_BUCKET_SEC); this public entry enforces a 1 s floor.
MIN_VALID_SEC = 1.0


def _check_nvb(nvb, spec: GraphSpec) -> np.ndarray:
    nvb = np.asarray(nvb, np.int32)
    min_valid = min(spec.n, int(MIN_VALID_SEC * spec.sr))
    if nvb.size and int(nvb.min()) < min_valid:
        raise ValueError(
            f"per-track valid length {int(nvb.min())} is below the minimum "
            f"{min_valid} samples ({MIN_VALID_SEC:.0f} s at {spec.sr} Hz) for "
            f"bucket-padded graphs; compile short tracks at exact length "
            f"instead (see parallel.batch.MIN_VALID_SEC)")
    if nvb.size and int(nvb.max()) > spec.n:
        raise ValueError(
            f"per-track valid length {int(nvb.max())} exceeds the bucket "
            f"length {spec.n}")
    return nvb


def make_batch_fn(spec: GraphSpec, config: dict | None = None, *,
                  mesh=None, donate: bool = True, **chain_kw):
    """Returns (step, params): step(xb, params[, nvb]) computes the
    chain over [B, C, N] with optional per-track valid lengths nvb [B]
    (validated host-side against :data:`MIN_VALID_SEC` before dispatch).

    With ``mesh``, the batch axis is sharded over the mesh's first axis and
    params are replicated — pure data parallelism over ICI."""
    chain = compile_chain(spec, config, jit=False, **chain_kw)

    if mesh is not None:
        def step(xb, params, nvb):
            return jax.vmap(chain.raw_fn, in_axes=(0, None, 0))(
                xb, params, nvb)

        axis = mesh.axis_names[0]
        x_sh = NamedSharding(mesh, P(axis))
        p_sh = NamedSharding(mesh, P())
        params = jax.device_put(chain.params, p_sh)
        jitted = jax.jit(
            step,
            in_shardings=(x_sh, p_sh, NamedSharding(mesh, P(axis))),
            out_shardings=x_sh,
            donate_argnums=(0,) if donate else (),
        )

        def checked(xb, params, nvb):
            return jitted(xb, params, _check_nvb(nvb, spec))
    else:
        def step(xb, params, nvb=None):
            if nvb is None:
                return jax.vmap(chain.raw_fn, in_axes=(0, None))(xb, params)
            return jax.vmap(chain.raw_fn, in_axes=(0, None, 0))(
                xb, params, nvb)

        params = jax.device_put(chain.params)
        jitted = jax.jit(step, donate_argnums=(0,) if donate else ())

        def checked(xb, params, nvb=None):
            if nvb is None:
                return jitted(xb, params)
            return jitted(xb, params, _check_nvb(nvb, spec))
    return checked, params


def batch_master(xb: np.ndarray, sr: int, config: dict | None = None, *,
                 mesh=None, nvb: np.ndarray | None = None,
                 **chain_kw) -> np.ndarray:
    """Master a batch [B, C, N] in one fused SPMD step.  ``nvb`` [B]: valid
    length per (bucket-padded) track."""
    xb = np.ascontiguousarray(xb, np.float32)
    spec = GraphSpec(sr=sr, n=xb.shape[-1], channels=xb.shape[1])
    fn, params = make_batch_fn(spec, config, mesh=mesh, **chain_kw)
    if nvb is None:
        if mesh is None:
            return np.asarray(fn(xb, params))
        nvb = np.full(xb.shape[0], xb.shape[-1])
    return np.asarray(fn(xb, params, np.asarray(nvb, np.int32)))
