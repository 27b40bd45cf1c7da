"""Sequential-recurrence kernels: attack/release envelope followers.

The reference implements its envelope follower as a numba-JIT per-sample
Python loop (backend/app/pipeline.py:495-518) and uses it in the de-esser,
transient designer, transient-aware maximizer, dynamic EQ, and (via the
Pedalboard C++ compressor) multiband dynamics.  The recurrence is

    env[t] = c_t * env[t-1] + (1 - c_t) * v[t],
    c_t    = attack_coef  if v[t] > env[t-1] else release_coef,

with ``v = |x|`` — a data-dependent branch, so it is *not* a linear scan.

TPU-native design: the recurrence is a contraction with per-step Lipschitz
factor ``max(attack_coef, release_coef) < 1``, so the influence of the state
decays geometrically.  We split the time axis into chunks with a warm-up
overlap ``W`` chosen so the carried error from an arbitrary chunk-start state
is below ``eps`` (``rho**W < eps``); every chunk is then evaluated
*independently* (chunk axis becomes a vector lane axis on the VPU) with a
single ``lax.scan`` of depth ``chunk + W`` instead of N.  This is the audio
analog of blockwise context parallelism; exactness is to ``eps``, not
approximate in any audible sense.

Chunk 0 is *bit-exact*: its warm-up region is filled with ``v[0]``, for which
the recurrence is a fixed point, reproducing the reference's ``env[0]=|x[0]|``
initialisation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def ar_coefs(sr: float, attack_sec: float, release_sec: float) -> tuple[float, float]:
    """One-pole coefficients as in the reference (pipeline.py:515-516)."""
    attack = float(np.exp(-1.0 / max(1e-6, sr * attack_sec)))
    release = float(np.exp(-1.0 / max(1e-6, sr * release_sec)))
    return attack, release


def warmup_len(attack_coef: float, release_coef: float, eps: float = 1e-8) -> int:
    rho = max(attack_coef, release_coef)
    if rho <= 0.0:
        return 1
    rho = min(rho, 1.0 - 1e-9)
    return max(1, int(math.ceil(math.log(eps) / math.log(rho))))


def _use_pallas() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return False
    return plat in ("tpu", "axon")


def _env_pallas(wt: jax.Array, attack: float, release: float) -> jax.Array:
    """Pallas TPU kernel for the envelope recurrence.

    ``wt``: [T, M] time-major windows, M a multiple of 128, T a multiple of
    the time block.  The grid is (lane blocks, time blocks); time blocks run
    innermost and sequentially on the core, carrying the envelope state in a
    VMEM scratch row.  Each step is one (1, 128) VPU op — removing the
    per-iteration dispatch overhead that dominates a lax.scan over millions
    of samples.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, M = wt.shape
    TB = 512
    assert T % TB == 0 and M % 128 == 0

    def kernel(x_ref, o_ref, e_ref):
        t_block = pl.program_id(1)

        @pl.when(t_block == 0)
        def _():
            # env[0] = v[0]: both branches of the recurrence fix e=v there.
            e_ref[0:1, :] = x_ref[0:1, :]

        def body(i, e):  # all values kept 2-D (1, 128) for Mosaic layouts
            row = x_ref[pl.ds(i, 1), :]
            coef = jnp.where(row > e, attack, release)
            e2 = coef * e + (1.0 - coef) * row
            o_ref[pl.ds(i, 1), :] = e2
            return e2

        e = jax.lax.fori_loop(0, TB, body, e_ref[0:1, :])
        e_ref[0:1, :] = e

    return pl.pallas_call(
        kernel,
        grid=(M // 128, T // TB),
        in_specs=[pl.BlockSpec((TB, 128), lambda m, t: (t, m),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, 128), lambda m, t: (t, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, M), wt.dtype),
        scratch_shapes=[pltpu.VMEM((1, 128), wt.dtype)],
    )(wt)


def _env_blocks(windows: jax.Array, attack: float, release: float,
                unroll: int) -> jax.Array:
    """Run the recurrence over the last axis of ``windows`` [..., K, Tw],
    returning the same shape.  Dispatches to the Pallas kernel on TPU."""
    shape = windows.shape
    Tw = shape[-1]
    if _use_pallas():
        M = int(np.prod(shape[:-1]))
        TB = 512
        T_pad = -(-Tw // TB) * TB
        M_pad = -(-M // 128) * 128
        wt = windows.reshape(M, Tw).T  # [Tw, M]
        wt = jnp.pad(wt, ((0, T_pad - Tw), (0, M_pad - M)))
        out = _env_pallas(wt, attack, release)
        return out[:Tw, :M].T.reshape(shape)
    w_t = jnp.moveaxis(windows, -1, 0)
    e0 = w_t[0]
    ys = _env_scan(w_t[1:], e0, attack, release, unroll)
    env = jnp.concatenate([e0[None], ys], axis=0)
    return jnp.moveaxis(env, 0, -1)


def _env_scan(v_t: jax.Array, e0: jax.Array, attack: float, release: float,
              unroll: int = 8) -> jax.Array:
    """Run the recurrence over leading time axis of ``v_t`` ([T, ...]),
    starting from state ``e0`` ([...]).  Returns env for steps 1..T stacked on
    the leading axis (i.e. env AFTER consuming each row of v_t)."""

    def step(e, v):
        coef = jnp.where(v > e, attack, release)
        e_new = coef * e + (1.0 - coef) * v
        return e_new, e_new

    _, ys = jax.lax.scan(step, e0, v_t, unroll=unroll)
    return ys


def envelope_follower(
    v: jax.Array,
    attack_coef: float,
    release_coef: float,
    *,
    eps: float = 1e-8,
    min_chunk: int = 16384,
    unroll: int = 8,
) -> jax.Array:
    """Attack/release envelope of a nonnegative signal ``v`` ([..., N]).

    Matches the reference's ``_envelope_follower_core`` (pipeline.py:495-507)
    to within ``eps`` (chunk 0 exactly)."""
    n = v.shape[-1]
    if n == 0:
        return v
    W = warmup_len(attack_coef, release_coef, eps)

    if n <= max(2 * W, 2 * min_chunk):
        # Short signal (or long time constants): single sequential pass.
        env = _env_blocks(v[..., None, :], attack_coef, release_coef, unroll)
        return env[..., 0, :]

    # Chunk size equals the warm-up length so window k is simply chunks
    # (k, k+1) side by side — built with a reshape + concat (contiguous
    # copies) instead of a 2x-sized gather, which dominates runtime on TPU.
    C = max(W, min_chunk)
    K = -(-n // C)  # ceil
    pad = K * C - n
    # Left warm-up chunk: v[0] repeated (fixed point => exact chunk 0);
    # right padding: edge value (outputs discarded).
    ext = jnp.concatenate(
        [
            jnp.broadcast_to(v[..., :1], v.shape[:-1] + (C,)),
            v,
            jnp.broadcast_to(v[..., -1:], v.shape[:-1] + (pad,)),
        ],
        axis=-1,
    )  # [..., (K+1) * C]
    chunks = ext.reshape(v.shape[:-1] + (K + 1, C))
    windows = jnp.concatenate([chunks[..., :-1, :], chunks[..., 1:, :]],
                              axis=-1)  # [..., K, 2C]
    env = _env_blocks(windows, attack_coef, release_coef, unroll)
    env = env[..., C:]  # [..., K, C]
    env = env.reshape(v.shape[:-1] + (K * C,))
    return env[..., :n]


def envelope_follower_xsr(
    x: jax.Array, sr: float, attack_sec: float, release_sec: float, **kw
) -> jax.Array:
    """Reference ``_envelope_follower`` (pipeline.py:510-518): |x| envelope."""
    att, rel = ar_coefs(sr, attack_sec, release_sec)
    return envelope_follower(jnp.abs(x), att, rel, **kw)
