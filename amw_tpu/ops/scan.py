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

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching


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


def _groups_cap() -> int:
    """Interleaved 128-lane groups per kernel step (AMW_SCAN_GROUPS).

    The envelope recurrence is a ~5-op dependency chain per sample; on a
    single (1, 128) state row the VPU sits latency-bound (old single-group
    de-esser: 46.4 ms e2e at [16, 7.9M] on v5e — far off the HBM floor).
    Running S independent window groups side by side widens the state to
    (1, S*128): Mosaic splits each vector op into S independent lane
    tiles, so the chains interleave and the pipeline fills.  Measured on
    v5e: envelope 24.6 -> 16.4 ms and de-esser 46.4 -> 40.6 ms at S=4;
    S=8 was no faster for the envelope and OVERFLOWS VMEM in the
    de-esser's gain-mode kernel (the iota/compare temporaries on top of
    the 5 (TB, R) buffers) — hence the default cap of 4."""
    try:
        return max(1, min(16, int(os.environ.get("AMW_SCAN_GROUPS", "4"))))
    except ValueError:
        return 4


def _pick_groups(m_rows: int) -> tuple[int, int]:
    """Largest power-of-two group count S (≤ cap) for ``m_rows`` sequences
    and the padded row count (a multiple of 128*S)."""
    cap = _groups_cap()
    g = -(-m_rows // 128)
    s = 1
    while s * 2 <= min(cap, g):
        s *= 2
    return s, -(-m_rows // (128 * s)) * (128 * s)


def _env_loop(pl, xt_ref, ot_ref, e_ref, t_block, attack, release, TB):
    """The shared recurrence inner loop over one (TB, R) time-major block.

    Loads ALIGNED 8-row slabs (one VMEM read per 8 steps) and stores one
    (8, R) slab per iteration — measured at the HBM floor on v5e (the
    per-row ds-load/store variant paid ~2x the loop cost).  The S lane
    tiles of the (1, R) state are independent chains, so the ~5-op
    dependency chain per sample pipelines across groups."""

    @pl.when(t_block == 0)
    def _():
        # env[0] = v[0]: both branches of the recurrence fix e=v there.
        e_ref[0:1, :] = xt_ref[0:1, :]

    def body(j, e):
        blk = xt_ref[pl.ds(j * 8, 8), :]
        rows = []
        for u in range(8):
            row = jax.lax.slice_in_dim(blk, u, u + 1, axis=0)
            coef = jnp.where(row > e, attack, release)
            e = coef * e + (1.0 - coef) * row
            rows.append(e)
        ot_ref[pl.ds(j * 8, 8), :] = jnp.concatenate(rows, axis=0)
        return e

    e = jax.lax.fori_loop(0, TB // 8, body, e_ref[0:1, :])
    e_ref[0:1, :] = e


def _env_pallas(wm: jax.Array, attack: float, release: float,
                skip: int = 0, groups: int | None = None) -> jax.Array:
    """Pallas TPU kernel for the envelope recurrence.

    ``wm``: [M, T] windows in their NATURAL layout (sequences on sublanes,
    time on lanes; M a multiple of 128, T a multiple of the time block).
    Each 128-row group is transposed to time-major IN-KERNEL with the
    VPU transpose (measured faster than the earlier MXU identity-matmul
    transpose, and exact), the recurrence runs over the TB time rows with
    the state carried in a VMEM scratch row, and the result is transposed
    back before the store.  An earlier variant required a pre-transposed
    [T, M] input; the XLA transpose of the ~1 GB window array cost ~75 ms
    at batch 8 — 7x the kernel itself.

    ``groups``: number S of independent 128-row groups advanced side by
    side per grid step (state row (1, S*128)) — see :func:`_groups_cap`;
    default = the largest power of two dividing M//128 (≤ cap).

    ``skip``: number of leading TIME BLOCKS (warm-up region) to drop from
    the output — the returned array is [M, T - skip*TB].  Warm-up blocks
    write into output block 0, which the first kept block then overwrites
    (the output index map clamps; grid order makes the kept write last) —
    this replaces a ~8 ms XLA slice-copy of the 0.5 GB env array with
    nothing."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, T = wm.shape
    TB = 512
    if groups is None:
        groups, _ = _pick_groups(M)
        while M % (128 * groups):
            groups //= 2
    S = groups
    R = S * 128
    assert T % TB == 0 and M % R == 0 and 0 <= skip < T // TB

    def kernel(x_ref, o_ref, xt_ref, ot_ref, e_ref):
        t_block = pl.program_id(1)
        for s in range(S):
            sl = slice(s * 128, (s + 1) * 128)
            xt_ref[:, sl] = x_ref[sl, :].T  # [TB, R] time-major
        _env_loop(pl, xt_ref, ot_ref, e_ref, t_block, attack, release, TB)
        for s in range(S):
            sl = slice(s * 128, (s + 1) * 128)
            o_ref[sl, :] = ot_ref[:, sl].T  # [R, TB]

    def out_index(m, t):
        return (m, jnp.maximum(t - skip, 0))

    return pl.pallas_call(
        kernel,
        grid=(M // R, T // TB),
        in_specs=[
            pl.BlockSpec((R, TB), lambda m, t: (m, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, TB), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, T - skip * TB), wm.dtype),
        scratch_shapes=[pltpu.VMEM((TB, R), wm.dtype),
                        pltpu.VMEM((TB, R), wm.dtype),
                        pltpu.VMEM((1, R), wm.dtype)],
    )(wm)


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
        S, M_pad = _pick_groups(M)
        wm = windows.reshape(M, Tw)  # natural layout — no transpose
        wm = jnp.pad(wm, ((0, M_pad - M), (0, T_pad - Tw)))
        out = _env_pallas(wm, attack, release, groups=S)
        return out[:M, :Tw].reshape(shape)
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
    to within ``eps`` (chunk 0 exactly).

    Under ``jax.vmap`` (the serving engine batches the per-track graph that
    way) the batch axis COLLAPSES into the kernel's window rows via a
    custom_vmap rule: lifting the Pallas call per vmap instance instead
    would pick the window/group geometry from the per-track row count
    (2 channels -> S=1, latency-bound; measured 58 vs 26 ms at
    [8, 2, 7.9M] on v5e)."""
    return _env_cv(float(attack_coef), float(release_coef), float(eps),
                   int(min_chunk), int(unroll))(v)


@functools.lru_cache(maxsize=256)
def _env_cv(attack_coef, release_coef, eps, min_chunk, unroll):
    @custom_batching.custom_vmap
    def f(v):
        return _envelope_impl(v, attack_coef, release_coef, eps, min_chunk,
                              unroll)

    @f.def_vmap
    def rule(axis_size, in_batched, v):
        if not in_batched[0]:
            v = jnp.broadcast_to(v, (axis_size,) + v.shape)
        return f(v), True

    return f


def _envelope_impl(v, attack_coef, release_coef, eps, min_chunk, unroll):
    n = v.shape[-1]
    if n == 0:
        return v
    W = warmup_len(attack_coef, release_coef, eps)

    if n <= max(2 * W, 2 * min_chunk):
        # Short signal (or long time constants): single sequential pass.
        env = _env_blocks(v[..., None, :], attack_coef, release_coef, unroll)
        return env[..., 0, :]

    # Chunk k = W-sample warm-up prefix (tail of chunk k-1) + C kept
    # samples.  The chunk is sized as large as possible while keeping
    # ~cap*128 parallel sequences (rows × K) for the Pallas kernel's
    # interleaved lane groups, so the warm-up overlap costs
    # ~(C+W)/C ≤ 2x of the data — a good trade for the S-way ILP.
    rows = int(np.prod(v.shape[:-1])) if v.ndim > 1 else 1
    k_target = max(1, -(-(_groups_cap() * 128) // max(rows, 1)))
    TB = 512
    # W and C rounded to the kernel's time block so the trimmed-output
    # kernel can drop the warm-up region by block index (no XLA slice).
    W = -(-W // TB) * TB
    C = -(-max(W, min_chunk, -(-n // k_target)) // TB) * TB
    K = -(-n // C)  # ceil
    if _use_pallas():
        # No materialized overlapping-window matrix: the kernel reads the
        # warm-up and body views through separate block index maps.
        P, A = _win_views(v.reshape(rows, n), W, C, K)
        M = rows * K
        S, M_pad = _pick_groups(M)
        P = jnp.pad(P, ((0, M_pad - M), (0, 0)))
        A = jnp.pad(A, ((0, M_pad - M), (0, 0)))
        env = _win_scan_pallas(P, A, attack=attack_coef,
                               release=release_coef, groups=S)[:M]
        env = env.reshape(v.shape[:-1] + (K * C,))
        return env[..., :n]
    pad = K * C - n
    ext = jnp.concatenate(
        [
            jnp.broadcast_to(v[..., :1], v.shape[:-1] + (W,)),
            v,
            jnp.broadcast_to(v[..., -1:], v.shape[:-1] + (pad,)),
        ],
        axis=-1,
    )  # [..., W + K * C]
    windows = jnp.stack(
        [jax.lax.slice_in_dim(ext, k * C, k * C + W + C, axis=-1)
         for k in range(K)],
        axis=-2)  # [..., K, W + C]
    env = _env_blocks(windows, attack_coef, release_coef, unroll)
    env = env[..., W:]  # [..., K, C]
    env = env.reshape(v.shape[:-1] + (K * C,))
    return env[..., :n]


def envelope_follower_xsr(
    x: jax.Array, sr: float, attack_sec: float, release_sec: float, **kw
) -> jax.Array:
    """Reference ``_envelope_follower`` (pipeline.py:510-518): |x| envelope."""
    att, rel = ar_coefs(sr, attack_sec, release_sec)
    return envelope_follower(jnp.abs(x), att, rel, **kw)


# ---------------------------------------------------------------------------
# De-esser tail: envelope -> gain (one Pallas pass) -> box -> combine
# ---------------------------------------------------------------------------
#
# The de-esser (reference pipeline.py:1200-1264) ends with
#
#   env    = envelope_follower(|sc|)
#   gain   = clip(reduction(env) / env, 0.35, 1)
#   gain   = clip(box_k(mask_tail(gain)), 0.35, 1)     # ~1.5 ms boxcar
#   out    = y3 - sc + sc * gain
#
# The envelope recurrence and the pointwise gain map run in one windowed
# Pallas pass (_win_scan_pallas in gain mode — the gain math rides the
# envelope kernel's registers for free); the k-wide boxcar then runs in
# the bandwidth-bound fdfilter._box_pallas halo kernel and the final
# combine fuses into one XLA elementwise pass.  A round-3 variant fused
# the box and combine INTO the envelope kernel (carrying gain context
# blocks in VMEM); it saved ~4 ms of HBM but paid serial VPU shift-adds
# for the box — unfusing it won on v5e (46.4 -> 40.6 ms e2e at
# [16, 7.9M] together with the windowing, grouping and loop fixes; the
# remaining gap to the ~6 ms HBM floor is recurrence latency).
#
# Box semantics match ops.fdfilter.box_smooth_same(validctx.mask_tail(g)):
# gain contributions at global positions outside [0, n_valid) are zero
# (the 'same' convolution's zero padding / the padded-bucket tail mask) —
# enforced in-kernel by masking each gain block with its global sample
# index before the box sees it.


def _win_views(x2: jax.Array, W: int, C: int, K: int):
    """Warm-up/body views for the windowed kernels, from ``x2`` [rows, n].

    Returns ``(P, A)``: the body ``A`` [rows*K, C] is a FREE reshape of
    the right-padded signal (window k's kept chunk), and the warm-up
    ``P`` [rows*K, W] holds the W samples preceding each chunk (the tail
    of the previous chunk; x[0] replicated for chunk 0 — the recurrence's
    fixed point, reproducing env[0] = v[0]).  Replaces the materialized
    overlapping-window matrix (1.6 GB of XLA copies ≈ 12 ms at
    [16, 7.9M] on v5e) with one pad copy + one W-slab copy (≈ 1 ms)."""
    rows, n = x2.shape
    pad = K * C - n
    a3 = jnp.pad(x2, ((0, 0), (0, pad))).reshape(rows, K, C)
    p0 = jnp.broadcast_to(x2[:, :1, None], (rows, 1, W))
    P = jnp.concatenate([p0, a3[:, :-1, C - W:]], axis=1)
    return P.reshape(rows * K, W), a3.reshape(rows * K, C)


def _win_scan_pallas(pw, aw, *, attack, release, groups, aux=None,
                     gain=None, take_abs=False, interpret=False):
    """Windowed envelope kernel over warm-up ``pw`` [M, W] + body ``aw``
    [M, C] (see :func:`_win_views`).  Returns the per-chunk result [M, C]:
    the envelope itself, or (``gain`` mode) the de-esser's pre-box gain
    curve ``clip(reduction(env)/env, floor, 1)`` zeroed outside the valid
    global range given by ``aux`` int32 [2, M] (row 0: chunk global
    offset; row 1: n_valid).

    The warm-up and body ride separate in_specs whose index maps clamp —
    Pallas skips refetching a block whose index did not change, so the
    kernel reads each input byte once and never needs the overlapping
    window matrix in HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, W = pw.shape
    C = aw.shape[-1]
    TB = 512
    S = groups
    R = S * 128
    assert W % TB == 0 and C % TB == 0 and M % R == 0
    wb = W // TB
    cb = C // TB
    g_mode = gain is not None
    if g_mode:
        thresh, ratio, floor = gain

    def kernel(*refs):
        if g_mode:
            p_ref, a_ref, aux_ref, o_ref, xt_ref, ot_ref, e_ref = refs
        else:
            p_ref, a_ref, o_ref, xt_ref, ot_ref, e_ref = refs
        t_block = pl.program_id(1)

        def load(ref):
            for s in range(S):
                sl = slice(s * 128, (s + 1) * 128)
                blk = ref[sl, :]
                xt_ref[:, sl] = (jnp.abs(blk) if take_abs else blk).T

        @pl.when(t_block < wb)
        def _():
            load(p_ref)

        @pl.when(t_block >= wb)
        def _():
            load(a_ref)

        _env_loop(pl, xt_ref, ot_ref, e_ref, t_block, attack, release, TB)

        if g_mode:
            env = ot_ref[...]
            red = jnp.where(env > thresh,
                            thresh + (env - thresh) / ratio, env)
            g = jnp.where(env > 1e-10, red / (env + 1e-12), 1.0)
            g = jnp.clip(g, floor, 1.0)
            gidx = (aux_ref[0:1, :]
                    + (t_block - wb) * TB
                    + jax.lax.broadcasted_iota(jnp.int32, (TB, R), 0))
            g = jnp.where((gidx >= 0) & (gidx < aux_ref[1:2, :]), g, 0.0)
            ot_ref[...] = g
        for s in range(S):
            sl = slice(s * 128, (s + 1) * 128)
            o_ref[sl, :] = ot_ref[:, sl].T

    def out_index(m, t):
        return (m, jnp.clip(t - wb, 0, cb - 1))

    in_specs = [
        pl.BlockSpec((R, TB), lambda m, t: (m, jnp.minimum(t, wb - 1)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, TB), out_index, memory_space=pltpu.VMEM),
    ]
    args = [pw, aw]
    if g_mode:
        in_specs.append(pl.BlockSpec((2, R), lambda m, t: (0, m),
                                     memory_space=pltpu.VMEM))
        args.append(aux)
    return pl.pallas_call(
        kernel,
        grid=(M // R, wb + cb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, TB), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), aw.dtype),
        scratch_shapes=[pltpu.VMEM((TB, R), aw.dtype),
                        pltpu.VMEM((TB, R), aw.dtype),
                        pltpu.VMEM((1, R), aw.dtype)],
        # only pass interpret when set: tests force interpret mode by
        # monkey-patching pallas_call with a partial, which an explicit
        # interpret=False here would override
        **({"interpret": True} if interpret else {}),
    )(*args)


def deesser_gain_combine(y3, sc, attack, release, thresh, ratio, k, *,
                         floor=0.35, nv=None, eps=1e-8, min_chunk=16384,
                         force_pallas=None, interpret=False):
    """``y3 - sc + sc * gain`` with the de-esser's smoothed gain curve,
    envelope+gain in one Pallas pass on TPU, then the halo box kernel and
    a fused combine (composition of the individual ops
    elsewhere).  ``nv``: traced valid length (None = whole track).

    Batch axes collapse into kernel rows under ``jax.vmap`` (see
    :func:`envelope_follower`); ``nv`` stays per-track through the
    kernel's aux rows."""
    n = y3.shape[-1]
    nv_arr = jnp.asarray(n if nv is None else nv, jnp.int32)
    f = _deesser_cv(float(attack), float(release), float(thresh),
                    float(ratio), int(k), float(floor), float(eps),
                    int(min_chunk), force_pallas, bool(interpret))
    return f(y3, sc, nv_arr)


@functools.lru_cache(maxsize=256)
def _deesser_cv(attack, release, thresh, ratio, k, floor, eps, min_chunk,
                force_pallas, interpret):
    @custom_batching.custom_vmap
    def f(y3, sc, nv):
        return _deesser_impl(y3, sc, nv, attack, release, thresh, ratio, k,
                             floor, eps, min_chunk, force_pallas, interpret)

    @f.def_vmap
    def rule(axis_size, in_batched, y3, sc, nv):
        if not in_batched[0]:
            y3 = jnp.broadcast_to(y3, (axis_size,) + y3.shape)
        if not in_batched[1]:
            sc = jnp.broadcast_to(sc, (axis_size,) + sc.shape)
        if not in_batched[2]:
            nv = jnp.broadcast_to(nv, (axis_size,) + nv.shape)
        return f(y3, sc, nv), True

    return f


def _deesser_impl(y3, sc, nv, attack, release, thresh, ratio, k, floor,
                  eps, min_chunk, force_pallas, interpret):
    """Unbatched de-esser tail; ``nv`` int32 of any shape that is a prefix
    of the lead dims (scalar = all rows, [B] = per vmapped track, ...)."""
    from .fdfilter import box_smooth_same

    n = y3.shape[-1]
    lead = y3.shape[:-1]
    TB = 512
    use = _use_pallas() if force_pallas is None else force_pallas
    W0 = warmup_len(attack, release, eps)
    nv_lead = jnp.broadcast_to(
        nv.reshape(nv.shape + (1,) * (len(lead) - nv.ndim)), lead)
    if not use or n <= max(2 * W0, 2 * min_chunk, 2 * TB):
        env = envelope_follower(jnp.abs(sc), attack, release,
                                eps=eps, min_chunk=min_chunk)
        red = jnp.where(env > thresh, thresh + (env - thresh) / ratio, env)
        gain = jnp.where(env > 1e-10, red / (env + 1e-12), 1.0)
        gain = jnp.clip(gain, floor, 1.0)
        t = jnp.arange(n)
        gain = jnp.where(t < nv_lead[..., None], gain, 0.0)
        gain = box_smooth_same(gain, k)
        gain = jnp.clip(gain, floor, 1.0)
        return y3 - sc + sc * gain

    rows = int(np.prod(lead)) if lead else 1
    k_target = max(1, -(-(_groups_cap() * 128) // max(rows, 1)))
    W = -(-W0 // TB) * TB
    C = -(-max(W, min_chunk, -(-n // k_target)) // TB) * TB
    K = -(-n // C)

    P, A = _win_views(sc.reshape(rows, n), W, C, K)
    M = rows * K
    S, M_pad = _pick_groups(M)
    P = jnp.pad(P, ((0, M_pad - M), (0, 0)))
    A = jnp.pad(A, ((0, M_pad - M), (0, 0)))
    off = (np.tile(np.arange(K, dtype=np.int32), rows) * np.int32(C))
    off = np.pad(off, (0, M_pad - M))
    nv_rep = jnp.pad(jnp.repeat(nv_lead.reshape(rows), K), (0, M_pad - M))
    aux = jnp.stack([jnp.asarray(off), nv_rep]).astype(jnp.int32)
    gain = _win_scan_pallas(
        P, A, attack=attack, release=release, groups=S, aux=aux,
        gain=(thresh, ratio, floor), take_abs=True, interpret=interpret)
    # Box over the flat [rows, K*C] bitcast of the window-major gain —
    # chunk kk and kk+1 of a row are temporally adjacent, positions in
    # [nv, K*C) were zeroed in-kernel via ``aux``, and K*C is usually a
    # box-block multiple, so both the [..., :n] truncation copy and the
    # box kernel's input pad are elided; the trailing clip and slice fuse
    # into the final combine's elementwise pass.
    gain = box_smooth_same(gain[:M].reshape(lead + (K * C,)), k)
    gain = jnp.clip(gain[..., :n], floor, 1.0)
    return y3 - sc + sc * gain
