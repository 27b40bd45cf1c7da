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


def _env_pallas(wm: jax.Array, attack: float, release: float,
                skip: int = 0) -> jax.Array:
    """Pallas TPU kernel for the envelope recurrence.

    ``wm``: [M, T] windows in their NATURAL layout (sequences on sublanes,
    time on lanes; M a multiple of 128, T a multiple of the time block).
    Each block is transposed to time-major IN-KERNEL via an identity
    matmul on the MXU (exact at Precision.HIGHEST — every output is a
    single product by 1.0), the recurrence runs over the TB time rows with
    the state carried in a VMEM scratch row, and the result is transposed
    back before the store.  An earlier variant required a pre-transposed
    [T, M] input; the XLA transpose of the ~1 GB window array cost ~75 ms
    at batch 8 — 7x the kernel itself.

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
    assert T % TB == 0 and M % 128 == 0 and 0 <= skip < T // TB
    hi = jax.lax.Precision.HIGHEST

    def tdot(a, b):  # out[i, j] = sum_s a[s, i] b[s, j]  (= a.T @ b)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)

    def kernel(x_ref, i128_ref, itb_ref, o_ref, xt_ref, ot_ref, e_ref):
        t_block = pl.program_id(1)
        xt_ref[...] = tdot(x_ref[...], i128_ref[...])  # [TB, 128]

        @pl.when(t_block == 0)
        def _():
            # env[0] = v[0]: both branches of the recurrence fix e=v there.
            e_ref[0:1, :] = xt_ref[0:1, :]

        U = 8  # unrolled steps per fori iteration (TB % U == 0)

        def body(j, e):  # all values kept 2-D (1, 128) for Mosaic layouts
            for u in range(U):
                row = xt_ref[pl.ds(j * U + u, 1), :]
                coef = jnp.where(row > e, attack, release)
                e = coef * e + (1.0 - coef) * row
                ot_ref[pl.ds(j * U + u, 1), :] = e
            return e

        e = jax.lax.fori_loop(0, TB // U, body, e_ref[0:1, :])
        e_ref[0:1, :] = e
        o_ref[...] = tdot(ot_ref[...], itb_ref[...])  # [128, TB]

    def out_index(m, t):
        return (m, jnp.maximum(t - skip, 0))

    return pl.pallas_call(
        kernel,
        grid=(M // 128, T // TB),
        in_specs=[
            pl.BlockSpec((128, TB), lambda m, t: (m, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda m, t: (0, 0)),
            pl.BlockSpec((TB, TB), lambda m, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((128, TB), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, T - skip * TB), wm.dtype),
        scratch_shapes=[pltpu.VMEM((TB, 128), wm.dtype),
                        pltpu.VMEM((TB, 128), wm.dtype),
                        pltpu.VMEM((1, 128), wm.dtype)],
    )(wm, jnp.eye(128, dtype=wm.dtype), jnp.eye(TB, dtype=wm.dtype))


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
        wm = windows.reshape(M, Tw)  # natural layout — no transpose
        wm = jnp.pad(wm, ((0, M_pad - M), (0, T_pad - Tw)))
        out = _env_pallas(wm, attack, release)
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
    to within ``eps`` (chunk 0 exactly)."""
    n = v.shape[-1]
    if n == 0:
        return v
    W = warmup_len(attack_coef, release_coef, eps)

    if n <= max(2 * W, 2 * min_chunk):
        # Short signal (or long time constants): single sequential pass.
        env = _env_blocks(v[..., None, :], attack_coef, release_coef, unroll)
        return env[..., 0, :]

    # Window k = W-sample warm-up prefix (tail of chunk k-1) + chunk k.
    # Built as K contiguous lane slices of one extended buffer — measured
    # 3.8 ms vs 20.4 ms for the strided-concat formulation at [16, 7.9M]
    # on v5e (XLA lowers a concat of two strided views into a generic copy
    # loop; contiguous slices stay at copy bandwidth).  The chunk is sized
    # as large as possible while keeping ~128 parallel sequences (rows × K)
    # for the Pallas kernel's lane tiles, so the warm-up overlap costs
    # ~(C+W)/C ≈ 1.1-1.6x of the data rather than the 2x a chunk==warmup
    # scheme costs.
    rows = int(np.prod(v.shape[:-1])) if v.ndim > 1 else 1
    k_target = max(1, -(-128 // max(rows, 1)))
    TB = 512
    # W and C rounded to the kernel's time block so the trimmed-output
    # kernel can drop the warm-up region by block index (no XLA slice).
    W = -(-W // TB) * TB
    C = -(-max(W, min_chunk, -(-n // k_target)) // TB) * TB
    K = -(-n // C)  # ceil
    pad = K * C - n
    # Left warm-up: v[0] repeated (fixed point => exact chunk 0); right
    # padding: edge value (outputs discarded).
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
    if _use_pallas():
        M = rows * K
        M_pad = -(-M // 128) * 128
        wm = windows.reshape(M, W + C)
        wm = jnp.pad(wm, ((0, M_pad - M), (0, 0)))
        env = _env_pallas(wm, attack_coef, release_coef,
                          skip=W // TB)[:M]  # [M, C]: warm-up dropped
        env = env.reshape(v.shape[:-1] + (K * C,))
        return env[..., :n]
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
# Fully fused de-esser tail: envelope -> gain -> box smoothing -> combine
# ---------------------------------------------------------------------------
#
# The de-esser (reference pipeline.py:1200-1264) ends with
#
#   env    = envelope_follower(|sc|)
#   gain   = clip(reduction(env) / env, 0.35, 1)
#   gain   = clip(box_k(mask_tail(gain)), 0.35, 1)     # ~1.5 ms boxcar
#   out    = y3 - sc + sc * gain
#
# Composed from the individual ops this costs ~6 extra full-track HBM
# passes after the envelope kernel (gain write+read, pallas box
# read+write, combine 3 reads + 1 write).  Here the whole tail runs
# inside the envelope Pallas kernel: it reads the SIGNED sidechain
# windows and the dry signal, carries the previous gain blocks in VMEM
# for the centered box (one extra lookahead time-block per window), and
# writes the finished audio.  HBM traffic: read sc-windows (~1.1x) +
# read y3 (1x) + write out (1x).
#
# Box semantics match ops.fdfilter.box_smooth_same(validctx.mask_tail(g)):
# gain contributions at global positions outside [0, n_valid) are zero
# (the 'same' convolution's zero padding / the padded-bucket tail mask) —
# enforced in-kernel by masking each gain block with its global sample
# index before it enters the box window.


def _deesser_pallas(wm, y3w, aux, *, attack, release, thresh, ratio, k,
                    floor, skip, interpret=False):
    """Pallas kernel: windows of SIGNED sidechain ``wm`` [M, W + C + TB],
    dry blocks ``y3w`` [M, C], aux int32 [2, M] (row 0: global offset of
    each window's kept region; row 1: n_valid broadcast).  Returns
    ``y3 + sc * (gain - 1)`` as [M, C].

    Grid (m, t) with t fastest; output for time-block t-1 is written while
    block t's gain is computed (the box needs h = k//2 lookahead samples),
    so each window carries one extra trailing time-block whose gain is
    used only as right-context."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, T = wm.shape
    TB = 512
    h = k // 2
    HB = -(-h // 8) * 8  # carried gain-tail rows (sublane-aligned)
    assert T % TB == 0 and M % 128 == 0 and HB <= TB
    C = T - (skip + 1) * TB
    assert C > 0 and C % TB == 0 and y3w.shape == (M, C)
    cb = C // TB
    hi = jax.lax.Precision.HIGHEST
    inv_k = 1.0 / k

    def tdot(a, b):  # out[i, j] = sum_s a[s, i] b[s, j]  (= a.T @ b)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)

    def kernel(x_ref, y3_ref, aux_ref, i128_ref, itb_ref, o_ref,
               xt_ref, g_ref, gp_ref, gt_ref, bb_ref, xn_ref, e_ref):
        t_block = pl.program_id(1)
        # |sc| time-major via in-kernel MXU transpose (see _env_pallas).
        xt_ref[...] = jnp.abs(tdot(x_ref[...], i128_ref[...]))  # [TB, 128]

        @pl.when(t_block == 0)
        def _():
            e_ref[0:1, :] = xt_ref[0:1, :]

        U = 8

        def body(j, e):
            for u in range(U):
                row = xt_ref[pl.ds(j * U + u, 1), :]
                coef = jnp.where(row > e, attack, release)
                e = coef * e + (1.0 - coef) * row
                g_ref[pl.ds(j * U + u, 1), :] = e
            return e

        e = jax.lax.fori_loop(0, TB // U, body, e_ref[0:1, :])
        e_ref[0:1, :] = e

        # Gain from the envelope, vectorized over the block; zero outside
        # the window's valid global range (mask_tail + 'same' zero pad).
        env = g_ref[...]
        red = jnp.where(env > thresh, thresh + (env - thresh) / ratio, env)
        g = jnp.where(env > 1e-10, red / (env + 1e-12), 1.0)
        g = jnp.clip(g, floor, 1.0)
        gidx = (aux_ref[0:1, :]
                + (t_block - skip) * TB
                + jax.lax.broadcasted_iota(jnp.int32, (TB, 128), 0))
        g = jnp.where((gidx >= 0) & (gidx < aux_ref[1:2, :]), g, 0.0)
        g_ref[...] = g

        # Box for the PREVIOUS block: context rows [TB-h, TB+h) around it
        # live in gt (tail of t-2), gp (t-1) and g (head of t).
        bb_ref[0:HB, :] = gt_ref[...]
        bb_ref[HB:HB + TB, :] = gp_ref[...]
        bb_ref[HB + TB:HB + TB + HB, :] = g_ref[0:HB, :]
        acc = bb_ref[HB - h:HB - h + TB, :]
        for d in range(1, k):
            acc = acc + bb_ref[HB - h + d:HB - h + d + TB, :]
        box = jnp.clip(acc * inv_k, floor, 1.0)
        gn = tdot(box, itb_ref[...])  # [128, TB] natural layout
        o_ref[...] = y3_ref[...] + xn_ref[...] * (gn - 1.0)

        # Carries for the next step (garbage at t=0/1 lands in clobbered
        # warm-up output blocks).
        gt_ref[...] = gp_ref[TB - HB:TB, :]
        gp_ref[...] = g_ref[...]
        xn_ref[...] = x_ref[...]

    def out_index(m, t):
        return (m, jnp.clip(t - 1 - skip, 0, cb - 1))

    return pl.pallas_call(
        kernel,
        grid=(M // 128, T // TB),
        in_specs=[
            pl.BlockSpec((128, TB), lambda m, t: (m, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, TB), out_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda m, t: (0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda m, t: (0, 0)),
            pl.BlockSpec((TB, TB), lambda m, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((128, TB), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), wm.dtype),
        scratch_shapes=[pltpu.VMEM((TB, 128), wm.dtype),
                        pltpu.VMEM((TB, 128), wm.dtype),
                        pltpu.VMEM((TB, 128), wm.dtype),
                        pltpu.VMEM((HB, 128), wm.dtype),
                        pltpu.VMEM((TB + 2 * HB, 128), wm.dtype),
                        pltpu.VMEM((128, TB), wm.dtype),
                        pltpu.VMEM((1, 128), wm.dtype)],
        interpret=interpret,
    )(wm, y3w, aux, jnp.eye(128, dtype=wm.dtype),
      jnp.eye(TB, dtype=wm.dtype))


def deesser_gain_combine(y3, sc, attack, release, thresh, ratio, k, *,
                         floor=0.35, nv=None, eps=1e-8, min_chunk=16384,
                         force_pallas=None, interpret=False):
    """``y3 - sc + sc * gain`` with the de-esser's smoothed gain curve,
    fused into one Pallas pass on TPU (composition of the individual ops
    elsewhere).  ``nv``: traced valid length (None = whole track)."""
    n = y3.shape[-1]
    TB = 512
    use = _use_pallas() if force_pallas is None else force_pallas
    W0 = warmup_len(attack, release, eps)
    h = k // 2
    if (not use or k <= 1 or h > 448 or k >= TB
            or n <= max(2 * W0, 2 * min_chunk, 2 * TB)):
        from .fdfilter import box_smooth_same

        env = envelope_follower(jnp.abs(sc), attack, release,
                                eps=eps, min_chunk=min_chunk)
        red = jnp.where(env > thresh, thresh + (env - thresh) / ratio, env)
        gain = jnp.where(env > 1e-10, red / (env + 1e-12), 1.0)
        gain = jnp.clip(gain, floor, 1.0)
        if nv is not None:
            t = jnp.arange(n)
            gain = jnp.where(t < nv, gain, 0.0)
        gain = box_smooth_same(gain, k)
        gain = jnp.clip(gain, floor, 1.0)
        return y3 - sc + sc * gain

    lead = y3.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    k_target = max(1, -(-128 // max(rows, 1)))
    W = -(-W0 // TB) * TB
    C = -(-max(W, min_chunk, -(-n // k_target)) // TB) * TB
    K = -(-n // C)
    pad = K * C - n
    nv_s = jnp.asarray(n if nv is None else nv, jnp.int32)

    sc2 = sc.reshape(rows, n)
    y32 = y3.reshape(rows, n)
    ext = jnp.concatenate(
        [jnp.broadcast_to(sc2[:, :1], (rows, W)), sc2,
         jnp.broadcast_to(sc2[:, -1:], (rows, pad + TB))], axis=-1)
    windows = jnp.stack(
        [jax.lax.slice_in_dim(ext, kk * C, kk * C + W + C + TB, axis=-1)
         for kk in range(K)], axis=-2)  # [rows, K, W + C + TB]
    M = rows * K
    M_pad = -(-M // 128) * 128
    wm = windows.reshape(M, W + C + TB)
    wm = jnp.pad(wm, ((0, M_pad - M), (0, 0)))
    y3w = jnp.pad(y32, ((0, 0), (0, pad))).reshape(M, C)
    y3w = jnp.pad(y3w, ((0, M_pad - M), (0, 0)))
    off = (np.tile(np.arange(K, dtype=np.int32), rows) * np.int32(C))
    off = np.pad(off, (0, M_pad - M))
    aux = jnp.stack([jnp.asarray(off),
                     jnp.broadcast_to(nv_s, (M_pad,))]).astype(jnp.int32)
    out = _deesser_pallas(
        wm, y3w, aux, attack=attack, release=release, thresh=thresh,
        ratio=ratio, k=k, floor=floor, skip=W // TB, interpret=interpret)
    out = out[:M].reshape(lead + (K * C,))
    return out[..., :n]
