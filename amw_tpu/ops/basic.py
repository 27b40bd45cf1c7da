"""Elementwise / reduction DSP ops (VPU-friendly, fully fused by XLA).

Layout convention for the whole framework: audio is ``f32[..., N]`` with time
on the LAST axis and channels (and batch) on leading axes — channel-major, the
transpose of the reference's ``(samples, channels)``.  The host I/O layer
converts at the boundary.

Reference citations: backend/app/pipeline.py —
``remove_dc_offset`` :134, ``remove_intersample_peaks`` :141,
``apply_output_edge_fade_in`` :152, ``_apply_limiter_numpy`` :276,
``_compress_soft_knee`` :282, ``apply_maximizer`` :484,
``apply_maximizer_lookahead`` :548, ``apply_parallel_compression`` :1771,
``_auto_blank_end`` :902, ``_exciter_saturate`` :1179, finalize clip :1904.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAXIMIZER_MARGIN_DB, MAXIMIZER_THRESHOLD_DB


def db_to_lin(db):
    return 10.0 ** (db / 20.0)


def remove_dc_offset(x: jax.Array) -> jax.Array:
    """Per-channel mean subtraction (channels = all leading axes).

    Under a bucket-padded graph the mean must be taken over the *valid*
    samples (reference pipeline.py:134-138 averages the exact track): the
    stage-loop invariant keeps padding at zero, so the sum already covers
    only the valid region — divide by ``n_valid`` instead of the bucket
    length (the SP path does the same via psum, parallel/timeshard.py)."""
    from . import validctx

    nv = validctx.n_valid()
    if nv is None:
        return x - jnp.mean(x, axis=-1, keepdims=True)
    denom = jnp.maximum(nv, 1).astype(x.dtype)
    return x - jnp.sum(x, axis=-1, keepdims=True) / denom


def remove_intersample_peaks(x: jax.Array, headroom_db: float = 0.5) -> jax.Array:
    """Peak-normalize down to -headroom_db if above it, then hard clip.

    The peak is global over channels AND time (reference takes nanmax over the
    whole array).  NaN guards match the reference."""
    x = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
    peak = jnp.max(jnp.abs(x))
    limit = db_to_lin(-headroom_db)
    scale = jnp.where(peak > limit, limit / jnp.maximum(peak, 1e-12), 1.0)
    return jnp.clip(x * scale, -1.0, 1.0)


def remove_dc_then_peak_guard(x: jax.Array,
                              headroom_db: float = 0.5) -> jax.Array:
    """Fused ``remove_dc_offset`` → ``remove_intersample_peaks``
    (pipeline.py:134-149, adjacent at the head of both the v1 pipeline and
    the default v2 chain).

    Algebraic fusion for HBM economy: the unfused pair costs four full
    passes over the track (mean reduce, subtract write, abs-max reduce,
    scale write); computing the per-channel mean/max/min in ONE reduce pass
    and deriving ``max|x - m|`` as ``max(max(x) - m, m - min(x))`` (exact in
    real arithmetic, ≤1 ulp from the sequential form) leaves one reduce +
    one elementwise pass.

    Reference non-finite semantics are preserved exactly.  A non-finite
    value poisons that channel's mean; the reference's ``nan_to_num`` after
    subtraction then maps the channel to: all-zero when the mean is NaN
    (mixed ±inf or NaN present), else ∓1 at every sample that isn't itself
    the poisoning ±inf (finite − (±inf) = ∓inf → ∓1) and 0 at the ±inf
    samples (inf − inf = NaN → 0).  Those ±1 values participate in — and
    dominate — the global peak.  All of this is derived analytically from
    the same (mean, max, min) reductions, so the op stays one reduce + one
    elementwise pass.  Under a padded bucket the reduces anchor at
    ``n_valid`` (mean over the valid samples, max/min masked) like the
    constituent ops."""
    from . import validctx

    nv = validctx.n_valid()
    n = x.shape[-1]
    if nv is None:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        x_max = jnp.max(x, axis=-1, keepdims=True)
        x_min = jnp.min(x, axis=-1, keepdims=True)
    else:
        valid = jnp.arange(n) < nv
        denom = jnp.maximum(nv, 1).astype(x.dtype)
        mean = jnp.sum(x, axis=-1, keepdims=True) / denom
        x_max = jnp.max(jnp.where(valid, x, -jnp.inf), axis=-1, keepdims=True)
        x_min = jnp.min(jnp.where(valid, x, jnp.inf), axis=-1, keepdims=True)
    inf = jnp.asarray(jnp.inf, x.dtype)
    ch_ok = jnp.isfinite(mean)
    mean_pinf = mean == inf
    mean_ninf = mean == -inf
    # Post-nan_to_num per-channel peak: finite channels: max|x - mean|;
    # mean=+inf: 1 iff any sample isn't itself +inf (those map to -1);
    # mean=-inf: symmetric; mean=NaN: channel is all zeros.
    ch_peak = jnp.where(
        ch_ok, jnp.maximum(x_max - mean, mean - x_min),
        jnp.where(mean_pinf, jnp.where(x_min < inf, 1.0, 0.0),
                  jnp.where(mean_ninf, jnp.where(x_max > -inf, 1.0, 0.0),
                            0.0)))
    peak = jnp.max(ch_peak)
    limit = db_to_lin(-headroom_db)
    scale = jnp.where(peak > limit, limit / jnp.maximum(peak, 1e-12), 1.0)
    # Pre-scale values exactly as nan_to_num(x - mean) would produce them.
    z = jnp.where(
        ch_ok, x - mean,
        jnp.where(mean_pinf,
                  jnp.where(jnp.isnan(x) | (x == inf), 0.0, -1.0),
                  jnp.where(mean_ninf,
                            jnp.where(jnp.isnan(x) | (x == -inf), 0.0, 1.0),
                            0.0)))
    return jnp.clip(z * scale, -1.0, 1.0)


def output_edge_fade_in(x: jax.Array, sr: int, fade_ms: float = 6.0) -> jax.Array:
    """Linear fade-in over ~6 ms at track start (anti-click)."""
    n = x.shape[-1]
    if fade_ms <= 0 or sr <= 0 or n == 0:
        return x
    n_fade = int(round(sr * (fade_ms / 1000.0)))
    n_fade = max(2, min(n_fade, int(sr * 0.1)))
    n_fade = min(n_fade, n)
    ramp = jnp.linspace(0.0, 1.0, n_fade, dtype=x.dtype)
    ramp = jnp.concatenate([ramp, jnp.ones((n - n_fade,), x.dtype)])
    return x * ramp


def limiter(x: jax.Array, threshold_db: float = -1.0) -> jax.Array:
    lim = db_to_lin(threshold_db)
    return jnp.clip(x, -lim, lim)


def compress_soft_knee(
    x: jax.Array,
    threshold_db: float = -18.0,
    ratio: float = 2.5,
    knee_db: float = 6.0,
    max_upward_boost_db: float = 12.0,
) -> jax.Array:
    """Static (memoryless) soft-knee compressor/expander.

    ratio > 1: downward compression with a linear-domain soft knee;
    ratio < 1: bounded upward boost of quiet material; ratio == 1: bypass.
    Knee interpolation and all special cases mirror pipeline.py:282-330.
    """
    if ratio <= 0.0 or ratio == 1.0:
        return x
    thresh = db_to_lin(threshold_db)
    abs_x = jnp.abs(x)
    sign = jnp.sign(x)

    if ratio < 1.0:
        eps = 1e-12
        level_db = jnp.where(
            abs_x > eps, 20.0 * jnp.log10(jnp.maximum(abs_x, eps)), -100.0
        )
        boost_db = (threshold_db - level_db) * (1.0 - ratio)
        boost_db = jnp.clip(boost_db, 0.0, max(0.1, float(max_upward_boost_db)))
        out_abs = jnp.clip(abs_x * db_to_lin(boost_db), 0.0, 1.0)
        return sign * out_abs

    knee_db = max(0.0, float(knee_db))
    if knee_db < 0.5:
        excess = jnp.maximum(abs_x - thresh, 0.0)
        out_abs = jnp.minimum(abs_x, thresh + excess / ratio)
        return sign * out_abs
    lower = thresh * db_to_lin(-knee_db)
    upper = thresh * db_to_lin(knee_db)
    knee_slope = (thresh + (upper - thresh) / ratio - lower) / (upper - lower)
    out_abs = jnp.where(
        abs_x <= lower,
        abs_x,
        jnp.where(
            abs_x >= upper,
            thresh + (abs_x - thresh) / ratio,
            lower + (abs_x - lower) * knee_slope,
        ),
    )
    out_abs = jnp.maximum(out_abs, 0.0)
    return sign * out_abs


def maximizer(x: jax.Array) -> jax.Array:
    """Soft-knee maximizer: threshold -2.5 dB, ceiling -0.3 dB."""
    ceiling = db_to_lin(MAXIMIZER_MARGIN_DB)
    thresh = db_to_lin(MAXIMIZER_THRESHOLD_DB)
    abs_x = jnp.abs(x)
    sign = jnp.sign(x)
    out_abs = jnp.where(
        abs_x <= thresh,
        abs_x,
        thresh + (abs_x - thresh) * (ceiling - thresh) / (1.0 - thresh),
    )
    return sign * jnp.minimum(out_abs, ceiling)


def maximizer_lookahead(x: jax.Array, sr: int, lookahead_ms: float = 6.0) -> jax.Array:
    """6 ms-lookahead maximizer with a 2 ms crossfade splice at the boundary
    (pipeline.py:548-573).  ``x``: [..., N]."""
    n = x.shape[-1]
    delay_n = int(sr * (lookahead_ms / 1000.0))
    if delay_n <= 0 or delay_n >= n:
        return maximizer(x)
    delayed = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (delay_n,), x.dtype), x[..., :-delay_n]], axis=-1
    )
    limited = maximizer(delayed)
    out = jnp.concatenate([x[..., :delay_n], limited[..., delay_n:]], axis=-1)
    cf = min(delay_n, max(2, int(sr * 0.002)))
    # Crossfade region indices delay_n-cf .. delay_n-1 with weight a=(i+1)/cf.
    t = jnp.arange(n)
    a = jnp.clip((t - (delay_n - cf) + 1) / float(cf), 0.0, 1.0)
    in_region = (t >= delay_n - cf) & (t < delay_n)
    blend = jnp.where(in_region, (1.0 - a) * x + a * limited, out)
    return blend


def parallel_compression(
    x: jax.Array,
    mix: float = 0.3,
    ratio: float = 8.0,
    threshold_db: float = -20.0,
) -> jax.Array:
    """New York compression: blend of hard-compressed signal with the dry."""
    mix = float(min(max(mix, 0.0), 1.0))
    if mix < 0.01:
        return x
    compressed = compress_soft_knee(
        x, threshold_db=threshold_db, ratio=ratio, knee_db=6.0, max_upward_boost_db=0.0
    )
    return jnp.clip(x * (1.0 - mix) + compressed * mix, -1.0, 1.0)


def exciter_saturate(x: jax.Array, mode: str, k: float = 2.0) -> jax.Array:
    """Waveshaper curves (pipeline.py:1179-1197)."""
    x = jnp.clip(x, -1.0, 1.0)
    if mode == "transistor":
        return x - (x ** 3) / 3.0
    if mode == "tape":
        return jnp.tanh(k * x) / (k + 1e-8)
    if mode == "tube":
        return x + 0.3 * (x ** 2)
    if mode == "warm":
        return 0.5 * (jnp.tanh(k * x) / (k + 1e-8) + x + 0.3 * (x ** 2))
    if mode == "digital":
        return jnp.where(jnp.abs(x) <= 1.0, x, jnp.sign(x) * (2.0 - jnp.abs(x)))
    return jnp.tanh(k * x) / (k + 1e-8)


def finalize_clip(x: jax.Array) -> jax.Array:
    """End-of-chain scrub: clip to [-1, 1] and replace NaN/Inf."""
    x = jnp.clip(x, -1.0, 1.0)
    return jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)


def auto_blank_end_index(
    x: jax.Array, sr: int, threshold_dbfs: float = -60.0, min_silence_sec: float = 0.5
):
    """Index to trim trailing silence at (device reduce; host does the slice,
    since the output length is data-dependent).  Mirrors pipeline.py:902-917:
    keep through last sample above threshold plus ``min_silence_sec``."""
    n = x.shape[-1]
    thr = db_to_lin(threshold_dbfs)
    peak = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1))) if x.ndim > 1 else jnp.abs(x)
    above = peak > thr
    any_above = jnp.any(above)
    last = n - 1 - jnp.argmax(above[::-1])
    n_sil = int(sr * min_silence_sec)
    idx = jnp.minimum(n, last + 1 + n_sil)
    return jnp.where(any_above, idx, n)


def validate_stats(x: jax.Array):
    """Device-side stats backing ``validate_mastered_not_silent``
    (pipeline.py:939-962): (all_finite, peak)."""
    return jnp.all(jnp.isfinite(x)), jnp.max(jnp.abs(x))
