"""4x-oversampled true-peak limiter.

The reference brickwalls at −1.5 dBFS SAMPLE peak (pipeline.py:89
``TRUE_PEAK_LIMIT_DB``) while measuring true peak 4x-oversampled only in
the analyzer (routers/tools.py:44-53) — inter-sample peaks can exceed the
limit on reconstruction.  This optional op enforces a genuine dBTP
ceiling, TPU-style: one FFT-oversampled gain computation plus
log2-doubling sliding windows — no per-sample recurrence, no cumsum
(whose f32 accumulation error at track lengths would swamp the gain).

Algorithm (all fused, no scan):

1. ``up = oversample4(x)`` — the same polyphase-equivalent FFT
   interpolation the TP meter uses (ops/meters.py:356), so the limiter and
   the meter agree on what a true peak is.
2. per-sample needed gain ``g = min(1, c/|up|)`` against a ceiling with
   0.15 dB safety margin (the base-rate gain is interpolated back under
   the 4x grid; the margin covers that approximation), decimated 4->1 by
   group-min (conservative).
3. symmetric sliding MIN over a ±lookahead window (log2 shifted-min
   passes) — every base sample within reach of a peak carries a gain that
   respects it — then a centered power-of-two box average narrower than
   the min window: each averaged value already respects any peak inside
   the window, so the guarantee survives while the gain step becomes a
   ramp.
4. gain applied at the base rate, final safety clip at the ceiling.

Guarantee: output true peak <= ceiling (margin absorbs interpolation
error); bit-exact passthrough when the input already respects the
ceiling with margin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..spec import GraphSpec
from . import validctx
from .meters import oversample4

_MARGIN_DB = 0.15


def _sliding_min_forward(g: jax.Array, w: int) -> jax.Array:
    """m[t] = min(g[t : t+w]) with right edge clamp, via log2 doubling."""
    m = g
    span = 1
    while span < w:
        step = min(span, w - span)
        shifted = jnp.concatenate(
            [m[..., step:], jnp.broadcast_to(m[..., -1:],
                                             m.shape[:-1] + (step,))],
            axis=-1)
        m = jnp.minimum(m, shifted)
        span += step
    return m


def _sliding_min_sym(g: jax.Array, w: int) -> jax.Array:
    """m[t] = min(g[t-w : t+w+1]): forward pass then a mirrored pass."""
    mf = _sliding_min_forward(g, w + 1)
    return jnp.flip(_sliding_min_forward(jnp.flip(mf, -1), w + 1), -1)


def _box_same_pow2(g: jax.Array, B: int) -> jax.Array:
    """Centered width-``B`` (power of two) moving average with edge
    replication — log2(B) shifted adds, f32-stable at any length."""
    half = B // 2
    n = g.shape[-1]
    gp = jnp.concatenate([
        jnp.broadcast_to(g[..., :1], g.shape[:-1] + (half,)),
        g,
        jnp.broadcast_to(g[..., -1:], g.shape[:-1] + (B - half,)),
    ], axis=-1)
    s = gp
    k = 1
    while k < B:
        s = s[..., :-k] + s[..., k:]
        k *= 2
    return s[..., :n] / B


def build_true_peak_limiter(
    spec: GraphSpec,
    ceiling_db: float = -1.5,
    lookahead_ms: float = 1.5,
):
    """(params, fn): fn(x[C, N], params) -> limited [C, N].

    Chain-module/builder signature (models.chain.MODULE_BUILDERS) so it
    slots into custom configs and the engine's pro surface alike.
    Multiplicative (gain <= 1), so bucket padding stays zero — but the
    SMOOTHED gain is edge-sensitive: in a padded bucket the gains computed
    over the zero padding are 1.0, and averaging them into the box window
    near the valid end would *raise* the applied gain above what the
    exact-length graph computes (its edge replication averages the last
    real gain instead) — enough to breach the ceiling when limiting is
    active at the track end.  The builder therefore consults the traced
    ``n_valid`` (ops.validctx) and replicates the last valid gain into the
    padding before the sliding-min/box smoothing, reproducing the
    exact-length graph's edge semantics.
    """
    c_lin = float(10.0 ** ((ceiling_db - _MARGIN_DB) / 20.0))
    limit_sample = float(10.0 ** (ceiling_db / 20.0))
    # Base-rate half-window for the sliding min; the box width is the
    # largest power of two not exceeding it (guarantee needs box <= min
    # window).
    w = max(16, int(round(spec.sr * lookahead_ms / 1000.0)))
    B = 1 << (w.bit_length() - 1)

    def fn(x, params):
        up = oversample4(x)
        env = jnp.max(jnp.abs(up), axis=tuple(range(up.ndim - 1)))  # [4N]
        g = jnp.minimum(1.0, c_lin / jnp.maximum(env, 1e-9))
        gb = g.reshape(g.shape[:-1] + (spec.n, 4)).min(axis=-1)  # [N]
        nv = validctx.n_valid()
        if nv is not None:
            # Bucket padding: pin positions >= n_valid to the last valid
            # gain so min/box smoothing match the exact-length graph's
            # edge replication (padding g=1.0 would dilute the average
            # and lift the tail gain above the ceiling's requirement).
            last = validctx.gather_last(gb, nv)
            gb = jnp.where(jnp.arange(spec.n) < nv, gb, last)
        gb = _sliding_min_sym(gb, w)
        gb = _box_same_pow2(gb, B)
        return jnp.clip(x * gb, -limit_sample, limit_sample)

    return [], fn
