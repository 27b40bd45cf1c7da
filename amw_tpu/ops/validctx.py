"""Trace-time valid-length context for bucket-padded graphs.

Variable track lengths hit a small set of static length buckets (SURVEY §7
"bucketing + masking everywhere"): a track of ``n`` samples is zero-padded to
the bucket length ``spec.n`` and the true length travels as a *traced* scalar
``n_valid``.  Semantics must then be anchored at ``n_valid``, not at the
bucket end — scipy ``filtfilt`` edge handling (odd extension + steady-state
init, reference pipeline.py:36-52), box-smoothing zero edges, BS.1770 block
gating, STFT frame counts — so that the padded graph's output sliced to ``n``
equals the exact-length graph's output to the IR-truncation level.

Rather than threading an extra argument through every op builder, the graph
entry points (models.v2_job / models.pipeline_v1 / models.chain) install the
traced ``n_valid`` in a context variable during tracing; the handful of
edge-sensitive primitives (ops.zphase splices, ops.fdfilter extensions,
ops.meters gating, ops.spectral framing) consult it.  With no context
installed every helper degenerates to the static (bucket-length-is-track-
length) behavior, so unpadded graphs are unchanged.

Invariant maintained by the stage loops: each stage's *input* is zero beyond
``n_valid`` (``mask_tail`` runs between stages), which is what makes causal
and centered-FIR ops automatically padding-invariant.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp

_N_VALID: contextvars.ContextVar = contextvars.ContextVar(
    "amw_n_valid", default=None)


@contextlib.contextmanager
def valid_length(n_valid):
    """Install the traced valid length for the duration of graph tracing.
    ``n_valid=None`` is a no-op (static semantics)."""
    tok = _N_VALID.set(n_valid)
    try:
        yield
    finally:
        _N_VALID.reset(tok)


@contextlib.contextmanager
def cleared():
    """Temporarily clear the context — used around ops applied to *extracted
    edge windows* (whose static ends coincide with the track ends) and
    around fast interior passes (whose outer samples get spliced over)."""
    tok = _N_VALID.set(None)
    try:
        yield
    finally:
        _N_VALID.reset(tok)


def n_valid():
    return _N_VALID.get()


def mask_tail(x: jax.Array, nv=None) -> jax.Array:
    """Zero positions >= n_valid (no-op without a context)."""
    nv = n_valid() if nv is None else nv
    if nv is None:
        return x
    t = jnp.arange(x.shape[-1])
    return jnp.where(t < nv, x, jnp.zeros((), x.dtype))


def right_window(x: jax.Array, w: int, nv=None) -> jax.Array:
    """The ``w`` samples ending at the valid end (static ``x[..., -w:]``
    without a context)."""
    nv = n_valid() if nv is None else nv
    if nv is None:
        return x[..., -w:]
    start = jnp.maximum(nv - w, 0)
    return jax.lax.dynamic_slice_in_dim(x, start, w, axis=-1)


def splice(fast: jax.Array, yl: jax.Array, yr: jax.Array, n: int, L: int,
           nv=None, off: int = 0) -> jax.Array:
    """Edge-window splice anchored at the valid end.

    ``fast``: interior result; ``yl``/``yr``: exact left/right window
    results (only their outer ``L`` samples are used).  Without a context
    this is the static concatenate used by the hybrid strategy.

    ``fast`` may be LONGER than ``n`` (e.g. a full nfft-length Pallas FFT
    output, optionally with a leading odd-extension of ``off`` samples):
    the splice's own slice performs the truncation, so callers skip the
    separate ``[..., off:off+n]`` copy — a full extra HBM round trip of
    the track at [16, 2^23]."""
    nv = n_valid() if nv is None else nv
    if nv is None:
        return jnp.concatenate(
            [yl[..., :L], fast[..., off + L:off + n - L], yr[..., -L:]],
            axis=-1)
    out = jnp.concatenate([yl[..., :L], fast[..., off + L:off + n]],
                          axis=-1)
    start = jnp.maximum(nv - L, L)
    out = jax.lax.dynamic_update_slice_in_dim(out, yr[..., -L:], start,
                                              axis=-1)
    return mask_tail(out, nv)


def gather_last(x: jax.Array, nv) -> jax.Array:
    """``x[..., nv-1:nv]`` with a traced index (keepdims)."""
    idx = jnp.maximum(nv - 1, 0)
    return jax.lax.dynamic_slice_in_dim(x, idx, 1, axis=-1)


def masked_quantile_last(a: jax.Array, q, count) -> jax.Array:
    """Linear-interpolated ``q``-th percentile over the last axis when only
    the first ``count`` slots (after pushing invalid entries to +inf) are
    real.  Mirrors ``jnp.percentile``'s interpolation."""
    s = jnp.sort(a, axis=-1)
    m = jnp.maximum(count - 1, 0).astype(jnp.float32)
    pos = jnp.asarray(q, jnp.float32) / 100.0 * m
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    v_lo = jnp.take_along_axis(
        s, jnp.broadcast_to(lo, s.shape[:-1] + (1,)), axis=-1)
    v_hi = jnp.take_along_axis(
        s, jnp.broadcast_to(hi, s.shape[:-1] + (1,)), axis=-1)
    return v_lo * (1.0 - frac) + v_hi * frac
