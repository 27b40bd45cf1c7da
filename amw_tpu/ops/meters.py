"""Measurement ops: BS.1770 loudness, true peak, correlation, spectrum.

The reference delegates loudness to pyloudnorm (pipeline.py:658-664) — a CPU
reference implementation of ITU-R BS.1770-4.  Here the whole meter is a
jittable JAX graph so that ``normalize_lufs`` can run *inside* the fused
mastering graph: K-weighting as a frequency-domain causal filter, 400 ms /
75 %-overlap block energies via framing reductions, and the two-stage
(-70 LUFS absolute, -10 LU relative) gating as masked reductions.

Block framing reproduces the pyloudnorm indexing: ``numBlocks =
round((T - 0.4)/0.1) + 1``, block ``j`` covering ``[int(0.1*j*sr),
int((0.1*j + 0.4)*sr))`` with energies divided by ``0.4*sr``.  A fast
reshape-based path is used when the grid is uniform (44.1/48/96/192 kHz);
otherwise a gather path reproduces the exact ragged indices.

Note on the timeline/short-term meters: the reference re-runs the K-filter on
every 400 ms segment from zero state (fresh ``pyln.Meter`` per block); we
filter the whole track once and frame afterwards, which differs only by the
filter's settling transient at each segment start (≪0.1 LU for program
material).  The CPU oracle in :mod:`amw_tpu.refimpl` mirrors *our* semantics.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import design
from .fdfilter import lfilter_fd

# Per-channel weights for up to 5 channels (L, R, C, Ls, Rs).
_CHANNEL_GAINS = (1.0, 1.0, 1.0, 1.41, 1.41)
_ABS_GATE_LUFS = -70.0


@functools.lru_cache(maxsize=None)
def k_weight_response(sr: float, nfft: int) -> np.ndarray:
    """Causal K-weighting cascade response on the rFFT grid, packed as
    float32 [2, nbins] real/imag (complex device transfers are unsupported
    on the TPU relay — see ops.zphase.pack_complex)."""
    from .zphase import pack_complex

    H = design.cascade_response(design.k_weighting_ba(sr), nfft)
    return pack_complex(H)


@functools.lru_cache(maxsize=None)
def k_weight_settle(sr: float) -> int:
    return design.settle_len(*design.k_weighting_ba(sr))


@dataclass(frozen=True)
class BlockPlan:
    """Static framing metadata for gated loudness over an N-sample signal."""

    sr: int
    n: int
    n_blocks: int
    uniform: bool
    hop: int           # uniform path: subblock hop (0.1 s)
    sub_per_block: int  # uniform path: subblocks per 400 ms block (4)
    n_sub: int
    l_idx: tuple       # gather path: block start indices
    u_idx: tuple       # gather path: block end indices
    div: float         # energy divisor: 0.4 * sr


def plan_blocks(sr: int, n: int, block_sec: float = 0.4, step_ratio: float = 0.25) -> BlockPlan:
    T = n / sr
    step = block_sec * step_ratio
    n_blocks = int(round((T - block_sec) / step)) + 1
    if n_blocks < 1:
        raise ValueError("Audio must be longer than the 400 ms gating block")
    j = np.arange(n_blocks)
    l_idx = (block_sec * (j * step_ratio) * sr).astype(np.int64)
    u_idx = (block_sec * (j * step_ratio + 1) * sr).astype(np.int64)
    hop = int(round(step * sr))
    L = int(round(block_sec * sr))
    uniform = bool(
        np.all(l_idx == j * hop) and np.all(u_idx == j * hop + L) and L == 4 * hop
    )
    n_sub = (n_blocks - 1) + 4 if uniform else 0
    return BlockPlan(
        sr=sr, n=n, n_blocks=n_blocks, uniform=uniform, hop=hop, sub_per_block=4,
        n_sub=n_sub, l_idx=tuple(int(v) for v in l_idx), u_idx=tuple(int(v) for v in u_idx),
        div=block_sec * sr,
    )


def block_energies(y: jax.Array, plan: BlockPlan) -> jax.Array:
    """Mean-square energy per gating block.  ``y``: [C, N] K-weighted audio.
    Returns [C, n_blocks]."""
    C = y.shape[0]
    # Bound framing to the plan's signal: callers may hand a longer buffer
    # (e.g. the full nfft-length filter output from fused.build_normalize_
    # then_final) whose tail past plan.n is circular-convolution ringout,
    # not audio — it must read as zero padding in truncated-tail blocks.
    y2 = jnp.square(y[..., :plan.n])
    if plan.uniform:
        need = plan.n_sub * plan.hop
        y2p = jnp.pad(y2, ((0, 0), (0, max(0, need - y2.shape[-1]))))[:, :need]
        sub = y2p.reshape(C, plan.n_sub, plan.hop).sum(axis=-1)  # [C, n_sub]
        z = (
            sub[:, 0:plan.n_blocks]
            + sub[:, 1:plan.n_blocks + 1]
            + sub[:, 2:plan.n_blocks + 2]
            + sub[:, 3:plan.n_blocks + 3]
        )
        return z / plan.div
    # Ragged gather path: per-block index matrix with masking.
    l_np = np.asarray(plan.l_idx)
    u_np = np.asarray(plan.u_idx)
    maxlen = int(np.max(u_np - l_np))
    idx = l_np[:, None] + np.arange(maxlen)[None, :]
    mask = (idx < u_np[:, None]) & (idx < plan.n)
    idx = np.minimum(idx, plan.n - 1)
    gathered = y2[:, idx] * mask[None, :, :]
    return gathered.sum(axis=-1) / plan.div


def gated_loudness(z: jax.Array, rel_gate_lu: float = 10.0,
                   block_mask: jax.Array | None = None) -> jax.Array:
    """Two-stage gated integrated loudness from block energies ``z`` [C, J].
    ``block_mask``: optional [J] bool marking blocks that exist for the valid
    track length (bucket padding support).  Returns a scalar (LUFS);
    -inf-like (-1e9) when everything is gated."""
    C, J = z.shape
    g = jnp.asarray(_CHANNEL_GAINS[:C] if C <= 5 else (1.0,) * C, z.dtype)
    zsum = jnp.einsum("c,cj->j", g, z)
    l_j = -0.691 + 10.0 * jnp.log10(jnp.maximum(zsum, 1e-30))

    m1 = l_j > _ABS_GATE_LUFS
    if block_mask is not None:
        m1 = m1 & block_mask
    cnt1 = jnp.maximum(m1.sum(), 1)
    z_avg1 = (z * m1[None, :]).sum(axis=1) / cnt1
    gamma_r = -0.691 + 10.0 * jnp.log10(
        jnp.maximum(jnp.einsum("c,c->", g, z_avg1), 1e-30)
    ) - rel_gate_lu

    m2 = m1 & (l_j > gamma_r)
    cnt2 = jnp.maximum(m2.sum(), 1)
    z_avg2 = (z * m2[None, :]).sum(axis=1) / cnt2
    lufs = -0.691 + 10.0 * jnp.log10(
        jnp.maximum(jnp.einsum("c,c->", g, z_avg2), 1e-30)
    )
    return jnp.where(m2.any(), lufs, -1e9)


def k_weight_filter(x: jax.Array, Hk: jax.Array, nfft: int,
                    pallas_tables=None) -> jax.Array:
    """K-weighted signal (causal, zero state).  ``Hk``: packed [2, nbins]
    planes, or — when ``pallas_tables`` is given — the PERMUTED full
    response [2, nfft] for the staged Pallas FFT."""
    if pallas_tables is not None:
        from . import fft_pallas as fp

        return fp.apply_response(x, Hk, nfft, tables=pallas_tables,
                                 n_out=x.shape[-1])
    return lfilter_fd(x, jax.lax.complex(Hk[0], Hk[1]), nfft)


def integrated_lufs(x: jax.Array, Hk: jax.Array, nfft: int, plan: BlockPlan,
                    n_valid: jax.Array | None = None,
                    yk: jax.Array | None = None) -> jax.Array:
    """Integrated loudness of ``x`` [C, N].  ``Hk``: packed K-weighting
    response (float32 [2, nbins]).  With ``n_valid`` (traced sample count),
    ``x`` may be zero-padded to the static N: blocks beyond the valid
    length's pyloudnorm block count are masked out (padding is silent, so
    retained truncated-tail blocks match the exact-length meter)."""
    y = yk if yk is not None else k_weight_filter(x, Hk, nfft)
    mask = None
    if n_valid is not None:
        # Causal K-weighting ringout past the valid end must read as zero in
        # any truncated-tail gating block (the exact-length meter's signal
        # simply ends there).
        from .validctx import mask_tail

        y = mask_tail(y, n_valid)
        n_blocks_v = jnp.round((n_valid / plan.sr - 0.4) / 0.1) + 1
        mask = jnp.arange(plan.n_blocks) < n_blocks_v
    return gated_loudness(block_energies(y, plan), block_mask=mask)


def normalize_lufs_gain(lufs: jax.Array, target_lufs, max_gain_db: float = 20.0) -> jax.Array:
    """Linear gain to reach ``target_lufs``, clamped to ±20 dB; unity when the
    measurement is invalid (mirrors pipeline.py:644-655 exception path)."""
    delta = jnp.clip(target_lufs - lufs, -max_gain_db, max_gain_db)
    gain = 10.0 ** (delta / 20.0)
    return jnp.where(lufs > -5e8, gain, 1.0)


def build_normalize_lufs(spec, target_lufs: float = -14.0):
    """Op builder: measure integrated loudness in-graph and apply the clamped
    normalization gain (pipeline.py:644-655).  ``x``: [C, N]."""
    settle = k_weight_settle(spec.sr)
    nfft = design.next_fft_size(spec.n + settle)
    plan = plan_blocks(spec.sr, spec.n)
    # target is a runtime parameter so one compiled graph serves any target.
    params = [k_weight_response(spec.sr, nfft), np.float32(target_lufs)]

    def fn(x, params):
        from .validctx import n_valid as _nv

        lufs = integrated_lufs(x, params[0], nfft, plan, n_valid=_nv())
        return x * normalize_lufs_gain(lufs, params[1])

    return params, fn


# ---------------------------------------------------------------------------
# Short-term loudness / timeline / LRA


def segment_starts(n: int, sr: int, block_sec: float, max_points: int) -> np.ndarray:
    """Segment start indices replicating compute_lufs_timeline's stepping
    (pipeline.py:667-697)."""
    duration = n / sr
    block_samples = int(sr * block_sec)
    if duration <= block_sec or n < block_samples:
        return np.zeros((0,), np.int64)
    n_points = min(max_points, max(1, int((duration - block_sec) / (block_sec * 0.25)) + 1))
    step_sec = (duration - block_sec) / max(n_points - 1, 1)
    step_samples = int(sr * step_sec)
    starts = []
    pos = 0
    while pos + block_samples <= n and len(starts) < max_points:
        starts.append(pos)
        pos += step_samples
        if step_samples <= 0:
            break
    return np.asarray(starts, np.int64)


def timeline_lufs(
    x: jax.Array, Hk: jax.Array, nfft: int, sr: int,
    block_sec: float = 0.4, max_points: int = 300,
    yk: jax.Array | None = None,
) -> jax.Array:
    """Per-segment loudness (single-block integrated ≈ K-weighted power with
    absolute gate).  Returns [n_points] LUFS values (-1e9 where gated)."""
    n = x.shape[-1]
    starts = segment_starts(n, sr, block_sec, max_points)
    y = yk if yk is not None else k_weight_filter(x, Hk, nfft)
    block_samples = int(sr * block_sec)
    if starts.size == 0:
        # Track shorter than one block: single integrated measurement region.
        z = jnp.square(y).sum(axis=-1, keepdims=True) / max(n, 1)
        return gated_loudness(z)[None]
    idx = starts[:, None] + np.arange(block_samples)[None, :]
    seg = jnp.square(y)[:, idx]  # [C, P, B]
    z = seg.sum(axis=-1) / float(block_samples)  # mean square per segment
    C = z.shape[0]
    g = jnp.asarray(_CHANNEL_GAINS[:C] if C <= 5 else (1.0,) * C, z.dtype)
    l_seg = -0.691 + 10.0 * jnp.log10(jnp.maximum(jnp.einsum("c,cp->p", g, z), 1e-30))
    return jnp.where(l_seg > _ABS_GATE_LUFS, l_seg, -1e9)


def timeline_lufs_masked(
    x: jax.Array, Hk: jax.Array, nfft: int, sr: int, n_valid: jax.Array,
    block_sec: float = 0.4, max_points: int = 300,
    yk: jax.Array | None = None,
):
    """Valid-length-masked timeline for bucket-padded input.

    Returns ``(l_seg [max_points], valid [max_points])``: per-segment
    loudness (-1e9 where gated) and whether the segment exists for the valid
    track length.  Segment stepping reproduces compute_lufs_timeline's
    arithmetic with the duration as a traced value.
    """
    n_pad = x.shape[-1]
    y = yk if yk is not None else k_weight_filter(x, Hk, nfft)
    block_samples = int(sr * block_sec)
    duration = n_valid / sr
    n_points = jnp.clip(
        jnp.floor((duration - block_sec) / (block_sec * 0.25)).astype(jnp.int32) + 1,
        1, max_points)
    step_sec = (duration - block_sec) / jnp.maximum(n_points - 1, 1)
    step_samples = jnp.maximum((sr * step_sec).astype(jnp.int32), 1)
    k = jnp.arange(max_points)
    starts = k * step_samples
    valid = starts + block_samples <= n_valid
    idx = jnp.minimum(starts[:, None] + jnp.arange(block_samples)[None, :],
                      n_pad - 1)
    seg = jnp.square(y)[:, idx]  # [C, P, B]
    z = seg.sum(axis=-1) / float(block_samples)
    C = z.shape[0]
    g = jnp.asarray(_CHANNEL_GAINS[:C] if C <= 5 else (1.0,) * C, z.dtype)
    l_seg = -0.691 + 10.0 * jnp.log10(
        jnp.maximum(jnp.einsum("c,cp->p", g, z), 1e-30))
    l_seg = jnp.where((l_seg > _ABS_GATE_LUFS) & valid, l_seg, -1e9)
    return l_seg, valid


def spectrum_bars_masked(x: jax.Array, sr: int, n_valid: jax.Array,
                         n_fft: int = 4096, **kw) -> jax.Array:
    """Spectrum bars with the analysis frame centered at the *valid*
    midpoint of a bucket-padded track."""
    mono = x.mean(axis=0) if x.ndim > 1 else x
    n_pad = mono.shape[-1]
    start = jnp.clip(n_valid // 2 - n_fft // 2, 0, max(n_pad - n_fft, 0))
    frame = jax.lax.dynamic_slice_in_dim(mono, start, n_fft, axis=-1)
    return _bars_from_frame(frame, sr, n_fft, **kw)


def vectorscope_points_masked(x: jax.Array, n_valid: jax.Array,
                              max_points: int = 1000):
    """(points [P, 2], valid [P]) decimated over the valid region only."""
    n_pad = x.shape[-1]
    step = jnp.maximum(n_valid // max_points, 1)
    idx = jnp.arange(max_points) * step
    valid = idx < n_valid
    idx = jnp.minimum(idx, n_pad - 1)
    pts = jnp.stack([x[0][idx], x[1][idx]], axis=-1)
    return jnp.clip(pts, -1.0, 1.0), valid


def loudness_range_lu(timeline: jax.Array) -> jax.Array:
    """LRA estimate: p95 - p10 of valid 3 s short-term values
    (routers/tools.py:56-65)."""
    valid = timeline > -70.0
    cnt = valid.sum()
    # jnp.percentile has no masked variant: sort with invalid pushed to +inf,
    # then index the valid prefix on percentile positions.
    big = jnp.where(valid, timeline, jnp.inf)
    s = jnp.sort(big)
    m = jnp.maximum(cnt - 1, 0).astype(jnp.float32)

    def pick(q):
        pos = q / 100.0 * m
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.ceil(pos).astype(jnp.int32)
        frac = pos - lo
        return s[lo] * (1 - frac) + s[hi] * frac

    lra = jnp.maximum(0.0, pick(95.0) - pick(10.0))
    return jnp.where(cnt >= 2, lra, 0.0)


# ---------------------------------------------------------------------------
# True peak (4x oversampled)


@functools.lru_cache(maxsize=None)
def _resample_poly_taps(up: int, down: int) -> np.ndarray:
    """FIR taps replicating scipy.signal.resample_poly's default design
    (kaiser beta=5.0, half length 10*max_rate), scaled by ``up``."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0))
    return (h * up).astype(np.float64)


def oversample4(x: jax.Array) -> jax.Array:
    """4x polyphase-equivalent oversampling matching
    ``scipy.signal.resample_poly(x, 4, 1)`` (routers/tools.py:44-53)."""
    n = x.shape[-1]
    taps = _resample_poly_taps(4, 1)
    half = (len(taps) - 1) // 2
    # Zero-stuff then FFT-convolve; slice compensates the FIR group delay.
    up = jnp.zeros(x.shape[:-1] + (n, 4), x.dtype).at[..., 0].set(x)
    up = up.reshape(x.shape[:-1] + (4 * n,))
    nfft = design.next_fft_size(4 * n + len(taps))
    h = jnp.asarray(taps, x.dtype)
    y = jnp.fft.irfft(
        jnp.fft.rfft(up, n=nfft, axis=-1) * jnp.fft.rfft(h, n=nfft), n=nfft, axis=-1
    )
    return y[..., half:half + 4 * n]


def true_peak_dbfs(x: jax.Array) -> jax.Array:
    ups = oversample4(x)
    peak = jnp.max(jnp.abs(ups))
    return 20.0 * jnp.log10(jnp.maximum(peak, 1e-12))


# ---------------------------------------------------------------------------
# Stereo correlation / vectorscope / spectrum bars


def stereo_correlation(x: jax.Array, n_valid=None) -> jax.Array:
    """Pearson correlation of L/R (pipeline.py:766-791).  ``x``: [2, N].
    Zero padding beyond ``n_valid`` leaves every sum unchanged, so masking
    reduces to using the valid count in the formula."""
    left = x[0].astype(jnp.float32)
    right = x[1].astype(jnp.float32)
    n = left.shape[0] if n_valid is None else n_valid
    sum_l = left.sum()
    sum_r = right.sum()
    sum_lr = (left * right).sum()
    sum_l2 = (left * left).sum()
    sum_r2 = (right * right).sum()
    num = n * sum_lr - sum_l * sum_r
    den = jnp.sqrt(jnp.maximum(n * sum_l2 - sum_l ** 2, 0.0)) * jnp.sqrt(
        jnp.maximum(n * sum_r2 - sum_r ** 2, 0.0)
    )
    r = jnp.clip(num / jnp.maximum(den, 1e-20), -1.0, 1.0)
    # Degenerate cases resolved host-side (reference returns None / 0.0).
    return jnp.where(den < 1e-20, 0.0, r)


def spectrum_bars(
    x: jax.Array, sr: int, n_fft: int = 4096, n_bars: int = 64,
    min_hz: float = 20.0, max_hz: float = 20000.0,
) -> jax.Array:
    """64 log-spaced dB bars from one Hann-windowed frame at the track
    midpoint (pipeline.py:700-739).  ``x``: [C, N] (mono-averaged)."""
    mono = x.mean(axis=0) if x.ndim > 1 else x
    n = mono.shape[-1]
    start = max(0, n // 2 - n_fft // 2)
    frame = jax.lax.dynamic_slice_in_dim(mono, start, n_fft, axis=-1)
    return _bars_from_frame(frame, sr, n_fft, n_bars, min_hz, max_hz)


def _bars_from_frame(frame, sr: int, n_fft: int, n_bars: int = 64,
                     min_hz: float = 20.0, max_hz: float = 20000.0):
    window = jnp.asarray(np.hanning(n_fft), frame.dtype)
    spec = jnp.fft.rfft(frame * window)
    mag = jnp.abs(spec) * (2.0 / n_fft)
    nyq = sr / 2.0
    n_bins = n_fft // 2 + 1
    bars = []
    for b in range(n_bars):
        f_lo = min_hz * (max_hz / min_hz) ** (b / max(n_bars - 1, 1))
        f_hi = min_hz * (max_hz / min_hz) ** ((b + 1) / max(n_bars - 1, 1))
        k0 = max(0, int((f_lo / nyq) * (n_fft // 2)))
        k1 = min(n_bins - 1, int(np.ceil((f_hi / nyq) * (n_fft // 2))))
        if k0 > k1:
            bars.append(jnp.asarray(1e-12, mag.dtype))
        else:
            bars.append(jnp.max(mag[k0:k1 + 1]))
    peak = jnp.stack(bars)
    return 20.0 * jnp.log10(jnp.maximum(peak, 1e-12))


def vectorscope_points(x: jax.Array, max_points: int = 1000) -> jax.Array:
    """Decimated L/R Lissajous points [P, 2] (pipeline.py:742-763)."""
    n = x.shape[-1]
    step = max(1, n // max_points)
    idx = np.arange(0, n, step)[:max_points]
    pts = jnp.stack([x[0][idx], x[1][idx]], axis=-1)
    return jnp.clip(pts, -1.0, 1.0)
