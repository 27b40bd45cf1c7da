"""Valid-length masked meters: bucket padding must not change measurements."""

import numpy as np
import jax.numpy as jnp

from amw_tpu import refimpl
from amw_tpu.models.analyze import analyze, lufs_analyze_tool
from amw_tpu.ops import design, meters

SR = 44100


def _sig(n, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.03 * g.standard_normal(n))
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 0.9 * t))
    return np.clip(np.stack([x * env, 0.82 * x * env]), -1, 1).astype(np.float32)


def test_integrated_lufs_mask_matches_exact():
    n = int(3.7 * SR)
    x = _sig(n)
    n_pad = int(5 * SR)
    xp = np.pad(x, ((0, 0), (0, n_pad - n)))
    settle = meters.k_weight_settle(SR)
    nfft = design.next_fft_size(n_pad + settle)
    Hk = jnp.asarray(meters.k_weight_response(SR, nfft))
    plan = meters.plan_blocks(SR, n_pad)
    got = float(meters.integrated_lufs(jnp.asarray(xp), Hk, nfft, plan,
                                       n_valid=jnp.int32(n)))
    want = refimpl.integrated_lufs(x, SR)
    assert abs(got - want) < 1e-3, (got, want)


def test_analyze_bucketed_matches_oracle_odd_length():
    n = int(3.31 * SR)
    x = _sig(n, seed=4)
    out = analyze(x, SR, extended=True)
    assert out["duration_sec"] == round(n / SR, 3)
    want_lufs = refimpl.integrated_lufs(x, SR)
    assert abs(out["lufs"] - want_lufs) < 0.05
    # timeline has the same segment count as the exact-length formula
    want_tl = refimpl.timeline_lufs(x, SR)
    assert len(out["lufs_timeline"]) == len(want_tl)
    valid_pairs = [(g, w) for g, w in zip(out["lufs_timeline"], want_tl)
                   if g is not None and w > -1e8]
    assert valid_pairs
    for g, w in valid_pairs:
        assert abs(g - w) < 0.05
    # vectorscope decimation follows the valid length
    n_pts = len(out["vectorscope_points"])
    step = max(1, n // 1000)
    assert n_pts == min(1000, -(-n // step))
    # correlation over the valid region only
    want_corr = refimpl.pipeline.np.corrcoef(x[0], x[1])[0, 1]
    assert abs(out["stereo_correlation"] - want_corr) < 1e-3


def test_lufs_tool_bucketed_odd_length():
    n = int(2.63 * SR)
    x = _sig(n, seed=5)
    out = lufs_analyze_tool(x, SR)
    want_tp = refimpl.true_peak_dbfs(x, SR)
    assert abs(out["true_peak_dbfs"] - want_tp) < 0.1
    want_lufs = refimpl.integrated_lufs(x, SR)
    assert abs(out["integrated_lufs"] - want_lufs) < 0.05
