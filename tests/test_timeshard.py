"""Sequence-parallel (time-sharded) mastering on the 8-device CPU mesh.

Parity oracle = the single-chip fused v2 job graph (exact mode).  Local
stages run in three window variants (interior / track-start / track-end, see
amw_tpu/parallel/timeshard.py), so the FULL track — edges included — must
match the single-chip graph to <= -90 dBFS."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amw_tpu import refimpl
from amw_tpu.models.v2_job import build_v2_job_graph
from amw_tpu.parallel.mesh import make_mesh
from amw_tpu.parallel.timeshard import sp_master
from amw_tpu.spec import GraphSpec

SR = 44100
HALO = 32768


@pytest.fixture(scope="module")
def track():
    g = np.random.default_rng(3)
    n = 20 * SR
    t = np.arange(n) / SR
    x = (0.25 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 1500 * t)
         + 0.03 * g.standard_normal(n))
    env = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 0.3 * t))
    x = np.clip(np.stack([x * env, 0.85 * x * env]), -0.99, 0.99)
    x = x.astype(np.float32)
    return x - x.mean(axis=-1, keepdims=True)


def _single_chip_v2(track, pro, target=-14.0, style="standard"):
    spec = GraphSpec(sr=SR, n=track.shape[-1], channels=2, exact=True)
    params, fn, _ = build_v2_job_graph(spec, None, pro, target, style)
    return np.asarray(fn(jnp.asarray(track), jax.device_put(params))["out"])


def _full_err(got, want):
    return np.max(np.abs(got.astype(np.float64) - want))


def _interior_err(got, want, edge=HALO):
    return np.max(np.abs(got[:, edge:-edge].astype(np.float64)
                         - want[:, edge:-edge]))


def test_sp_default_v2_matches_single_chip(track):
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, target_lufs=-14.0, style="standard",
                    halo=HALO)
    want = _single_chip_v2(track, {})
    assert got.shape == want.shape
    err = _full_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -90.0, err
    l_got = refimpl.integrated_lufs(got, SR)
    l_want = refimpl.integrated_lufs(want, SR)
    assert abs(l_got - l_want) < 0.02, (l_got, l_want)
    assert np.all(np.isfinite(got))


def test_sp_pro_modules_match_single_chip(track):
    """SP accepts the engine's full pro surface (VERDICT r1 item 4)."""
    pro = {"rumble_enabled": True, "rumble_cutoff": 60.0,
           "deesser_enabled": True,
           "transient_attack": 1.3, "transient_sustain": 0.85,
           "parallel_mix": 0.25, "dynamic_eq_enabled": True}
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, target_lufs=-14.0, style="standard",
                    pro=pro, halo=HALO)
    want = _single_chip_v2(track, pro)
    err = _full_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -90.0, err


@pytest.mark.parametrize("n_dev,dur_sec", [
    (2, 20.0), (4, 20.0), (8, 20.0), (8, 12.7), (4, 15.3)])
def test_sp_denoise_approximate(track, n_dev, dur_sec):
    """The SP denoiser's histogram-quantile noise profile is the one
    documented approximation (timeshard.py header).  Swept over device
    counts 2–8 and track lengths (incl. non-chunk-aligned): the histogram
    is a psum — the GLOBAL histogram exactly — so the profile error is the
    quantile bin width (~0.55 dB), independent of device count; the only
    geometry-dependent term is the per-chunk STFT frame grid.  Explicit
    gate: ≤ −22 dBFS vs the single-chip exact denoiser, at every sweep
    point."""
    n = int(dur_sec * SR)
    x = track[:, :n] - track[:, :n].mean(axis=-1, keepdims=True)
    pro = {"denoise_strength": 0.5}
    mesh = make_mesh(n_dev, axis="sp")
    got = sp_master(x, SR, mesh, target_lufs=-14.0, pro=pro, halo=HALO)
    want = _single_chip_v2(x, pro)
    err = _interior_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -22.0, (n_dev, dur_sec, err)
    assert np.abs(got).max() > 0.05  # not silenced
    l_got = refimpl.integrated_lufs(got, SR)
    l_want = refimpl.integrated_lufs(want, SR)
    assert abs(l_got - l_want) < 0.3, (l_got, l_want)


def test_sp_denoise_histogram_vs_exact_denoiser(track):
    """The REAL `_build_denoise_sp` code path on a single-shard mesh (so
    the STFT frame grid matches the single-chip denoiser exactly) vs the
    exact-percentile `build_spectral_denoise`: the only remaining
    difference is the psum'd histogram quantile, whose resolution is
    (140 dB / 256 bins) ≈ 0.55 dB of noise-profile error.  The Wiener gain
    is clipped to [0.25, 1], so a ±0.55 dB profile error bounds the output
    at well under −34 dBFS vs exact — gate there."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from amw_tpu.ops.spectral import build_spectral_denoise
    from amw_tpu.parallel.timeshard import _build_denoise_sp

    n = 8 * SR
    x = track[:, :n]
    spec = GraphSpec(sr=SR, n=n, channels=2, exact=True)
    mesh = make_mesh(1, axis="sp")
    _, sp_fn = _build_denoise_sp(spec, 0.5, 15.0, "sp")
    mapped = shard_map(lambda a: sp_fn(a, []), mesh=mesh,
                      in_specs=P(None, "sp"), out_specs=P(None, "sp"),
                      check_vma=False)
    got = np.asarray(jax.jit(mapped)(jnp.asarray(x)))

    _, exact_fn = build_spectral_denoise(spec, 0.5, 15.0)
    want = np.asarray(jax.jit(lambda a: exact_fn(a, []))(jnp.asarray(x)))

    err = np.max(np.abs(got.astype(np.float64) - want))
    assert 20 * np.log10(max(err, 1e-12)) < -34.0, err
    # And the output is a genuine denoise, not a bypass.
    assert np.max(np.abs(want - x)) > 1e-3


def test_sp_custom_chain_config(track):
    """Arbitrary chain configs (module subset + amount blend) run under SP."""
    config = {"modules": [
        {"id": "dc_offset", "enabled": True, "amount": 1.0},
        {"id": "peak_guard", "enabled": True, "headroom_db": 0.5, "amount": 1.0},
        {"id": "target_curve", "enabled": True, "phase_mode": "minimum",
         "eq_ms": False, "amount": 0.7},
        {"id": "normalize_lufs", "enabled": True, "target_lufs": -13.0,
         "amount": 1.0},
        {"id": "style_eq", "enabled": True, "style": "hiphop", "amount": 1.0},
        {"id": "peak_guard", "enabled": True, "headroom_db": 0.5, "amount": 1.0},
    ]}
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, chain_config=config, target_lufs=-13.0,
                    style="hiphop", halo=HALO)
    spec = GraphSpec(sr=SR, n=track.shape[-1], channels=2, exact=True)
    params, fn, _ = build_v2_job_graph(spec, config, {}, -13.0, "hiphop")
    want = np.asarray(fn(jnp.asarray(track), jax.device_put(params))["out"])
    err = _full_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -90.0, err


def test_sp_ragged_track_end_exact(track):
    """A track length that does NOT chunk-align: the track end lands
    mid-chunk on the last shard, exercising the right-edge window with
    lv < chunk — still full-track exact."""
    n = track.shape[-1] - 4410 * 3 - 123
    ragged = track[:, :n] - track[:, :n].mean(axis=-1, keepdims=True)
    mesh = make_mesh(8, axis="sp")
    got = sp_master(ragged, SR, mesh, target_lufs=-14.0, style="standard",
                    halo=HALO)
    want = _single_chip_v2(ragged, {})
    err = _full_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -90.0, err


def test_sp_reverb_ir_exceeding_halo_rejected(track):
    from amw_tpu.parallel.timeshard import build_sp_master

    config = {"modules": [
        {"id": "reverb", "enabled": True, "reverb_type": "cathedral",
         "decay_sec": 8.0, "mix": 0.3, "amount": 1.0},
    ]}
    mesh = make_mesh(8, axis="sp")
    with pytest.raises(ValueError, match="halo"):
        build_sp_master(SR, track.shape[-1], 2, mesh, chain_config=config,
                        halo=8192)


def test_sp_master_loudness_gate(track):
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, target_lufs=-11.0, halo=HALO)
    lufs = refimpl.integrated_lufs(got, SR)
    assert abs(lufs - (-11.0)) < 1.0, lufs


def test_sp_dp_batch_2d_mesh(track):
    """2-D (dp × sp) composition: a batch of long tracks, each row of the
    mesh time-sharding one track.  Every track must match its own
    single-chip output over the full track."""
    from amw_tpu.parallel.mesh import make_mesh2d
    from amw_tpu.parallel.timeshard import sp_batch_master

    mesh = make_mesh2d(2, 4)
    xb = np.stack([track, np.roll(track, 1000, axis=-1) * 0.8])
    got = sp_batch_master(xb, SR, mesh, target_lufs=-14.0, style="standard",
                          halo=HALO)
    assert got.shape == xb.shape
    for i in range(2):
        want = _single_chip_v2(xb[i], {})
        err = _full_err(got[i], want)
        assert 20 * np.log10(max(err, 1e-12)) < -90.0, (i, err)
        assert np.all(np.isfinite(got[i]))


def test_sp_two_normalize_stages(track):
    """Two normalize_lufs modules at DIFFERENT targets: SP must apply each
    stage's own target (regression: all stages used to read the last one)."""
    config = {"modules": [
        {"id": "dc_offset", "enabled": True, "amount": 1.0},
        {"id": "normalize_lufs", "enabled": True, "target_lufs": -18.0,
         "amount": 1.0},
        {"id": "style_eq", "enabled": True, "style": "standard", "amount": 1.0},
        {"id": "normalize_lufs", "enabled": True, "target_lufs": -14.0,
         "amount": 1.0},
        {"id": "peak_guard", "enabled": True, "headroom_db": 0.5,
         "amount": 0.6},
    ]}
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, chain_config=config, target_lufs=-14.0,
                    halo=HALO)
    spec = GraphSpec(sr=SR, n=track.shape[-1], channels=2, exact=True)
    params, fn, _ = build_v2_job_graph(spec, config, {}, -14.0, "standard")
    want = np.asarray(fn(jnp.asarray(track), jax.device_put(params))["out"])
    err = _full_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -90.0, err


def test_sp_true_peak_limiter_matches_single_chip(track):
    """The pro true_peak flag reaches the SP path: same ceiling, same tail
    gains as the single-chip graph (review finding: the flag used to be
    silently dropped, so >threshold uploads on a mesh lost the ceiling)."""
    pro = {"true_peak_enabled": True, "true_peak_ceiling_db": -1.5}
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, target_lufs=-9.0, pro=pro, halo=HALO)
    want = _single_chip_v2(track, pro, target=-9.0)
    err = _full_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -90.0, err
    from scipy.signal import resample_poly

    tp = 20 * np.log10(np.abs(resample_poly(got, 4, 1, axis=-1)).max())
    assert tp <= -1.5 + 0.05, tp


def test_sp_track_too_short_for_shards_raises():
    """Chunk rounding can leave the last shard without valid samples; the
    builder must reject (the engine then falls back to single-device)
    instead of tracing mismatched lax.switch branches."""
    from amw_tpu.parallel.timeshard import build_sp_master

    mesh = make_mesh(8, axis="sp")
    n = 61340  # ~1.4 s: chunk rounds to hop multiples past n/(n_dev)
    with pytest.raises(ValueError, match="too short"):
        build_sp_master(SR, n, 2, mesh)


def test_sp_last_chunk_shorter_than_halo_exact(track):
    """Boundary case (VERDICT r3 item 6): the last chunk's valid length lv
    is SHORTER than the halo, so the second-to-last shard's right context
    crosses the track end.  That shard runs the fourth window variant
    (window ending exactly at the track end) — the full track, including
    the second-to-last chunk's tail, must still match single-chip."""
    # n chosen so chunk = 9*4410 = 39690 and lv = n - 7*chunk = 4418 < halo.
    n = 8 * 8 * 4410 + 8
    x = track[:, :n] - track[:, :n].mean(axis=-1, keepdims=True)
    mesh = make_mesh(8, axis="sp")
    got = sp_master(x, SR, mesh, target_lufs=-14.0, style="standard",
                    halo=HALO)
    # Sanity: this length really exercises the lv < halo branch.
    from amw_tpu.parallel.timeshard import _round_up

    chunk = _round_up(_round_up(n, 8) // 8, 4410)
    lv = n - 7 * chunk
    assert 0 < lv < HALO, (chunk, lv)
    want = _single_chip_v2(x, {})
    err = _full_err(got, want)
    assert 20 * np.log10(max(err, 1e-12)) < -90.0, err
    # The previously-degraded region specifically: the second-to-last
    # chunk's last samples (within halo of the track end).
    tail = slice(6 * chunk + (chunk - HALO), 7 * chunk)
    terr = np.max(np.abs(got[:, tail].astype(np.float64) - want[:, tail]))
    assert 20 * np.log10(max(terr, 1e-12)) < -90.0, terr


def test_sp_two_shards_lv_below_halo_rejected():
    """With only two shards an exact track-end window would span the whole
    track; the builder rejects so the engine serves single-device."""
    from amw_tpu.parallel.timeshard import build_sp_master

    mesh = make_mesh(2, axis="sp")
    with pytest.raises(ValueError, match="single-chip|too short"):
        build_sp_master(SR, 50000, 2, mesh)
