"""Mesh-sharded + streaming htdemucs separation vs the single-device path.

The reference runs Demucs as a single-GPU subprocess (reference:
services/vocal_isolation.py:13-50); the TPU build shards the overlap-add
window groups across a dp mesh (htdemucs_jax.separate_mesh) and offers a
double-buffered streaming path (separate(stream=True)).  Both must produce
the single-device scan path's output — the math is shared via
_group_contrib, so any drift is a sharding/combine bug.

Runs at the tiny config on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax

from amw_tpu.models import htdemucs_jax as hj
from amw_tpu.parallel.mesh import make_mesh, make_mesh2d


@pytest.fixture(scope="module")
def tiny_model():
    cfg = hj.tiny_config()
    params = hj.init_params(cfg, seed=3)
    return cfg, params


@pytest.fixture(scope="module")
def track():
    g = np.random.default_rng(11)
    # ~3.4 s at the tiny 8 kHz rate -> several overlap windows; int16 grid
    # so the lossless transfer-compression path is the one exercised.
    n = 27000
    x = (0.3 * g.standard_normal((2, n))).astype(np.float32)
    return np.round(x * 32768.0).clip(-32767, 32767).astype(np.float32) \
        / np.float32(32768.0)


def test_stream_path_matches_scan(tiny_model, track):
    cfg, params = tiny_model
    want = hj.separate(params, track, cfg, stems=("vocals",))
    got = hj.separate(params, track, cfg, stems=("vocals",), stream=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_stream_env_flag(tiny_model, track, monkeypatch):
    cfg, params = tiny_model
    monkeypatch.setenv("AMW_HTDEMUCS_STREAM", "1")
    want = hj.separate(params, track, cfg, stems=("vocals",), stream=False)
    got = hj.separate(params, track, cfg, stems=("vocals",))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("ndev", [2, 8])
def test_mesh_matches_single_device(tiny_model, track, ndev):
    cfg, params = tiny_model
    mesh = make_mesh(ndev)
    want = hj.separate(params, track, cfg, stems=("vocals",))
    got = hj.separate_mesh(params, track, mesh, cfg, stems=("vocals",))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mesh_2d_shards_dp_axis_only(tiny_model, track):
    """On the serving engine's 2-D dp×sp mesh the separator shards over dp
    and stays replicated over sp (engine passes its mesh verbatim)."""
    cfg, params = tiny_model
    mesh = make_mesh2d(4, 2)
    want = hj.separate(params, track, cfg, stems=("vocals",))
    got = hj.separate_mesh(params, track, mesh, cfg, axis="dp",
                           stems=("vocals",))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mesh_all_stems_short_track(tiny_model):
    """Track shorter than one segment + all four stems (no stem
    selection): exercises the single-window, nb_b < D branch."""
    cfg, params = tiny_model
    g = np.random.default_rng(5)
    x = (0.2 * g.standard_normal((2, cfg.segment_samples // 2))
         ).astype(np.float32)
    mesh = make_mesh(8)
    want = hj.separate(params, x, cfg)
    got = hj.separate_mesh(params, x, mesh, cfg)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vocal_isolate_with_mesh(tiny_model, track, tmp_path, monkeypatch):
    """models.vocal.isolate_vocal(mesh=...) routes through separate_mesh
    when weights are configured (the engine's serving call)."""
    from amw_tpu.models import vocal

    cfg, params = tiny_model
    path = str(tmp_path / "ckpt")
    hj.save_params(params, path, cfg)
    monkeypatch.setenv("AMW_HTDEMUCS_CKPT", path)
    vocal._ht_cache = vocal._HT_SENTINEL  # drop any cached checkpoint
    vocal._ht_cache_path = None
    try:
        mesh = make_mesh(8)
        sr = cfg.samplerate
        want = vocal.isolate_vocal(track, sr)
        got = vocal.isolate_vocal(track, sr, mesh=mesh)
        np.testing.assert_allclose(got, want, atol=2e-5)
    finally:
        vocal._ht_cache = vocal._HT_SENTINEL
        vocal._ht_cache_path = None
