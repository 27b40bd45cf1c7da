"""Sequence-parallel (time-sharded) mastering on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from amw_tpu import refimpl
from amw_tpu.parallel.mesh import make_mesh
from amw_tpu.parallel.timeshard import sp_master

SR = 44100


@pytest.fixture(scope="module")
def track():
    g = np.random.default_rng(3)
    n = 20 * SR
    t = np.arange(n) / SR
    x = (0.25 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 1500 * t)
         + 0.03 * g.standard_normal(n))
    env = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 0.3 * t))
    return np.clip(np.stack([x * env, 0.85 * x * env]), -0.99, 0.99).astype(np.float32)


def test_sp_master_matches_oracle_interior(track):
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, target_lufs=-14.0, style="standard",
                    halo=32768)
    want = refimpl.v1_pipeline(track, SR, target_lufs=-14.0, style="standard")
    assert got.shape == want.shape
    # Interior parity: the time-sharded fast path differs from the exact
    # single-device graph only at the track edges (zero-history) and by the
    # halo-truncated envelope warm-up.
    edge = 40000
    err = np.max(np.abs(got[:, edge:-edge].astype(np.float64)
                        - want[:, edge:-edge]))
    assert err < 5e-3, err
    l_got = refimpl.integrated_lufs(got, SR)
    l_want = refimpl.integrated_lufs(want, SR)
    assert abs(l_got - l_want) < 0.05, (l_got, l_want)
    assert np.all(np.isfinite(got))


def test_sp_master_loudness_gate(track):
    mesh = make_mesh(8, axis="sp")
    got = sp_master(track, SR, mesh, target_lufs=-11.0, halo=32768)
    lufs = refimpl.integrated_lufs(got, SR)
    assert abs(lufs - (-11.0)) < 1.0, lufs
