"""Mesh-sharded batch mastering on the 8-device virtual CPU mesh."""

import numpy as np
import jax

from amw_tpu.parallel.batch import batch_master, make_batch_fn, pad_to_bucket
from amw_tpu.parallel.mesh import make_mesh
from amw_tpu.refimpl.chain import chain_process
from amw_tpu.models import default_chain_config
from amw_tpu.spec import GraphSpec

SR = 8000  # small rate keeps CPU-mesh tests fast


def _tracks(b, n, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(n) / SR
    base = 0.3 * np.sin(2 * np.pi * 110 * t)
    out = []
    for i in range(b):
        x = (base + 0.05 * g.standard_normal(n)).astype(np.float32)
        out.append(np.stack([x, 0.8 * x]))
    return np.clip(np.stack(out), -1, 1)


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_batch_master_matches_per_track():
    xb = _tracks(4, 2 * SR)
    mesh = make_mesh(4)
    got = batch_master(xb, SR, mesh=mesh)
    cfg = default_chain_config()
    for i in range(xb.shape[0]):
        want = chain_process(xb[i], SR, cfg)
        assert np.max(np.abs(got[i].astype(np.float64) - want)) < 1e-3


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, (x, params) = ge.entry()
    out = jax.jit(fn)(x, jax.device_put(params))
    out = np.asarray(out)
    assert out.shape == x.shape and np.all(np.isfinite(out))


def test_pad_to_bucket():
    x = np.zeros((2, 100_000), np.float32)
    padded, n = pad_to_bucket(x, 44100)
    assert n == 100_000
    assert padded.shape[-1] == int(15 * 44100)
