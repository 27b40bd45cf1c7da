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


def test_mesh_batch_mixed_lengths_match_exact_graphs():
    """Bucket-padded mesh batch with per-track n_valid: every track's output
    (sliced to its true length) matches the exact-length chain graph."""
    from amw_tpu.models.chain import compile_chain

    bucket = 3 * SR
    lengths = [bucket, int(2.6 * SR) + 17, int(2.83 * SR) + 1, bucket - 1]
    xb = np.zeros((4, 2, bucket), np.float32)
    for i, nv in enumerate(lengths):
        seg = _tracks(1, nv, seed=i)[0]
        # pre-remove the exact per-track mean (the engine's _pre_dc does
        # this host-side) so the in-graph dc stage is a no-op in both the
        # padded and the exact graphs
        xb[i, :, :nv] = seg - seg.mean(axis=-1, keepdims=True)
    mesh = make_mesh(4)
    got = batch_master(xb, SR, mesh=mesh, nvb=np.asarray(lengths))
    for i, nv in enumerate(lengths):
        chain = compile_chain(GraphSpec(sr=SR, n=nv, channels=2))
        want = chain(xb[i, :, :nv])
        err = np.max(np.abs(got[i, :, :nv].astype(np.float64) - want))
        assert 20 * np.log10(max(err, 1e-12)) < -90.0, (i, err)
        if nv < bucket:
            assert np.abs(got[i, :, nv:]).max() == 0.0


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
