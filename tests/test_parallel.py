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
        # raw tracks with a real DC offset: the in-graph dc stage must
        # average over each track's n_valid, so padded output matches the
        # exact graph with no host-side pre-centering
        xb[i, :, :nv] = np.clip(seg + 0.02 * (i + 1), -1, 1)
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


class _Dev:
    """Stand-in device carrying only process_index (pod_layout is a pure
    layout helper so pod geometry is testable without multi-process JAX)."""

    def __init__(self, pid, i):
        self.process_index = pid
        self.id = pid * 100 + i

    def __repr__(self):
        return f"d{self.id}"


def test_pod_layout_sp_confined_to_host():
    from amw_tpu.parallel.mesh import pod_layout

    devs = [_Dev(p, i) for p in range(4) for i in range(8)]
    grid = pod_layout(devs, sp=4)
    assert grid.shape == (8, 4)
    for row in grid:
        assert len({d.process_index for d in row}) == 1  # sp rides ICI
    # dp axis spans hosts in process order
    assert [r[0].process_index for r in grid] == [0, 0, 1, 1, 2, 2, 3, 3]


def test_pod_layout_defaults_to_whole_host_rows():
    from amw_tpu.parallel.mesh import pod_layout

    devs = [_Dev(p, i) for p in range(2) for i in range(8)]
    grid = pod_layout(devs)
    assert grid.shape == (2, 8)


def test_pod_layout_rejects_host_straddling_sp():
    import pytest

    from amw_tpu.parallel.mesh import pod_layout

    devs = [_Dev(p, i) for p in range(2) for i in range(4)]
    with pytest.raises(ValueError):
        pod_layout(devs, sp=8)


def test_pod_mesh_single_host_runs_sp_graph():
    """make_pod_mesh on the 8-device CPU mesh = one host, 8 sp columns;
    the 2-D (dp=1, sp=8) mesh must drive the time-shard path."""
    from amw_tpu.parallel.mesh import make_pod_mesh
    from amw_tpu.parallel.timeshard import sp_batch_master

    from amw_tpu.parallel.mesh import make_mesh2d

    mesh = make_pod_mesh(sp=8)
    assert mesh.devices.shape == (1, 8)
    xb = _tracks(1, 4 * SR)
    got = sp_batch_master(xb, SR, mesh)
    want = sp_batch_master(xb, SR, make_mesh2d(1, 8))
    assert np.array_equal(got, want)
    assert np.all(np.isfinite(got))


def test_init_distributed_noop_without_config():
    from amw_tpu.parallel.mesh import init_distributed

    assert init_distributed() is False
