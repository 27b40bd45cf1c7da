"""Micro-batching scheduler: same-graph jobs coalesce into one execution."""

import json
import threading
import time

import numpy as np

from amw_tpu.models.chain import default_chain_config
from amw_tpu.refimpl.chain import chain_process
from amw_tpu.runtime.batcher import BatchedChainRunner, Batcher
from amw_tpu.spec import GraphSpec

SR = 8000


def test_batcher_coalesces_and_distributes():
    calls = []

    def run_batch(key, xb):
        calls.append((key, xb.shape[0]))
        return [x * 2 for x in xb]

    b = Batcher(run_batch, window_ms=80.0, max_batch=4)
    b.start()
    try:
        futs = [b.submit("k", np.full((3,), i, np.float32)) for i in range(3)]
        outs = [f.result(timeout=5) for f in futs]
        for i, o in enumerate(outs):
            assert np.allclose(o, 2 * i)
        # all three coalesced into one batch call
        assert calls == [("k", 3)]
        # max_batch reached fires immediately (4 quick submissions)
        t0 = time.monotonic()
        futs = [b.submit("k2", np.zeros(3, np.float32)) for _ in range(4)]
        [f.result(timeout=5) for f in futs]
        assert time.monotonic() - t0 < 1.0
        assert ("k2", 4) in calls
    finally:
        b.stop()


def test_batcher_propagates_errors():
    def run_batch(key, xb):
        raise RuntimeError("boom")

    b = Batcher(run_batch, window_ms=10.0)
    b.start()
    try:
        fut = b.submit("k", np.zeros(2, np.float32))
        try:
            fut.result(timeout=5)
            raise AssertionError("expected failure")
        except RuntimeError as e:
            assert "boom" in str(e)
    finally:
        b.stop()


def test_batched_chain_runner_matches_oracle():
    g = np.random.default_rng(5)
    n = 2 * SR
    t = np.arange(n) / SR
    base = 0.3 * np.sin(2 * np.pi * 150 * t)
    tracks = []
    for i in range(3):
        x = (base + 0.02 * g.standard_normal(n)).astype(np.float32)
        tracks.append(np.clip(np.stack([x, 0.8 * x]), -1, 1))
    spec = GraphSpec(sr=SR, n=n, channels=2)
    config = default_chain_config(-14.0, "standard")
    cfg_json = json.dumps(config, sort_keys=True, default=str)

    runner = BatchedChainRunner(window_ms=60.0, max_batch=4)
    try:
        results = [None] * 3

        def work(i):
            results[i] = runner.master(spec, cfg_json, tracks[i])

        threads = [threading.Thread(target=work, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            # First compile of the vmapped chain can exceed 2 min under
            # full-suite contention; a short join leaves results[i]=None.
            th.join(timeout=600)
            assert not th.is_alive(), "batched master thread timed out"
        for i in range(3):
            want = chain_process(tracks[i], SR, config)
            err = np.max(np.abs(results[i].astype(np.float64) - want))
            assert err < 1e-3, (i, err)
    finally:
        runner.close()


def test_engine_micro_batch_mode():
    import tempfile

    from amw_tpu.runtime import db
    from amw_tpu.runtime.engine import MasteringEngine
    from amw_tpu.utils import wav

    tmp = tempfile.NamedTemporaryFile(suffix=".sqlite3")
    db.set_db_path(tmp.name)
    g = np.random.default_rng(9)
    n = 2 * SR
    t = np.arange(n) / SR

    def blob(i):
        x = (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
             + 0.02 * g.standard_normal(n)).astype(np.float32)
        q = (np.clip(np.stack([x, x]), -1, 1) * 32767).astype(np.int16)
        return wav.write_wav_int16(q, SR)

    plain = MasteringEngine(bucket=True, micro_batch=False)
    batched = MasteringEngine(bucket=True, micro_batch=True)
    try:
        blobs = [blob(i) for i in range(3)]
        want = [plain.master_v2_bytes(b, "t.wav", target_lufs=-14.0)
                for b in blobs]

        got = [None] * 3

        def work(i):
            got[i] = batched.master_v2_bytes(blobs[i], "t.wav",
                                             target_lufs=-14.0)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        for i in range(3):
            a, _ = wav.read_wav(got[i]["bytes"])
            b, _ = wav.read_wav(want[i]["bytes"])
            assert np.max(np.abs(a - b)) < 2.5 / 32768, i  # dither RNG differs
            assert abs(got[i]["after_lufs"] - want[i]["after_lufs"]) < 0.05
    finally:
        batched._batcher.stop()


def test_batcher_per_key_cap():
    """A memory-derived per-key max_batch caps group size below the global
    max (long buckets must not batch 8 tracks)."""
    import numpy as np

    from amw_tpu.runtime.batcher import Batcher

    seen = []

    def run(key, xb, aux=None):
        seen.append(xb.shape[0])
        return [x for x in xb]

    b = Batcher(run, window_ms=30.0, max_batch=8)
    b.start()
    try:
        futs = [b.submit("k", np.full((4,), i, np.float32), max_batch=2)
                for i in range(6)]
        for f in futs:
            f.result(timeout=10.0)
    finally:
        b.stop()
    assert seen and max(seen) <= 2, seen
    assert sum(seen) == 6


def test_engine_graph_cache_lru():
    """The compiled-graph cache evicts least-recently-used entries past the
    cap (unbounded custom chain configs must not leak graphs)."""
    from amw_tpu.runtime.engine import MasteringEngine

    eng = MasteringEngine(bucket=False, micro_batch=False)
    eng._cache_cap = 3
    for i in range(6):
        eng._get_graph("t", ("spec", i), "k", lambda i=i: ("built", i))
    assert len(eng._cache) == 3
    # most-recent three survive
    assert [k[1][1] for k in eng._cache] == [3, 4, 5]
    # a hit refreshes recency
    eng._get_graph("t", ("spec", 3), "k", lambda: ("rebuilt", 3))
    eng._get_graph("t", ("spec", 6), "k", lambda: ("built", 6))
    assert ("t", ("spec", 3), "k") in eng._cache
    assert ("t", ("spec", 4), "k") not in eng._cache


def test_engine_warmup_precompiles_default_graph():
    """warmup() leaves the default v2 graph for the bucket in the cache, so
    the first job is a cache hit."""
    from amw_tpu.runtime.engine import MasteringEngine

    eng = MasteringEngine(bucket=True, micro_batch=False)
    eng.warmup(buckets_sec=(1.0,), sr=22050)
    assert any(k[0] == "v2" for k in eng._cache), list(eng._cache)


def test_engine_warmup_precompiles_htdemucs_scan(monkeypatch):
    """With a checkpoint configured, warmup() also compiles the
    whole-track htdemucs separation executable (the lax.scan overlap-add),
    so the first isolate-vocal job doesn't pay the big compile."""
    from amw_tpu.models import htdemucs_jax as hj, vocal
    from amw_tpu.runtime.engine import MasteringEngine

    monkeypatch.setenv("AMW_HTDEMUCS_CKPT", "bundled")
    monkeypatch.setattr(vocal, "_ht_cache", vocal._HT_SENTINEL)
    monkeypatch.setattr(vocal, "_ht_cache_path", None)
    monkeypatch.setattr(hj, "_SCAN_CACHE", {})
    eng = MasteringEngine(bucket=True, micro_batch=False)
    eng.warmup(buckets_sec=(1.0,), sr=22050)
    assert hj._SCAN_CACHE, "htdemucs scan executable not warmed"
