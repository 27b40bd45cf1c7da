"""Multi-device serving: the HTTP service actually uses the whole mesh.

The reference scales jobs with asyncio semaphores (jobs_store.py:19-20);
this build's answer is the device mesh — these tests prove the SERVICE
(not just the library) shards work across devices on the conftest
8-device CPU mesh:

- a `/api/v2/batch` upload burst runs as ONE dp-sharded micro-batch step
  across all 8 devices, with per-track results matching the single-device
  engine;
- an upload past ``engine_sp_threshold_sec`` is served via the
  sequence-parallel path (one track time-sharded over the mesh) and still
  returns the full v2 response (before/after LUFS from the in-graph
  psum'd meter).
"""

import asyncio
import tempfile
import os

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from amw_tpu.runtime import db
from amw_tpu.utils import wav

SR = 8000


def _wav_bytes(dur=2.0, freq=440.0, amp=0.4, sr=SR):
    t = np.arange(int(sr * dur)) / sr
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    stereo = np.stack([x, 0.8 * x])
    q = (np.clip(stereo, -1, 1) * 32767).astype(np.int16)
    return wav.write_wav_int16(q, sr)


@pytest.fixture(scope="module")
def mesh_engine():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    from amw_tpu.runtime.config import settings
    from amw_tpu.runtime.engine import MasteringEngine

    settings.mastering_debug_skip_limits = True
    engine = MasteringEngine(bucket=True)
    assert engine.mesh is not None and engine.mesh.devices.size == 8
    yield engine
    settings.mastering_debug_skip_limits = False


@pytest.fixture(scope="module")
def app_factory(mesh_engine):
    tmp = tempfile.NamedTemporaryFile(suffix=".sqlite3", delete=False)
    db.set_db_path(tmp.name)
    from amw_tpu.runtime import deps
    from amw_tpu.runtime.service import create_app

    def make():
        deps.reset_rate_limits()
        return create_app(mesh_engine)

    yield make
    os.unlink(tmp.name)


def _client_test(app_factory, fn):
    async def inner():
        app = app_factory()
        async with TestClient(TestServer(app)) as client:
            await fn(client)

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(inner())


def _form(fields):
    import aiohttp

    form = aiohttp.FormData()
    for k, v in fields.items():
        if k == "files":
            for blob in v:
                form.add_field("files", blob, filename="test.wav",
                               content_type="audio/wav")
        elif k == "file":
            form.add_field("file", v, filename="test.wav",
                           content_type="audio/wav")
        else:
            form.add_field(k, str(v))
    return form


async def _wait_done(client, jid, tries=240):
    for _ in range(tries):
        st = await (await client.get(f"/api/master/status/{jid}")).json()
        if st["status"] in ("done", "error"):
            return st
        await asyncio.sleep(0.25)
    raise AssertionError("job timed out")


def test_batch_burst_shards_dp_across_devices(app_factory, mesh_engine):
    """A burst of uploads through the REAL service runs as dp-sharded
    micro-batch steps over all 8 devices."""
    mesh_engine.last_batch_info = None

    async def fn(client):
        blobs = [_wav_bytes(freq=f) for f in (220, 330, 440, 550)]
        form = _form({"files": blobs, "preset": "spotify"})
        r = await client.post("/api/v2/batch", data=form)
        assert r.status == 200, await r.text()
        ids = (await r.json())["job_ids"]
        assert len(ids) == 4
        outs = []
        for jid in ids:
            st = await _wait_done(client, jid)
            assert st["status"] == "done", st
            blob = await (await client.get(
                f"/api/master/result/{jid}")).read()
            audio, sr = wav.read_wav(blob)
            outs.append(audio)
        assert all(np.all(np.isfinite(o)) for o in outs)
        return outs

    _client_test(app_factory, fn)
    info = mesh_engine.last_batch_info
    assert info is not None, "micro-batcher never ran"
    # The compiled step is mesh-wide and its outputs lived on all 8 devices.
    assert info["batch_compiled"] % 8 == 0, info
    assert info["devices"] == 8, info


def test_mesh_batch_results_match_single_device_engine(mesh_engine):
    """Per-track results from the dp-sharded serving step equal the
    single-device (no-mesh, no-batcher) engine bit-for-bit at f32."""
    from amw_tpu.runtime.config import settings
    from amw_tpu.runtime.engine import MasteringEngine

    data = _wav_bytes(freq=261.6)
    got = mesh_engine.master_v2_bytes(data, "t.wav", target_lufs=-14.0)

    old = settings.engine_mesh
    settings.engine_mesh = False
    try:
        solo = MasteringEngine(bucket=True, micro_batch=False)
        assert solo.mesh is None
        want = solo.master_v2_bytes(data, "t.wav", target_lufs=-14.0)
    finally:
        settings.engine_mesh = old
    a, sra = wav.read_wav(got["bytes"])
    b, srb = wav.read_wav(want["bytes"])
    assert sra == srb and a.shape == b.shape
    # Same compiled math modulo dp sharding; only the (random) TPDF dither
    # in the 16-bit export differs — bound the diff by its ±2 LSB reach.
    assert np.max(np.abs(a.astype(np.float64) - b)) <= 3.0 / 32768.0
    assert abs(got["after_lufs"] - want["after_lufs"]) < 1e-3


def test_long_upload_served_sequence_parallel(app_factory, mesh_engine):
    """An upload past the sp threshold is served via the time-sharded path
    and returns a complete v2 response."""
    from amw_tpu.runtime.config import settings

    old = settings.engine_sp_threshold_sec
    settings.engine_sp_threshold_sec = 4.0  # test-sized "DJ set"
    try:
        async def fn(client):
            form = _form({"file": _wav_bytes(dur=6.0), "preset": "spotify"})
            r = await client.post("/api/v2/master", data=form)
            assert r.status == 200, await r.text()
            jid = (await r.json())["job_id"]
            st = await _wait_done(client, jid)
            assert st["status"] == "done", st
            # LUFS stats came from the in-graph psum'd gated meter.
            assert st["after_lufs"] == pytest.approx(-14.0, abs=0.5)
            blob = await (await client.get(
                f"/api/master/result/{jid}")).read()
            audio, sr = wav.read_wav(blob)
            assert sr == SR and audio.shape[-1] == 6 * SR
            assert np.all(np.isfinite(audio))

        _client_test(app_factory, fn)
        # The sp graph cache holds an entry — the service really took the
        # sequence-parallel route (sp graphs get their own LRU so DJ-set
        # bursts can't evict the hot dp bucket graphs).
        assert any(k[0] == "sp" for k in mesh_engine._sp_cache)
    finally:
        settings.engine_sp_threshold_sec = old


def test_sp_length_quantization_shares_executable(mesh_engine):
    """Distinct long-upload lengths snap to the ``engine_sp_quantize_sec``
    grid and share ONE compiled sp executable (round-5: distinct DJ-set
    lengths used to pay a fresh exact-length compile each).  The zero pad
    is mastered as trailing silence — gated out of BS.1770 — and sliced
    off, so outputs keep their true lengths and the loudness result matches
    the unquantized graph."""
    from amw_tpu.runtime.config import settings

    old_thr = settings.engine_sp_threshold_sec
    old_grid = settings.engine_sp_quantize_sec
    settings.engine_sp_threshold_sec = 4.0
    settings.engine_sp_quantize_sec = 30.0
    try:
        r1 = mesh_engine.master_v2_bytes(_wav_bytes(dur=5.5), "a.wav",
                                         target_lufs=-14.0)
        # Snapshot AFTER the first job: the spec may have been pre-cached by
        # an earlier test, so the invariant is "the second distinct length
        # adds no new executable", not "exactly one key appeared".
        keys_mid = set(mesh_engine._sp_cache)
        r2 = mesh_engine.master_v2_bytes(_wav_bytes(dur=6.25), "b.wav",
                                         target_lufs=-14.0)
        a1, _ = wav.read_wav(r1["bytes"])
        a2, _ = wav.read_wav(r2["bytes"])
        assert a1.shape[-1] == int(5.5 * SR)
        assert a2.shape[-1] == int(6.25 * SR)
        # Both lengths landed on the same quantized spec -> one executable.
        assert set(mesh_engine._sp_cache) == keys_mid
        assert any(k[0] == "sp" and k[1][1] == int(30.0 * SR)
                   for k in keys_mid)

        # Quantization must not move the loudness result: same upload
        # through the exact-length sp graph (grid off).
        settings.engine_sp_quantize_sec = 0.0
        r_exact = mesh_engine.master_v2_bytes(_wav_bytes(dur=5.5), "a.wav",
                                              target_lufs=-14.0)
        assert abs(r1["after_lufs"] - r_exact["after_lufs"]) < 0.02
        a_exact, _ = wav.read_wav(r_exact["bytes"])
        # Same math modulo the silence-tail context: the track BODY matches
        # (residual here is the tiny test geometry's clamped halo, not
        # quantization), while the final filter-settle window of a HARD-CUT
        # track legitimately differs — the exact graph odd-extends at the
        # true end, the quantized graph sees the actual trailing silence.
        # Real uploads end in silence/fade, where both contexts coincide.
        d = np.abs(a1.astype(np.float64) - a_exact)
        n1 = d.shape[-1]
        assert np.max(d[:, : int(0.95 * n1)]) < 0.005
        assert np.max(d) < 0.35  # tail: bounded, no blowup
    finally:
        settings.engine_sp_threshold_sec = old_thr
        settings.engine_sp_quantize_sec = old_grid


def test_long_upload_sp_unsupported_config_falls_back(app_factory,
                                                      mesh_engine):
    """A config the time-shard builder rejects (reverb IR wider than the
    halo) must fall back to the single-device graph and still master —
    review finding: the sp route used to propagate the build error and
    fail a job the single-chip engine handles fine."""
    import json

    from amw_tpu.runtime.config import settings

    old = settings.engine_sp_threshold_sec
    settings.engine_sp_threshold_sec = 4.0
    try:
        cfg = {"modules": [
            {"id": "dc_offset", "enabled": True},
            {"id": "reverb", "enabled": True, "reverb_type": "cathedral",
             "decay_sec": 4.0, "amount": 0.2},
            {"id": "normalize_lufs", "enabled": True, "target_lufs": -14.0},
        ]}
        n_sp_before = len(mesh_engine._sp_cache)

        async def fn(client):
            form = _form({"file": _wav_bytes(dur=6.0), "preset": "spotify",
                          "config": json.dumps(cfg)})
            r = await client.post("/api/v2/master", data=form)
            assert r.status == 200, await r.text()
            jid = (await r.json())["job_id"]
            st = await _wait_done(client, jid)
            assert st["status"] == "done", st
            blob = await (await client.get(
                f"/api/master/result/{jid}")).read()
            audio, sr = wav.read_wav(blob)
            assert audio.shape[-1] == 6 * SR and np.all(np.isfinite(audio))

        _client_test(app_factory, fn)
        # No sp graph was cached for it — the single-device path served it.
        assert len(mesh_engine._sp_cache) == n_sp_before
    finally:
        settings.engine_sp_threshold_sec = old
