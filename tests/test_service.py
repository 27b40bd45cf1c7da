"""In-process API tests against the aiohttp app (the reference's
ASGITransport-style 'fake backend': full stack, no network, real SQLite)."""

import asyncio
import json
import os
import tempfile

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
def app_factory():
    tmp = tempfile.NamedTemporaryFile(suffix=".sqlite3", delete=False)
    db.set_db_path(tmp.name)
    from amw_tpu.runtime import deps
    from amw_tpu.runtime.config import settings
    from amw_tpu.runtime.engine import MasteringEngine
    from amw_tpu.runtime.service import create_app

    settings.mastering_debug_skip_limits = True  # anon weekly limit off
    engine = MasteringEngine(bucket=True)

    def make():
        from amw_tpu.runtime import ai

        deps.reset_rate_limits()
        ai.reset_ai_usage()
        return create_app(engine)

    yield make
    settings.mastering_debug_skip_limits = False
    os.unlink(tmp.name)


def run_async(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def _client_test(app_factory, fn):
    async def inner():
        app = app_factory()
        async with TestClient(TestServer(app)) as client:
            await fn(client)

    run_async(inner())


def test_health_metrics_version(app_factory):
    async def fn(client):
        r = await client.get("/api/health")
        assert r.status == 200
        body = await r.json()
        assert body["status"] in ("ok", "degraded")
        assert body["db"] == "ok"
        r = await client.get("/api/metrics")
        assert (await r.json())["jobs_total"] >= 0
        r = await client.get("/api/version")
        assert "version" in await r.json()

    _client_test(app_factory, fn)


def test_presets_styles_chain_default(app_factory):
    async def fn(client):
        r = await client.get("/api/presets")
        assert (await r.json())["presets"]["spotify"] == -14.0
        r = await client.get("/api/styles")
        assert "edm" in (await r.json())["styles"]
        r = await client.get("/api/v2/chain/default?style=edm&target_lufs=-9")
        cfg = await r.json()
        ids = [m["id"] for m in cfg["modules"]]
        assert ids[0] == "dc_offset" and "dynamics" in ids
        assert cfg["modules"][3]["crossovers_hz"] == [214.0, 2230.0, 10000.0]

    _client_test(app_factory, fn)


def test_analyze_endpoint(app_factory):
    async def fn(client):
        data = {"file": _wav_bytes(), "extended": "true"}
        form = _form(data)
        r = await client.post("/api/v2/analyze", data=form)
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["version"] == "v2"
        assert body["channels"] == 2
        assert "streaming_preview" in body
        assert len(body["spectrum_bars"]) == 64

    _client_test(app_factory, fn)


def _form(fields):
    import aiohttp

    form = aiohttp.FormData()
    for k, v in fields.items():
        if k == "file":
            form.add_field("file", v, filename="test.wav",
                           content_type="audio/wav")
        elif k == "files":
            for blob in v:
                form.add_field("files", blob, filename="test.wav",
                               content_type="audio/wav")
        else:
            form.add_field(k, str(v))
    return form


def test_master_v2_full_job_cycle(app_factory):
    async def fn(client):
        form = _form({"file": _wav_bytes(), "preset": "spotify",
                      "style": "standard", "out_format": "wav"})
        r = await client.post("/api/v2/master", data=form)
        assert r.status == 200, await r.text()
        job_id = (await r.json())["job_id"]
        for _ in range(240):
            r = await client.get(f"/api/master/status/{job_id}")
            st = await r.json()
            if st["status"] in ("done", "error"):
                break
            await asyncio.sleep(0.5)
        assert st["status"] == "done", st
        assert st["after_lufs"] is not None
        r = await client.get(f"/api/master/result/{job_id}")
        assert r.status == 200
        blob = await r.read()
        assert blob[:4] == b"RIFF"
        back, sr = wav.read_wav(blob)
        assert sr == SR and np.all(np.isfinite(back))
        # job deleted after download
        r = await client.get(f"/api/master/status/{job_id}")
        assert r.status == 404

    _client_test(app_factory, fn)


def test_master_v1_and_sse(app_factory):
    # 22.05 kHz: at 8 kHz the reference's final_spectral_balance crashes
    # (8 kHz band above Nyquist) and errors the v1 job — mirrored behavior —
    # so the happy path needs a rate where the chain is valid.
    async def fn(client):
        form = _form({"file": _wav_bytes(sr=22050), "target_lufs": "-16",
                      "out_format": "wav"})
        r = await client.post("/api/master", data=form)
        assert r.status == 200, await r.text()
        job_id = (await r.json())["job_id"]
        r = await client.get(f"/api/master/progress/{job_id}")
        assert r.status == 200
        events = []
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[6:]))
                if events[-1]["status"] in ("done", "error"):
                    break
        assert events[-1]["status"] == "done", events[-1]
        r = await client.get(f"/api/master/preview/{job_id}?src=mastered")
        assert r.status == 200

    _client_test(app_factory, fn)


def test_batch_endpoint(app_factory):
    async def fn(client):
        form = _form({"files": [_wav_bytes(), _wav_bytes(freq=330)],
                      "preset": "apple"})
        r = await client.post("/api/v2/batch", data=form)
        assert r.status == 200, await r.text()
        ids = (await r.json())["job_ids"]
        assert len(ids) == 2
        done = 0
        for _ in range(240):
            done = 0
            for jid in ids:
                st = await (await client.get(f"/api/master/status/{jid}")).json()
                if st["status"] == "done":
                    done += 1
                elif st["status"] == "error":
                    raise AssertionError(st)
            if done == len(ids):
                break
            await asyncio.sleep(0.5)
        assert done == len(ids)

    _client_test(app_factory, fn)


def test_rejects_bad_upload(app_factory):
    async def fn(client):
        form = _form({"file": b"not audio at all, definitely"})
        r = await client.post("/api/v2/master", data=form)
        assert r.status == 400
        r = await client.get("/api/master/status/nonexistent")
        assert r.status == 404

    _client_test(app_factory, fn)


def test_lufs_tool_endpoint(app_factory):
    async def fn(client):
        form = _form({"file": _wav_bytes()})
        r = await client.post("/api/tools/lufs-analyze", data=form)
        assert r.status == 200, await r.text()
        body = await r.json()
        assert isinstance(body["spotify_ready"], bool)
        assert body["integrated_lufs"] < 0

    _client_test(app_factory, fn)


def test_vocal_isolation_endpoint(app_factory):
    from amw_tpu.runtime import settings_store

    async def fn(client):
        form = _form({"file": _wav_bytes()})
        r = await client.post("/api/v2/isolate-vocal", data=form)
        assert r.status == 503  # disabled by default
        settings_store.set_setting("vocal_isolation_enabled", "true")
        try:
            form = _form({"file": _wav_bytes()})
            r = await client.post("/api/v2/isolate-vocal", data=form)
            assert r.status == 200, await r.text()
            blob = await r.read()
            back, sr = wav.read_wav(blob)
            assert sr == SR and back.shape[0] == 2
            assert np.all(np.isfinite(back))
        finally:
            settings_store.set_setting("vocal_isolation_enabled", "false")

    _client_test(app_factory, fn)


def test_vocal_isolation_neural_htdemucs(app_factory, monkeypatch):
    """/api/v2/isolate-vocal exercises htdemucs_jax.separate end-to-end
    when a converted checkpoint is configured — here the genuinely-trained
    bundled tiny checkpoint (scripts/train_htdemucs_tiny.py →
    scripts/convert_htdemucs.py), the same pipeline an operator runs on
    the released demucs weights."""
    from amw_tpu.models import vocal
    from amw_tpu.models import htdemucs_jax as hj
    from amw_tpu.runtime import settings_store

    monkeypatch.setenv("AMW_HTDEMUCS_CKPT", "bundled")
    vocal._ht_cache = vocal._HT_SENTINEL  # drop any cached miss

    calls = []
    orig = hj.separate

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(hj, "separate", spy)

    async def fn(client):
        settings_store.set_setting("vocal_isolation_enabled", "true")
        try:
            form = _form({"file": _wav_bytes(dur=1.2)})
            r = await client.post("/api/v2/isolate-vocal", data=form)
            assert r.status == 200, await r.text()
            blob = await r.read()
            back, sr = wav.read_wav(blob)
            assert sr == SR and np.all(np.isfinite(back))
        finally:
            settings_store.set_setting("vocal_isolation_enabled", "false")

    _client_test(app_factory, fn)
    assert calls, "neural htdemucs path was not exercised"
    vocal._ht_cache = vocal._HT_SENTINEL


def test_frontend_served(app_factory):
    async def fn(client):
        r = await client.get("/")
        assert r.status == 200
        text = await r.text()
        assert "Magic" in text and "app.js" in text
        r = await client.get("/app.js")
        assert r.status == 200
        assert "v2/master" in await r.text()

    _client_test(app_factory, fn)


def test_reference_match_endpoint(app_factory):
    import aiohttp

    async def fn(client):
        form = aiohttp.FormData()
        form.add_field("file", _wav_bytes(freq=440), filename="src.wav",
                       content_type="audio/wav")
        form.add_field("reference", _wav_bytes(freq=220), filename="ref.wav",
                       content_type="audio/wav")
        form.add_field("strength", "0.8")
        r = await client.post("/api/v2/reference-match", data=form)
        assert r.status == 200, await r.text()
        blob = await r.read()
        back, sr = wav.read_wav(blob)
        assert sr == SR and np.all(np.isfinite(back))

    _client_test(app_factory, fn)


def test_upscale_endpoint(app_factory):
    async def fn(client):
        form = _form({"file": _wav_bytes(), "target_sr": "48000"})
        r = await client.post("/api/v2/upscale", data=form)
        assert r.status == 200, await r.text()
        back, sr = wav.read_wav(await r.read())
        assert sr == 48000
        assert abs(back.shape[-1] - 2 * 48000) < 4
        # downscale rejected
        form = _form({"file": _wav_bytes(sr=96000, dur=0.5),
                      "target_sr": "48000"})
        r = await client.post("/api/v2/upscale", data=form)
        assert r.status == 400

    _client_test(app_factory, fn)


def test_master_auto_endpoint(app_factory):
    async def fn(client):
        form = _form({"file": _wav_bytes()})
        r = await client.post("/api/v2/master/auto", data=form)
        assert r.status == 200, await r.text()
        body = await r.json()
        assert body["style"] in ("standard", "edm", "podcast")
        job_id = body["job_id"]
        for _ in range(240):
            st = await (await client.get(f"/api/master/status/{job_id}")).json()
            if st["status"] in ("done", "error"):
                break
            await asyncio.sleep(0.5)
        assert st["status"] == "done", st

    _client_test(app_factory, fn)


def test_locale_maintenance_and_rate_limit(app_factory):
    from amw_tpu.runtime import settings_store

    async def fn(client):
        r = await client.get("/api/locale",
                             headers={"Accept-Language": "ru-RU"})
        assert (await r.json())["locale"] == "ru"
        # maintenance mode gates the API but not health
        settings_store.set_setting("maintenance_mode", "true")
        try:
            r = await client.get("/api/presets")
            assert r.status == 503
            r = await client.get("/api/health")
            assert r.status == 200
        finally:
            settings_store.set_setting("maintenance_mode", "false")

    _client_test(app_factory, fn)


def test_admin_page_and_pwa_assets(app_factory):
    async def fn(client):
        r = await client.get("/admin")
        assert r.status == 200 and "admin" in (await r.text()).lower()
        r = await client.get("/manifest.json")
        assert (await r.json())["short_name"] == "MagicMaster"
        r = await client.get("/sw.js")
        body = await r.text()
        assert "caches.open" in body and "install" in body
        # full page set is served at clean URLs
        for page in ("dashboard", "login", "pricing", "lufs-analyzer",
                     "status", "landing"):
            r = await client.get(f"/{page}")
            assert r.status == 200, page
            assert "mm.css" in await r.text(), page

    _client_test(app_factory, fn)


def test_robots_sitemap_absolute_urls(app_factory):
    async def fn(client):
        r = await client.get("/robots.txt")
        body = await r.text()
        assert r.status == 200
        assert "Sitemap: http" in body  # absolute, not a relative path
        r = await client.get("/sitemap.xml")
        xml = await r.text()
        assert r.status == 200
        assert "<loc>http" in xml and "<loc>/" not in xml
        r = await client.get("/favicon.ico")
        assert r.status == 200
        r = await client.get("/api")
        assert (await r.json())["service"].startswith("Magic Master")

    _client_test(app_factory, fn)


def test_pwa_icons_og_image_progress_page(app_factory):
    """PWA icons, the OG image and the PROGRESS.md status page (reference:
    main.py:687-731) are served — generated placeholders when no static
    files exist."""
    async def fn(client):
        for path in ("/icons/icon-192.png", "/icons/icon-512.png",
                     "/og-image.png"):
            r = await client.get(path)
            assert r.status == 200, path
            body = await r.read()
            assert body[:8] == b"\x89PNG\r\n\x1a\n", path
        r = await client.get("/progress.html")
        assert r.status == 200
        assert "Build status" in (await r.text())

    _client_test(app_factory, fn)


def test_notify_bot_webhook_unconfigured_and_secret(app_factory, monkeypatch):
    """Without a notify-bot token the webhook answers 503; with a configured
    secret a wrong X-Telegram-Bot-Api-Secret-Token is rejected 403
    (reference: bot/notify_webhook_route.py:15-24)."""
    from amw_tpu.runtime.config import settings

    async def fn(client):
        r = await client.post("/bot/notify/webhook", json={})
        assert r.status == 503
        monkeypatch.setattr(settings, "telegram_bot_webhook_secret", "s3cr3t")
        r = await client.post("/bot/notify/webhook", json={},
                              headers={"X-Telegram-Bot-Api-Secret-Token":
                                       "wrong"})
        assert r.status == 403

    _client_test(app_factory, fn)


def test_og_meta_base_rendered(app_factory):
    """Pages carry OG/Twitter meta; the {{BASE}} token must be rendered to
    the request origin (absolute og:image, like the reference's SEO heads)
    and never leak to the client."""
    async def fn(client):
        for path in ("/", "/landing", "/pricing"):
            r = await client.get(path)
            assert r.status == 200, path
            text = await r.text()
            assert "{{BASE}}" not in text, path
            assert 'property="og:image"' in text, path
            assert "/og-image.png" in text, path

    _client_test(app_factory, fn)


def test_community_presets_seed_and_extra(app_factory, monkeypatch, tmp_path):
    """/api/presets/community ships the starter presets and merges an
    admin-provided extra file (reference: misc.py:154-228)."""
    from amw_tpu.runtime.config import settings

    extra = tmp_path / "extra.json"
    # Malformed entries (non-dict, missing fields, duplicate id) must be
    # filtered exactly like the reference's _load_community_presets.
    extra.write_text('[{"id": "my", "name": "Mine", "target_lufs": -11,'
                     ' "style": "edm", "chain_config": null},'
                     ' "just-a-string", {"name": "no id"},'
                     ' {"id": "stream", "name": "dup of seed",'
                     ' "target_lufs": -10},'
                     ' {"id": "noloud", "name": "missing lufs"}]')
    monkeypatch.setattr(settings, "community_presets_extra", str(extra))

    async def fn(client):
        r = await client.get("/api/presets/community")
        assert r.status == 200
        data = await r.json()
        ids = [it["id"] for it in data["items"]]
        assert "stream" in ids and "club" in ids and "my" in ids
        assert ids.count("stream") == 1  # seed wins over the duplicate
        assert "noloud" not in ids
        assert all(isinstance(it, dict) for it in data["items"])
        assert data["community_presets_extra_configured"] is True
        assert data["community_presets_extra_loaded"] is True

    _client_test(app_factory, fn)


@pytest.mark.parametrize("fmt,magic", [
    ("mp3", None),            # ID3 or MPEG sync — checked below
    ("opus", b"OggS"),
    ("aac", None),            # m4a: ftyp at offset 4
    ("flac", b"fLaC"),
])
def test_master_v2_export_formats_e2e(app_factory, fmt, magic):
    """Full upload -> master -> download per export format (reference
    tests/test_pipeline.py:150-187 exercises the codecs; here the whole
    service path is asserted, running on the in-process lavc shim)."""
    from amw_tpu.utils import audio_io

    if fmt != "flac" and not audio_io.lossy_codec_available():
        pytest.skip("no lossy codec boundary on this host")

    async def fn(client):
        form = _form({"file": _wav_bytes(), "preset": "spotify",
                      "style": "standard", "out_format": fmt})
        r = await client.post("/api/v2/master", data=form)
        assert r.status == 200, await r.text()
        job_id = (await r.json())["job_id"]
        for _ in range(240):
            st = await (await client.get(
                f"/api/master/status/{job_id}")).json()
            if st["status"] in ("done", "error"):
                break
            await asyncio.sleep(0.5)
        assert st["status"] == "done", st
        r = await client.get(f"/api/master/result/{job_id}")
        assert r.status == 200
        blob = await r.read()
        assert len(blob) > 500
        if magic is not None:
            assert blob[:4] == magic
        elif fmt == "mp3":
            assert blob[:3] == b"ID3" or blob[:2] in (b"\xff\xfb", b"\xff\xf3")
        elif fmt == "aac":
            assert blob[4:8] == b"ftyp"
        # the exported blob decodes back to finite audio
        y, sr = audio_io.load_audio_from_bytes(blob, f"out.{fmt}")
        assert y.shape[0] == 2 and y.shape[-1] > 0
        assert np.all(np.isfinite(y))

    _client_test(app_factory, fn)


def test_master_v2_advanced_field_contract(app_factory):
    """The studio's Advanced controls (custom target LUFS, bitrate,
    auto_blank_sec, true-peak ceiling, rumble cutoff, de-esser bounds)
    must be accepted end-to-end (reference mastering.py:749-824 form
    fields; frontend index.html Advanced block)."""
    from amw_tpu.utils import audio_io

    if not audio_io.lossy_codec_available():
        pytest.skip("no lossy codec boundary on this host")

    async def fn(client):
        form = _form({"file": _wav_bytes(), "target_lufs": "-12.5",
                      "style": "standard", "out_format": "mp3",
                      "bitrate": "192", "dither_type": "tpdf",
                      "auto_blank_sec": "1.0",
                      "true_peak_enabled": "true",
                      "true_peak_ceiling_db": "-1.2",
                      "rumble_enabled": "true", "rumble_cutoff": "95",
                      "deesser_enabled": "true",
                      "deesser_threshold": "-8",
                      "deesser_freq_hi": "10000"})
        r = await client.post("/api/v2/master", data=form)
        assert r.status == 200, await r.text()
        d = await r.json()
        assert d["target_lufs"] == -12.5 and d["preset"] == "custom"
        job_id = d["job_id"]
        for _ in range(240):
            st = await (await client.get(
                f"/api/master/status/{job_id}")).json()
            if st["status"] in ("done", "error"):
                break
            await asyncio.sleep(0.5)
        assert st["status"] == "done", st
        blob = await (await client.get(
            f"/api/master/result/{job_id}")).read()
        assert blob[:3] == b"ID3" or blob[:2] in (b"\xff\xfb", b"\xff\xf3")

    _client_test(app_factory, fn)


def test_extensions_vocal_isolation_runtime_override(app_factory):
    """/api/extensions must report the SAME vocal-isolation gate the
    master route enforces: the settings-store override, not only the
    static env flag (the studio shows its in-chain checkbox from this)."""
    from amw_tpu.runtime import settings_store

    async def fn(client):
        d = await (await client.get("/api/extensions")).json()
        assert d["vocal_isolation"] is False
        settings_store.set_setting("vocal_isolation_enabled", "true")
        try:
            d = await (await client.get("/api/extensions")).json()
            assert d["vocal_isolation"] is True
        finally:
            settings_store.set_setting("vocal_isolation_enabled", "false")

    _client_test(app_factory, fn)
