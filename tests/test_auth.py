"""Auth/account flows against the in-process app (mirrors the reference's
test_auth.py coverage: register/login/JWT/me/profile, password reset with
single-use token, brute-force limit, history, API keys, saved presets,
free-anon weekly rate limit)."""

import asyncio
import os
import tempfile

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from amw_tpu.runtime import db


@pytest.fixture()
def app_factory():
    tmp = tempfile.NamedTemporaryFile(suffix=".sqlite3", delete=False)
    db.set_db_path(tmp.name)
    from amw_tpu.runtime import deps
    from amw_tpu.runtime.config import settings
    from amw_tpu.runtime.engine import MasteringEngine
    from amw_tpu.runtime.service import create_app

    settings.debug = True
    engine = MasteringEngine(bucket=True)

    def make():
        deps.reset_rate_limits()
        return create_app(engine)

    yield make
    settings.debug = False
    os.unlink(tmp.name)


def _run(app_factory, fn):
    async def inner():
        app = app_factory()
        async with TestClient(TestServer(app)) as client:
            await fn(client)

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(inner())


async def _register(client, email="user@example.com", password="secret123"):
    r = await client.post("/api/auth/register",
                          json={"email": email, "password": password})
    assert r.status == 200, await r.text()
    return await r.json()


def test_register_login_me_profile(app_factory):
    async def fn(client):
        reg = await _register(client)
        assert reg["tier"] == "pro" and reg["access_token"]
        # duplicate
        r = await client.post("/api/auth/register",
                              json={"email": "user@example.com",
                                    "password": "secret123"})
        assert r.status == 400
        # login
        r = await client.post("/api/auth/login",
                              json={"email": "user@example.com",
                                    "password": "secret123"})
        assert r.status == 200
        token = (await r.json())["access_token"]
        hdr = {"Authorization": f"Bearer {token}"}
        r = await client.get("/api/auth/me", headers=hdr)
        assert (await r.json())["email"] == "user@example.com"
        r = await client.get("/api/auth/profile", headers=hdr)
        body = await r.json()
        assert body["tier"] == "pro" and "stats" in body
        # wrong password
        r = await client.post("/api/auth/login",
                              json={"email": "user@example.com",
                                    "password": "wrong"})
        assert r.status == 401
        # unauthenticated me
        r = await client.get("/api/auth/me")
        assert r.status == 401

    _run(app_factory, fn)


def test_password_reset_single_use(app_factory):
    async def fn(client):
        await _register(client, "reset@example.com")
        r = await client.post("/api/auth/forgot-password",
                              json={"email": "reset@example.com"})
        body = await r.json()
        token = body.get("debug_token")
        assert token, body
        r = await client.post("/api/auth/reset-password",
                              json={"token": token,
                                    "new_password": "newpass99"})
        assert r.status == 200
        # single use
        r = await client.post("/api/auth/reset-password",
                              json={"token": token,
                                    "new_password": "again1234"})
        assert r.status == 400
        r = await client.post("/api/auth/login",
                              json={"email": "reset@example.com",
                                    "password": "newpass99"})
        assert r.status == 200

    _run(app_factory, fn)


def test_auth_brute_force_limit(app_factory):
    async def fn(client):
        from amw_tpu.runtime.config import settings

        for i in range(settings.auth_rate_per_minute):
            await client.post("/api/auth/login",
                              json={"email": f"x{i}@e.com", "password": "n"})
        r = await client.post("/api/auth/login",
                              json={"email": "x@e.com", "password": "n"})
        assert r.status == 429

    _run(app_factory, fn)


def test_api_keys_and_presets(app_factory):
    async def fn(client):
        reg = await _register(client, "keys@example.com")
        hdr = {"Authorization": f"Bearer {reg['access_token']}"}
        r = await client.post("/api/auth/api-keys", json={"name": "ci"},
                              headers=hdr)
        assert r.status == 201
        key = (await r.json())["key"]
        kid = (await r.json())["id"]
        # API key authenticates
        r = await client.get("/api/auth/me", headers={"X-API-Key": key})
        assert r.status == 200
        assert (await r.json())["email"] == "keys@example.com"
        r = await client.get("/api/auth/api-keys", headers=hdr)
        assert len((await r.json())["items"]) == 1
        r = await client.delete(f"/api/auth/api-keys/{kid}", headers=hdr)
        assert r.status == 200
        r = await client.get("/api/auth/me", headers={"X-API-Key": key})
        assert r.status == 401

        # presets CRUD
        cfg = {"modules": [{"id": "dc_offset", "enabled": True}]}
        r = await client.post("/api/auth/presets",
                              json={"name": "mine", "config": cfg},
                              headers=hdr)
        pid = (await r.json())["id"]
        r = await client.get(f"/api/auth/presets/{pid}", headers=hdr)
        assert (await r.json())["config"] == cfg
        r = await client.delete(f"/api/auth/presets/{pid}", headers=hdr)
        assert r.status == 200
        r = await client.get(f"/api/auth/presets/{pid}", headers=hdr)
        assert r.status == 404

    _run(app_factory, fn)


def test_history_and_csv(app_factory):
    async def fn(client):
        reg = await _register(client, "hist@example.com")
        hdr = {"Authorization": f"Bearer {reg['access_token']}"}
        r = await client.post("/api/auth/record", headers=hdr, json={
            "filename": "a.wav", "style": "edm", "target_lufs": -9.0,
            "before_lufs": -18.2, "after_lufs": -9.1, "out_format": "wav"})
        assert r.status == 200
        r = await client.get("/api/auth/history", headers=hdr)
        items = (await r.json())["items"]
        assert len(items) == 1 and items[0]["style"] == "edm"
        r = await client.get("/api/auth/history/export.csv", headers=hdr)
        text = await r.text()
        assert "a.wav" in text and text.startswith("id,")
        r = await client.delete(f"/api/auth/history/{items[0]['id']}",
                                headers=hdr)
        assert r.status == 200

    _run(app_factory, fn)


def test_free_weekly_limit(app_factory):
    from amw_tpu.runtime.config import settings
    from amw_tpu.utils import wav

    async def fn(client):
        settings.debug = False
        settings.mastering_debug_skip_limits = False
        try:
            t = np.arange(8000) / 8000
            x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
            q = (np.stack([x, x]) * 32767).astype(np.int16)
            blob = wav.write_wav_int16(q, 8000)
            import aiohttp

            async def post():
                form = aiohttp.FormData()
                form.add_field("file", blob, filename="t.wav",
                               content_type="audio/wav")
                return await client.post("/api/v2/master", data=form)

            r1 = await post()
            assert r1.status == 200, await r1.text()
            r2 = await post()
            assert r2.status == 429
        finally:
            settings.debug = True

    _run(app_factory, fn)


def test_email_verification_flow(app_factory):
    from amw_tpu.runtime.config import settings

    async def fn(client):
        settings.require_email_verify = True
        try:
            r = await client.post("/api/auth/register", json={
                "email": "verify@example.com", "password": "secret123"})
            body = await r.json()
            assert body.get("requires_verification") is True
            token = body.get("debug_token")
            # login blocked until verified
            r = await client.post("/api/auth/login", json={
                "email": "verify@example.com", "password": "secret123"})
            assert r.status == 403
            r = await client.get(f"/api/auth/verify-email?token={token}")
            assert r.status == 200
            r = await client.post("/api/auth/login", json={
                "email": "verify@example.com", "password": "secret123"})
            assert r.status == 200
            # resend for an already-verified account: generic message
            r = await client.post("/api/auth/resend-verification",
                                  json={"email": "verify@example.com"})
            assert "message" in await r.json()
        finally:
            settings.require_email_verify = False

    _run(app_factory, fn)
