"""Security hardening: proxy-header trust, webhook idempotency/auth/fallback.

Covers the round-1 advisor findings: X-Forwarded-For spoofing of the
payments-webhook IP whitelist and rate limits, webhook replay double
crediting, and the unknown-plan metadata fallback (reference behavior:
backend/app/payments.py metadata fallback + transaction lookup by
external id)."""

import asyncio
import os
import tempfile

import pytest
from aiohttp.test_utils import TestClient, TestServer

from amw_tpu.runtime import db, deps


class _FakeReq:
    def __init__(self, peer, headers=None):
        self.remote = peer
        self.headers = headers or {}


def test_client_ip_ignores_spoofed_xff_from_untrusted_peer():
    # A direct (non-proxy) client sets XFF to a whitelisted IP: must be
    # ignored — the peer address wins.
    req = _FakeReq("203.0.113.5", {"X-Forwarded-For": "1.2.3.4"})
    assert deps.client_ip(req) == "203.0.113.5"


def test_client_ip_takes_last_xff_hop_from_trusted_proxy():
    # Our proxy appends the real address last; the first entry is
    # client-chosen garbage.
    req = _FakeReq("127.0.0.1", {"X-Forwarded-For": "6.6.6.6, 9.9.9.9"})
    assert deps.client_ip(req) == "9.9.9.9"


def test_client_ip_prefers_x_real_ip_from_trusted_proxy():
    req = _FakeReq("127.0.0.1", {"X-Real-IP": "8.8.8.8",
                                 "X-Forwarded-For": "6.6.6.6"})
    assert deps.client_ip(req) == "8.8.8.8"


def test_client_ip_plain_peer():
    assert deps.client_ip(_FakeReq("198.51.100.7")) == "198.51.100.7"


@pytest.fixture()
def app_factory():
    tmp = tempfile.NamedTemporaryFile(suffix=".sqlite3", delete=False)
    db.set_db_path(tmp.name)
    os.environ["AMW_ADMIN_EMAIL"] = "admin@example.com"
    os.environ["AMW_ADMIN_PASSWORD"] = "adminpass1"
    from amw_tpu.runtime.engine import MasteringEngine
    from amw_tpu.runtime.service import create_app

    engine = MasteringEngine(bucket=True)

    def make():
        deps.reset_rate_limits()
        return create_app(engine)

    yield make
    os.environ.pop("AMW_ADMIN_EMAIL", None)
    os.environ.pop("AMW_ADMIN_PASSWORD", None)
    os.unlink(tmp.name)


def _run(app_factory, fn):
    async def inner():
        async with TestClient(TestServer(app_factory())) as client:
            await fn(client)

    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(inner())


async def _register(client, email):
    r = await client.post("/api/auth/register",
                          json={"email": email, "password": "userpass1"})
    hdr = {"Authorization": f"Bearer {(await r.json())['access_token']}"}
    r = await client.post("/api/auth/login", json={
        "email": "admin@example.com", "password": "adminpass1"})
    ahdr = {"Authorization": f"Bearer {(await r.json())['access_token']}"}
    r = await client.get(f"/api/admin/users?q={email.split('@')[0]}",
                         headers=ahdr)
    uid = (await r.json())["items"][0]["id"]
    return hdr, uid


async def _tokens(client, hdr):
    r = await client.get("/api/auth/profile", headers=hdr)
    return (await r.json())["tokens"]


def test_webhook_replay_is_idempotent(app_factory):
    async def fn(client):
        hdr, uid = await _register(client, "replay@example.com")
        before = await _tokens(client, hdr)
        hook = {"event": "payment.succeeded",
                "object": {"id": "pay-replay-1",
                           "metadata": {"user_id": uid, "plan": "pro_month"},
                           "amount": {"value": "1000.00", "currency": "RUB"}}}
        for _ in range(3):  # provider redelivery
            r = await client.post("/api/payments/webhook", json=hook)
            assert r.status == 200
        after = await _tokens(client, hdr)
        assert after == before + 50  # pro_month credits exactly once
        with db.connect() as c:
            rows = c.execute(
                "SELECT status FROM transactions WHERE provider_id = ?",
                ("pay-replay-1",)).fetchall()
        assert len(rows) == 1 and rows[0]["status"] == "succeeded"

    _run(app_factory, fn)


def test_webhook_unknown_plan_metadata_fallback(app_factory):
    async def fn(client):
        hdr, uid = await _register(client, "fallback@example.com")
        before = await _tokens(client, hdr)
        r = await client.post("/api/payments/webhook", json={
            "event": "payment.succeeded",
            "object": {"id": "pay-custom-1",
                       "metadata": {"user_id": uid, "plan": "custom_topup",
                                    "tokens_included": "25",
                                    "period_days": 0},
                       "amount": {"value": "500.00", "currency": "RUB"}}})
        assert (await r.json())["status"] == "ok"
        assert await _tokens(client, hdr) == before + 25

    _run(app_factory, fn)


def test_webhook_shared_secret(app_factory):
    async def fn(client):
        from amw_tpu.runtime import settings_store

        _, uid = await _register(client, "secret@example.com")
        settings_store.set_setting("yookassa_webhook_secret", "s3cr3t")
        try:
            hook = {"event": "payment.succeeded",
                    "object": {"id": "pay-sec-1",
                               "metadata": {"user_id": uid,
                                            "plan": "pro_month"},
                               "amount": {"value": "1000.00",
                                          "currency": "RUB"}}}
            r = await client.post("/api/payments/webhook", json=hook)
            assert r.status == 403
            r = await client.post("/api/payments/webhook?secret=wrong",
                                  json=hook)
            assert r.status == 403
            r = await client.post("/api/payments/webhook?secret=s3cr3t",
                                  json=hook)
            assert r.status == 200
            r = await client.post(
                "/api/payments/webhook", json=hook,
                headers={"X-Webhook-Secret": "s3cr3t"})
            assert r.status == 200  # replay: accepted but idempotent
        finally:
            settings_store.set_setting("yookassa_webhook_secret", "")

    _run(app_factory, fn)
