"""Admin panel, payments (demo + webhook), referral, misc endpoints."""

import asyncio
import os
import tempfile

import pytest
from aiohttp.test_utils import TestClient, TestServer

from amw_tpu.runtime import db


@pytest.fixture()
def app_factory():
    tmp = tempfile.NamedTemporaryFile(suffix=".sqlite3", delete=False)
    db.set_db_path(tmp.name)
    os.environ["AMW_ADMIN_EMAIL"] = "admin@example.com"
    os.environ["AMW_ADMIN_PASSWORD"] = "adminpass1"
    from amw_tpu.runtime import deps
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


async def _admin_hdr(client):
    r = await client.post("/api/auth/login", json={
        "email": "admin@example.com", "password": "adminpass1"})
    assert r.status == 200, await r.text()
    tok = (await r.json())["access_token"]
    return {"Authorization": f"Bearer {tok}"}


async def _user_hdr(client, email="u@example.com"):
    r = await client.post("/api/auth/register",
                          json={"email": email, "password": "userpass1"})
    return {"Authorization": f"Bearer {(await r.json())['access_token']}"}


def test_admin_rbac_and_stats(app_factory):
    async def fn(client):
        hdr = await _admin_hdr(client)
        uhdr = await _user_hdr(client)
        r = await client.get("/api/admin/stats", headers=uhdr)
        assert r.status == 403
        r = await client.get("/api/admin/stats")
        assert r.status == 401
        r = await client.get("/api/admin/stats", headers=hdr)
        body = await r.json()
        assert body["users_total"] >= 2
        assert "users_by_tier" in body

    _run(app_factory, fn)


def test_admin_user_management(app_factory):
    async def fn(client):
        hdr = await _admin_hdr(client)
        await _user_hdr(client, "victim@example.com")
        r = await client.get("/api/admin/users?q=victim", headers=hdr)
        uid = (await r.json())["items"][0]["id"]
        r = await client.patch(f"/api/admin/users/{uid}",
                               json={"tier": "studio", "tokens": 42},
                               headers=hdr)
        body = await r.json()
        assert body["tier"] == "studio" and body["tokens"] == 42
        r = await client.post(f"/api/admin/users/{uid}/subscription",
                              json={"tier": "pro", "days": 30}, headers=hdr)
        assert r.status == 200
        r = await client.post("/api/admin/users/bulk-action",
                              json={"user_ids": [uid], "action": "block"},
                              headers=hdr)
        assert r.status == 200
        # blocked user cannot login
        r = await client.post("/api/auth/login", json={
            "email": "victim@example.com", "password": "userpass1"})
        assert r.status == 403
        # audit log recorded
        r = await client.get("/api/admin/audit", headers=hdr)
        actions = [i["action"] for i in (await r.json())["items"]]
        assert "user_patch" in actions and "bulk_block" in actions
        # CSV export
        r = await client.get("/api/admin/users/export.csv", headers=hdr)
        assert "victim@example.com" in await r.text()

    _run(app_factory, fn)


def test_admin_settings_news_reports(app_factory):
    async def fn(client):
        hdr = await _admin_hdr(client)
        r = await client.patch("/api/admin/settings",
                               json={"free_weekly_limit": 5}, headers=hdr)
        assert (await r.json())["updated"] == ["free_weekly_limit"]
        r = await client.get("/api/admin/settings", headers=hdr)
        body = await r.json()
        assert body["free_weekly_limit"]["overridden"] is True
        assert str(body["free_weekly_limit"]["value"]) == "5"
        # news CRUD + public visibility
        r = await client.post("/api/admin/news",
                              json={"title": "Hello", "body": "World"},
                              headers=hdr)
        pid = (await r.json())["id"]
        r = await client.get("/api/news")
        assert any(i["id"] == pid for i in (await r.json())["items"])
        r = await client.delete(f"/api/admin/news/{pid}", headers=hdr)
        assert r.status == 200
        # reports
        r = await client.get("/api/admin/reports/list", headers=hdr)
        assert "styles_breakdown" in (await r.json())["reports"]
        r = await client.get("/api/admin/reports/styles_breakdown",
                             headers=hdr)
        assert "rows" in await r.json()
        r = await client.post("/api/admin/reports/styles_breakdown/summarize",
                              headers=hdr)
        assert len((await r.json())["summary"]) > 0
        # backup
        r = await client.get("/api/admin/backup/db", headers=hdr)
        assert (await r.read()).startswith(b"BEGIN TRANSACTION")
        # llm test (not configured)
        r = await client.post("/api/admin/llm/test", headers=hdr)
        assert (await r.json())["configured"] is False

    _run(app_factory, fn)


def test_payments_demo_flow(app_factory):
    async def fn(client):
        hdr = await _user_hdr(client, "payer@example.com")
        r = await client.get("/api/payments/plans")
        assert "pro_month" in (await r.json())["plans"]
        r = await client.post("/api/payments/create",
                              json={"plan": "studio_month"}, headers=hdr)
        body = await r.json()
        assert body["demo"] is True and body["status"] == "succeeded"
        r = await client.get("/api/auth/profile", headers=hdr)
        prof = await r.json()
        assert prof["tier"] == "studio"
        assert prof["tokens"] >= 200
        r = await client.post("/api/payments/create", json={"plan": "bogus"},
                              headers=hdr)
        assert r.status == 400

    _run(app_factory, fn)


def test_payments_webhook(app_factory):
    async def fn(client):
        hdr = await _user_hdr(client, "hook@example.com")
        r = await client.get("/api/auth/profile", headers=hdr)
        uid = None
        # find uid via admin listing
        ahdr = await _admin_hdr(client)
        r = await client.get("/api/admin/users?q=hook", headers=ahdr)
        uid = (await r.json())["items"][0]["id"]
        r = await client.post("/api/payments/webhook", json={
            "event": "payment.succeeded",
            "object": {"id": "pay-1",
                       "metadata": {"user_id": uid, "plan": "pro_month"},
                       "amount": {"value": "1000.00", "currency": "RUB"}}})
        assert (await r.json())["status"] == "ok"
        r = await client.get("/api/auth/profile", headers=hdr)
        assert (await r.json())["tier"] == "pro"
        # IP whitelist blocks
        from amw_tpu.runtime import settings_store

        settings_store.set_setting("yookassa_webhook_ip_whitelist", "1.2.3.4")
        r = await client.post("/api/payments/webhook", json={"event": "x"})
        assert r.status == 403
        settings_store.set_setting("yookassa_webhook_ip_whitelist", "")

    _run(app_factory, fn)


def test_admin_referrals_campaign_stats_report_csv(app_factory):
    """Round-5 admin depth: referral oversight endpoint, campaign stats
    drill-down fields, and per-report CSV export."""
    async def fn(client):
        hdr = await _admin_hdr(client)
        # seed one referral via the public flow
        uhdr = await _user_hdr(client, "inviter@example.com")
        code = (await (await client.get(
            "/api/referral/my-link", headers=uhdr)).json())["code"]
        r = await client.post("/api/auth/register", json={
            "email": "invitee@example.com", "password": "inviteepw1",
            "ref": code})
        assert r.status == 200

        r = await client.get("/api/admin/referrals", headers=hdr)
        assert r.status == 200, await r.text()
        d = await r.json()
        assert d["total"] == 1 and "conversion_pct" in d
        assert d["top_inviters"][0]["email"] == "inviter@example.com"
        assert d["recent"][0]["invitee_email"] == "invitee@example.com"
        # RBAC: plain users are rejected
        r = await client.get("/api/admin/referrals", headers=uhdr)
        assert r.status in (401, 403)

        # campaign stats drill-down carries audience + delivery rate
        r = await client.post("/api/admin/campaigns", json={
            "subject": "s", "body": "b", "audience": "all"}, headers=hdr)
        cid = (await r.json())["id"]
        r = await client.get(f"/api/admin/campaigns/{cid}/stats",
                             headers=hdr)
        d = await r.json()
        assert "audience_total" in d and "delivery_pct" in d

        # per-report CSV export
        r = await client.get("/api/admin/reports/list", headers=hdr)
        rid = (await r.json())["reports"][0]
        r = await client.get(f"/api/admin/reports/{rid}/export.csv",
                             headers=hdr)
        assert r.status == 200
        assert "csv" in r.headers["Content-Type"]

    _run(app_factory, fn)


def test_referral_and_misc(app_factory):
    async def fn(client):
        hdr = await _user_hdr(client, "ref@example.com")
        r = await client.get("/api/referral/my-link", headers=hdr)
        body = await r.json()
        assert body["code"] and "register?ref=" in body["link"]
        # register with the code
        r = await client.post("/api/auth/register", json={
            "email": "friend@example.com", "password": "friendpw1",
            "ref": body["code"]})
        assert r.status == 200
        r = await client.get("/api/referral/stats", headers=hdr)
        assert (await r.json())["invited_total"] == 1
        # misc
        r = await client.get("/api/extensions")
        assert (await r.json())["backend"] == "jax-tpu"
        r = await client.get("/api/limits", headers=hdr)
        assert (await r.json())["tier"] == "pro"
        r = await client.get("/api/debug-mode")
        assert "debug" in await r.json()
        r = await client.get("/api/presets/info")
        assert "vocal" in (await r.json())["denoise_presets"]

    _run(app_factory, fn)


def test_prompt_versioning(app_factory):
    async def fn(client):
        hdr = await _admin_hdr(client)
        r = await client.post("/api/admin/prompts",
                              json={"name": "recommend", "template": "v1 text"},
                              headers=hdr)
        assert r.status == 200
        r = await client.post("/api/admin/prompts",
                              json={"name": "recommend", "template": "v2 text"},
                              headers=hdr)
        assert (await r.json())["version"] == 2
        r = await client.get("/api/admin/prompts/recommend/history",
                             headers=hdr)
        items = (await r.json())["items"]
        assert len(items) == 2 and items[0]["active"] == 1
        r = await client.post("/api/admin/prompts/recommend/activate",
                              json={"version": 1}, headers=hdr)
        assert r.status == 200
        from amw_tpu.runtime import settings_store
        assert settings_store.get_setting_str("ai_prompt_recommend") == "v1 text"
        r = await client.post("/api/admin/prompts/recommend/reset",
                              headers=hdr)
        assert r.status == 200

    _run(app_factory, fn)
