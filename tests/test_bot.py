"""Telegram bot flows with a fake transport (no network)."""

import asyncio
import os
import tempfile

import numpy as np
import pytest

from amw_tpu.runtime import db
from amw_tpu.utils import wav

SR = 8000


@pytest.fixture()
def env(tmp_path):
    dbf = tempfile.NamedTemporaryFile(suffix=".sqlite3", delete=False)
    db.set_db_path(dbf.name)
    from amw_tpu.runtime import users

    users.ensure_schema()
    yield
    os.unlink(dbf.name)


class FakeTransport:
    def __init__(self, file_bytes=b""):
        self.sent: list = []
        self.docs: list = []
        self.file_bytes = file_bytes

    def api(self, method, payload):
        self.sent.append((method, payload))
        return {"ok": True, "result": {}}

    def download(self, file_id):
        return self.file_bytes

    def send_document(self, chat_id, filename, blob, caption=""):
        self.docs.append((chat_id, filename, blob, caption))


def _wav_blob():
    t = np.arange(SR * 2) / SR
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    q = (np.stack([x, x]) * 32767).astype(np.int16)
    return wav.write_wav_int16(q, SR)


def _bot(ft):
    from amw_tpu.runtime.bot import Bot

    return Bot(api_call=ft.api, download=ft.download,
               send_document=ft.send_document)


def _run(coro):
    asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


def test_help_and_presets(env):
    ft = FakeTransport()
    bot = _bot(ft)

    async def fn():
        await bot.handle_update({"message": {"chat": {"id": 1}, "text": "/help"}})
        await bot.handle_update({"message": {"chat": {"id": 1}, "text": "/presets"}})

    _run(fn())
    texts = [p["text"] for m, p in ft.sent if m == "sendMessage"]
    assert any("/master" in t for t in texts)
    assert any("spotify" in t for t in texts)


def test_master_flow_end_to_end(env):
    ft = FakeTransport(file_bytes=_wav_blob())
    bot = _bot(ft)

    async def fn():
        await bot.handle_update({"message": {"chat": {"id": 7}, "text": "/master"}})
        await bot.handle_update({"message": {
            "chat": {"id": 7},
            "document": {"file_id": "f1", "file_name": "track.wav"}}})
        # preset keyboard was offered
        kb_msgs = [p for m, p in ft.sent if p.get("reply_markup")]
        assert kb_msgs, ft.sent
        await bot.handle_update({"callback_query": {
            "message": {"chat": {"id": 7}}, "data": "preset:spotify"}})

    _run(fn())
    assert len(ft.docs) == 1, ft.sent
    chat_id, fname, blob, caption = ft.docs[0]
    assert fname == "track_mastered.wav"
    back, sr = wav.read_wav(blob)
    assert sr == SR and np.all(np.isfinite(back))
    # recorded with telegram source
    with db.connect() as c:
        row = c.execute("SELECT * FROM mastering_records WHERE"
                        " source='telegram'").fetchone()
    assert row is not None


def test_analyze_flow(env):
    ft = FakeTransport(file_bytes=_wav_blob())
    bot = _bot(ft)

    async def fn():
        await bot.handle_update({"message": {"chat": {"id": 9}, "text": "/analyze"}})
        await bot.handle_update({"message": {
            "chat": {"id": 9},
            "document": {"file_id": "f2", "file_name": "track.wav"}}})

    _run(fn())
    texts = [p["text"] for m, p in ft.sent if m == "sendMessage"]
    assert any("LUFS" in t for t in texts), texts


def test_link_flow(env):
    from amw_tpu.runtime import users
    from amw_tpu.runtime.auth import hash_password
    from amw_tpu.runtime.bot import create_link_code

    u = users.create_user("linkme@example.com", hash_password("pw123456"))
    code = create_link_code(int(u["id"]))
    ft = FakeTransport()
    bot = _bot(ft)

    _run(bot.handle_update({"message": {"chat": {"id": 42},
                                        "text": f"/link {code}"}}))
    u2 = users.get_user_by_id(int(u["id"]))
    assert u2["telegram_id"] == 42
    # code is single use
    _run(bot.handle_update({"message": {"chat": {"id": 43},
                                        "text": f"/link {code}"}}))
    assert users.get_user_by_id(int(u["id"]))["telegram_id"] == 42


def test_admin_report_rbac(env):
    from amw_tpu.runtime import users
    from amw_tpu.runtime.auth import hash_password

    ft = FakeTransport()
    bot = _bot(ft)
    _run(bot.handle_update({"message": {"chat": {"id": 50}, "text": "/report"}}))
    assert any("Admin only" in p.get("text", "") for _, p in ft.sent)

    u = users.create_user("boss@example.com", hash_password("pw123456"))
    users.update_user(int(u["id"]), is_admin=1, telegram_id=51)
    ft2 = FakeTransport()
    bot2 = _bot(ft2)
    _run(bot2.handle_update({"message": {"chat": {"id": 51}, "text": "/report"}}))
    assert any("Report" in p.get("text", "") for _, p in ft2.sent)


def test_engagement_tick(env):
    import time

    from amw_tpu.runtime.bot import run_engagement_tick

    ft = FakeTransport()
    bot = _bot(ft)
    with db.connect() as c:
        c.execute("INSERT INTO telegram_engagement (telegram_id, stage,"
                  " created_at) VALUES (?,?,?)",
                  (99, 0, time.time() - 2 * 86400))
    sent = run_engagement_tick(bot)
    assert sent == 1
    assert any("analyze" in p.get("text", "").lower() for _, p in ft.sent)
    # second tick within 20h: nothing
    assert run_engagement_tick(bot) == 0


def test_anomaly_checks(env):
    from amw_tpu.runtime.anomaly import check_anomalies

    alerts = check_anomalies()
    assert isinstance(alerts, list)  # thresholds generous; usually empty


def test_master_batch_flow(env):
    """Multiple audio files before picking a preset become one batch —
    the bot analog of /api/v2/batch (reference bot batch flow)."""
    ft = FakeTransport(file_bytes=_wav_blob())
    bot = _bot(ft)

    async def fn():
        await bot.handle_update(
            {"message": {"chat": {"id": 5}, "text": "/master"}})
        for i in range(3):
            await bot.handle_update(
                {"message": {"chat": {"id": 5},
                             "document": {"file_id": f"f{i}",
                                          "file_name": f"t{i}.wav"}}})
        await bot.handle_update(
            {"callback_query": {"message": {"chat": {"id": 5}},
                                "data": "preset:spotify"}})

    _run(fn())
    assert len(ft.docs) == 3
    assert {d[1] for d in ft.docs} == {"t0_mastered.wav", "t1_mastered.wav",
                                       "t2_mastered.wav"}
    # queue feedback mentioned the growing batch
    texts = [p.get("text", "") for m, p in ft.sent if m == "sendMessage"]
    assert any("2 files queued" in t for t in texts)


def test_fsm_state_expires(env, monkeypatch):
    """Stale FSM states time out (reference FSM timeout behavior): a preset
    callback after expiry asks for a file instead of using stale state."""
    from amw_tpu.runtime import bot as bot_mod

    ft = FakeTransport(file_bytes=_wav_blob())
    bot = _bot(ft)

    async def fn():
        await bot.handle_update(
            {"message": {"chat": {"id": 6}, "text": "/master"}})
        await bot.handle_update(
            {"message": {"chat": {"id": 6},
                         "document": {"file_id": "f", "file_name": "a.wav"}}})
        # expire the state
        bot_mod._chat_state[6]["ts"] -= bot_mod.STATE_TTL_SEC + 1
        await bot.handle_update(
            {"callback_query": {"message": {"chat": {"id": 6}},
                                "data": "preset:spotify"}})

    _run(fn())
    assert not ft.docs
    texts = [p.get("text", "") for m, p in ft.sent if m == "sendMessage"]
    assert any("Send a file first" in t for t in texts)


def test_notify_bot_menu_and_reports(env, monkeypatch):
    """The admin/notify bot (reference: bot/notify_handlers.py): /start
    shows the menu hint, menu buttons return operational reports — to the
    configured admin chat only."""
    import time as _time

    from amw_tpu.runtime.bot import NotifyBot
    from amw_tpu.runtime.config import settings

    monkeypatch.setattr(settings, "telegram_admin_chat_id", "7")

    ft = FakeTransport()
    nb = NotifyBot(api_call=ft.api)
    _run(nb.handle_update({"message": {"chat": {"id": 7}, "text": "/start"}}))
    assert any("service notifications" in p.get("text", "")
               for _, p in ft.sent)
    # reply keyboard present
    assert any("keyboard" in (p.get("reply_markup") or {}) for _, p in ft.sent)

    with db.connect() as c:
        c.execute("INSERT INTO transactions (user_id, amount, currency,"
                  " status, provider, plan, created_at)"
                  " VALUES (1, 9.5, 'USD', 'succeeded', 'demo', 'pro', ?)",
                  (_time.time(),))
    for btn, frag in (("📊 Stats", "Stats"), ("🧰 Jobs", "Jobs"),
                      ("⚠️ Errors", "Errors"), ("💰 Revenue", "9.5"),
                      ("🖥 Server", "Server")):
        ft2 = FakeTransport()
        nb2 = NotifyBot(api_call=ft2.api)
        _run(nb2.handle_update(
            {"message": {"chat": {"id": 7}, "text": btn}}))
        assert any(frag in p.get("text", "") for _, p in ft2.sent), btn

    # A stranger's chat — and ANY chat when no admin id is configured —
    # gets the help hint, never reports or /broadcast.
    for admin_id, chat in (("7", 666), ("", 7)):
        monkeypatch.setattr(settings, "telegram_admin_chat_id", admin_id)
        for text in ("📊 Stats", "/broadcast pwn"):
            ft3 = FakeTransport()
            nb3 = NotifyBot(api_call=ft3.api)
            _run(nb3.handle_update(
                {"message": {"chat": {"id": chat}, "text": text}}))
            assert len(ft3.sent) == 1
            assert "service notifications" in ft3.sent[0][1].get("text", "")


def test_notify_bot_broadcast(env):
    """/broadcast relays through the USER bot to every linked chat."""
    from amw_tpu.runtime import bot as bot_mod
    from amw_tpu.runtime import users
    from amw_tpu.runtime.auth import hash_password

    u = users.create_user("fan@example.com", hash_password("pw123456"))
    users.update_user(int(u["id"]), telegram_id=42)

    sent = []

    class _FakeUserBot:
        def api(self, method, payload):
            assert method == "sendMessage"
            sent.append((payload["chat_id"], payload["text"]))
            return {"ok": True}

    orig_bot, orig_tok = bot_mod.Bot, bot_mod.bot_token
    bot_mod.Bot, bot_mod.bot_token = _FakeUserBot, lambda: "tok"
    try:
        n = bot_mod.broadcast_to_users("hello there")
    finally:
        bot_mod.Bot, bot_mod.bot_token = orig_bot, orig_tok
    assert n == 1 and sent == [(42, "hello there")]


def test_channel_post_and_weekly_stats(env, monkeypatch):
    """Channel posting (reference: bot/channel.py): unconfigured -> False;
    configured -> one sendMessage to the channel id, and the weekly stats
    post renders user/mastering counts."""
    from amw_tpu.runtime import bot as bot_mod
    from amw_tpu.runtime.config import settings

    assert bot_mod.post_to_channel("hi") is False  # unconfigured

    monkeypatch.setattr(settings, "user_bot_channel_id", "@mm_channel")
    monkeypatch.setattr(bot_mod, "bot_token", lambda: "tok")
    sent = []
    ok = bot_mod.post_channel_weekly_stats(
        api_call=lambda m, p: sent.append((m, p)))
    assert ok and sent[0][0] == "sendMessage"
    assert sent[0][1]["chat_id"] == "@mm_channel"
    assert "masterings" in sent[0][1]["text"]
