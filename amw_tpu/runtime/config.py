"""Runtime settings (reference: backend/app/config.py — pydantic-settings
with the ``MAGIC_MASTER_`` env prefix; same field names/defaults kept for
drop-in compatibility, ``AMW_`` accepted as an alias prefix)."""

from __future__ import annotations

import os
from dataclasses import dataclass, fields


def _env(name: str, default):
    for prefix in ("MAGIC_MASTER_", "AMW_"):
        v = os.environ.get(prefix + name.upper())
        if v is None:
            continue
        if isinstance(default, bool):
            return v.strip().lower() in ("1", "true", "yes", "on", "y")
        if isinstance(default, int):
            try:
                return int(v)
            except ValueError:
                return default
        if isinstance(default, float):
            try:
                return float(v)
            except ValueError:
                return default
        return v
    return default


@dataclass
class Settings:
    # Upload limits (MB) per format and tier (config.py:26-33).
    max_upload_mb_wav: int = 800
    max_upload_mb_mp3: int = 300
    max_upload_mb_flac: int = 500
    tier_upload_mb_free: int = 100
    tier_upload_mb_pro: int = 300
    tier_upload_mb_studio: int = 800

    # Admission control (config.py:41-42).
    semaphore_priority: int = 2
    semaphore_normal: int = 1

    # Jobs store (jobs_store.py).
    jobs_done_ttl_seconds: int = 3600
    jobs_max_entries: int = 100

    # Debug / trace flags (config.py:50-53).
    debug: bool = False
    mastering_debug_skip_limits: bool = False
    mastering_trace: bool = False
    mastering_trace_lufs_stages: bool = False

    # Defaults.
    default_target_lufs: float = -14.0
    batch_max_files: int = 10

    # Feature flags (deps.py:156-174).
    feature_ai_enabled: bool = True
    feature_batch_enabled: bool = True
    registration_enabled: bool = True
    require_email_verify: bool = False
    maintenance_mode: bool = False
    vocal_isolation_enabled: bool = False

    # Auth.
    jwt_secret: str = "change-me-in-production"
    jwt_expire_minutes: int = 60 * 24 * 7
    free_weekly_limit: int = 1
    auth_rate_per_minute: int = 10
    lufs_tool_rate_per_hour: int = 20
    rate_limit_per_minute: int = 300
    # Comma-separated reverse-proxy IPs allowed to set X-Real-IP /
    # X-Forwarded-For; empty = trust loopback + RFC1918 only.
    trusted_proxies: str = ""

    # Engine.
    engine_exact_mode: bool = True
    engine_micro_batch: bool = False
    engine_batch_window_ms: float = 50.0
    engine_max_micro_batch: int = 8
    db_path: str = "amw_tpu.sqlite3"

    # Referral rewards (config.py:82-84).
    referral_reward_inviter_tokens: int = 3
    referral_reward_invitee_tokens: int = 2

    def __post_init__(self):
        for f in fields(self):
            object.__setattr__(self, f.name, _env(f.name, getattr(self, f.name)))


settings = Settings()


def reload_settings():
    global settings
    settings = Settings()
    return settings
