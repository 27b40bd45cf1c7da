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
    # Coalesce concurrent same-graph jobs into one vmapped batch (the
    # headline-throughput configuration; see runtime/batcher.py).  Single
    # jobs pay only the batch window (50 ms) over solo latency.
    engine_micro_batch: bool = True
    engine_batch_window_ms: float = 50.0
    engine_max_micro_batch: int = 8
    # Serve across every local device: micro-batches shard data-parallel
    # over a dp mesh, and tracks longer than the sp threshold are
    # time-sharded over the same devices (sequence parallelism).  With one
    # device both are no-ops — single-chip behavior (and bench numbers)
    # are unchanged.
    engine_mesh: bool = True
    engine_sp_threshold_sec: float = 600.0
    # Highest bucket of the masked length ladder the single-chip engine
    # pads up to (parallel/batch.DEFAULT_BUCKETS_SEC); longer uploads
    # compile at exact length.  HBM-bound — the fused chain's band-response
    # working set scales ~32·nfft bytes, so v5e (16 GB) serves the 2520 s
    # bucket with headroom but not 2×4800 s.
    engine_max_bucket_sec: float = 2520.0
    # Time-shard (sp) graphs compile per exact track length; snapping long
    # uploads up to this grid (zero-padded, output sliced back) lets
    # distinct lengths share one executable.  The padding is mastered as
    # trailing silence — gated out of BS.1770 (≤ ~0.001 LU on a >10 min
    # track) and sliced off before export.  0 = off (every length exact).
    engine_sp_quantize_sec: float = 30.0
    # Multi-host pods (DCN): when set, jax.distributed is initialized at
    # engine start and the serving mesh spans every host's devices with dp
    # across hosts / sp on each host's ICI (parallel/mesh.py pod_layout;
    # docs/SCALING.md).  "auto" = env/metadata auto-detection
    # (jax.distributed.initialize() with no args); "" = single-process
    # (default, all tests).  Otherwise "host:port" of process 0, with
    # engine_num_processes / engine_process_id from the scheduler.
    engine_coordinator: str = ""
    engine_num_processes: int = 0
    engine_process_id: int = -1
    # Precompile the default chain for these buckets at service start (comma
    # separated seconds; "" = off).  First-job latency drops from ~a minute
    # of compile to the steady-state number.
    engine_warmup_buckets: str = ""
    # Persistent XLA compilation cache directory ("" = off).  Compiled
    # executables survive process restarts, so a restarted service's first
    # job (and the warmup pass itself) loads from disk in seconds instead
    # of paying the ~minute-scale compile again.  Docker mounts this as a
    # volume (see Dockerfile / docker-compose.yml).
    compilation_cache_dir: str = ".jax_cache"
    db_path: str = "amw_tpu.sqlite3"

    # Referral rewards (config.py:82-84).
    referral_reward_inviter_tokens: int = 3
    referral_reward_invitee_tokens: int = 2

    # --- AI agents (reference config.py:47-66): backend, keys, per-tier
    # daily limits (-1 = unlimited), optional prompt overrides.
    ai_backend: str = "openai"
    openai_api_key: str = ""
    anthropic_api_key: str = ""
    deepseek_api_key: str = ""
    deepseek_base_url: str = "https://api.deepseek.com"
    deepseek_model: str = "deepseek-chat"
    ai_limit_free: int = 5
    ai_limit_pro: int = 50
    ai_limit_studio: int = -1
    ai_prompt_recommend: str = ""
    ai_prompt_report: str = ""
    ai_prompt_nl_config: str = ""
    ai_prompt_chat: str = ""

    # --- CORS (reference config.py:81): comma-separated origins; "" = "*".
    cors_origins: str = ""

    # --- Initial admin bootstrap (reference config.py:87-89).
    admin_email: str = ""
    admin_password: str = ""

    # --- SMTP transactional mail (reference config.py:92-98).
    smtp_host: str = ""
    smtp_port: int = 587
    smtp_user: str = ""
    smtp_password: str = ""
    smtp_from: str = "noreply@localhost"
    smtp_use_tls: bool = True

    # --- YooKassa payments (reference config.py:100-105; see payments.py).
    yookassa_shop_id: str = ""
    yookassa_secret_key: str = ""
    yookassa_return_url: str = "http://localhost:8000/pricing"
    yookassa_webhook_ip_whitelist: str = ""
    yookassa_webhook_secret: str = ""

    # --- Telegram admin notifier + user bot (reference config.py:107-124).
    telegram_bot_token: str = ""
    telegram_admin_chat_id: str = ""
    telegram_bot_webhook_secret: str = ""
    user_bot_token: str = ""
    user_bot_webhook_secret: str = ""
    user_bot_channel_id: str = ""
    user_bot_telegram_url: str = ""
    public_base_url: str = ""

    # --- Extensions / analytics (reference config.py:126-132).
    clarity_project_id: str = ""
    community_presets_extra: str = ""

    # --- Monitoring alerts + anomaly thresholds (reference config.py:134-147).
    alert_monitoring_enabled: bool = False
    alert_queue_threshold: int = 0
    alert_throttle_minutes: int = 60
    anomaly_check_interval: int = 60
    anomaly_cpu_threshold: float = 85.0
    anomaly_ram_threshold: float = 85.0
    anomaly_disk_threshold: float = 85.0
    anomaly_error_rate_threshold: float = 35.0
    anomaly_rss_max_mb: int = 8192
    anomaly_min_jobs_for_error_rate: int = 8

    # --- Vocal isolation (reference config.py:149-152): model choice +
    # converted-weights checkpoint for the TPU htdemucs path.
    demucs_model: str = "htdemucs"
    htdemucs_checkpoint: str = ""

    # --- Misc reference-compat fields (config.py:26-35).
    # (max_upload_mb_mp3 is declared with the upload limits above.)
    max_upload_mb: int = 100
    allowed_extensions: str = "wav,mp3,flac"
    temp_dir: str = "/tmp/masterflow"

    def __post_init__(self):
        for f in fields(self):
            object.__setattr__(self, f.name, _env(f.name, getattr(self, f.name)))


settings = Settings()


def reload_settings():
    global settings
    settings = Settings()
    return settings
