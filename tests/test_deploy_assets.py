"""Deploy-tree sanity: the ops files the reference ships (deploy/*,
reference deploy/deploy.sh, backup_full.sh, env.production) stay present,
syntactically valid, and consistent with the runtime Settings surface."""

import os
import pathlib
import re
import subprocess

from amw_tpu.runtime.config import Settings

ROOT = pathlib.Path(__file__).resolve().parents[1]
DEPLOY = ROOT / "deploy"


def test_shell_scripts_parse():
    scripts = sorted(DEPLOY.glob("*.sh"))
    assert len(scripts) >= 4  # deploy, backup_db, backup_full, disk_monitor
    for s in scripts:
        subprocess.run(["bash", "-n", str(s)], check=True)


def test_shell_scripts_executable():
    """systemd OnFailure and backup_full's `[ -x ALERT_SCRIPT ]` both
    require the executable bit — a 644 alert.sh silently kills the whole
    alert chain."""
    for s in sorted(DEPLOY.glob("*.sh")):
        assert os.access(s, os.X_OK), f"{s.name} is not executable"


def test_alert_unit_loads_env():
    unit = (DEPLOY / "systemd" / "amw-tpu-alert@.service").read_text()
    assert "EnvironmentFile=-" in unit  # Telegram creds for alert.sh
    alert = (DEPLOY / "alert.sh").read_text()
    # Cron contexts set neither prefix: alert.sh must read .env itself,
    # under both prefixes config.py accepts.
    assert ".env" in alert
    assert "AMW_TELEGRAM_BOT_TOKEN" in alert
    assert "MAGIC_MASTER_TELEGRAM_BOT_TOKEN" in alert


def test_deploy_protects_secrets():
    text = (DEPLOY / "deploy.sh").read_text()
    assert 'chmod 600 "$INSTALL_DIR/.env"' in text
    assert 'chmod 700 "$INSTALL_DIR/backups"' in text
    # Exec bits restored on every sync; pip failures must not restart.
    assert 'chmod +x "$INSTALL_DIR"/deploy/*.sh' in text
    assert "|| true" not in "".join(
        ln for ln in text.splitlines() if "pip install" in ln)
    assert (DEPLOY / "backup_full.sh").read_text().count("umask 077") == 1


def test_prod_compose():
    """docker-compose.prod.yml mirrors the reference's prod compose: app +
    nginx, persistent volume for DB/compile-cache, healthcheck, restart
    policy, resource limits."""
    text = (ROOT / "docker-compose.prod.yml").read_text()
    for needle in ("restart: always", "healthcheck:", "env_file:",
                   "AMW_COMPILATION_CACHE_DIR=/data/jax_cache",
                   "AMW_DB_PATH=/data/amw_tpu.sqlite3", "nginx",
                   "amw-tpu.compose.conf", "resources:"):
        assert needle in text, needle
    conf = (DEPLOY / "nginx" / "amw-tpu.compose.conf").read_text()
    assert "server app:8000;" in conf  # compose upstream, not localhost


def test_systemd_unit_fields():
    unit = (DEPLOY / "systemd" / "amw-tpu.service").read_text()
    for field in ("ExecStart=", "Restart=always", "OnFailure=",
                  "WorkingDirectory=", "EnvironmentFile="):
        assert field in unit, field


def test_env_example_keys_match_settings():
    """Every AMW_/MAGIC_MASTER_ key in env.production.example must name a
    real Settings field — a renamed field must not silently orphan the
    documented deployment config."""
    text = (DEPLOY / "env.production.example").read_text()
    fields = {f.upper() for f in Settings.__dataclass_fields__}
    keys = re.findall(r"^(?:AMW|MAGIC_MASTER)_([A-Z0-9_]+)=", text,
                      flags=re.M)
    assert len(keys) >= 40
    unknown = [k for k in keys if k not in fields]
    assert not unknown, f"env example keys with no Settings field: {unknown}"


def test_env_example_covers_critical_settings():
    text = (DEPLOY / "env.production.example").read_text()
    for key in ("JWT_SECRET", "COMPILATION_CACHE_DIR", "ENGINE_MESH",
                "ENGINE_WARMUP_BUCKETS", "HTDEMUCS_CHECKPOINT"):
        assert f"AMW_{key}=" in text, key
