"""Deploy-tree sanity: the ops files the reference ships (deploy/*,
reference deploy/deploy.sh, backup_full.sh, env.production) stay present,
syntactically valid, and consistent with the runtime Settings surface."""

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
