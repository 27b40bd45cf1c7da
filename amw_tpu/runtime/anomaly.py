"""Anomaly monitor background loop (reference: bot/anomaly_monitor.py:38-129).

Every ``interval`` seconds checks CPU load, available RAM, disk space,
process RSS, the last-hour job error rate, and queue length against
thresholds, and sends throttled Telegram admin alerts.
"""

from __future__ import annotations

import asyncio
import logging
import time

from . import db, jobs, notifier
from .server_metrics import server_metrics

logger = logging.getLogger("amw_tpu.anomaly")

THRESHOLDS = {
    "load_1m": 8.0,
    "min_available_mb": 300.0,
    "min_disk_mb": 200.0,
    "max_rss_mb": 12000.0,
    "max_error_rate": 0.5,
    "max_queue": 10,
}


def check_anomalies() -> list[str]:
    alerts = []
    m = server_metrics()
    if m["load_1m"] > THRESHOLDS["load_1m"]:
        alerts.append(f"High CPU load: {m['load_1m']}")
    if 0 < m["mem_available_mb"] < THRESHOLDS["min_available_mb"]:
        alerts.append(f"Low RAM: {m['mem_available_mb']} MB available")
    if 0 < m["disk_free_mb"] < THRESHOLDS["min_disk_mb"]:
        alerts.append(f"Low disk: {m['disk_free_mb']} MB free")
    if m["rss_mb"] > THRESHOLDS["max_rss_mb"]:
        alerts.append(f"High RSS: {m['rss_mb']} MB")
    try:
        hour = time.time() - 3600
        with db.connect() as c:
            total = c.execute(
                "SELECT COUNT(*) n FROM mastering_jobs WHERE created_at > ?",
                (hour,)).fetchone()["n"]
            errors = c.execute(
                "SELECT COUNT(*) n FROM mastering_jobs WHERE created_at > ?"
                " AND status='error'", (hour,)).fetchone()["n"]
        if total >= 4 and errors / total > THRESHOLDS["max_error_rate"]:
            alerts.append(f"Job error rate {errors}/{total} in the last hour")
    except Exception:  # noqa: BLE001
        pass
    queue = jobs.counts()["jobs_running"]
    if queue > THRESHOLDS["max_queue"]:
        alerts.append(f"Queue length {queue}")
    return alerts


async def anomaly_loop(interval: float = 60.0):
    while True:
        try:
            for alert in check_anomalies():
                notifier.notify_admin(f"⚠️ {alert}", throttle_key=alert[:24])
        except Exception as e:  # noqa: BLE001
            logger.warning("anomaly check failed: %s", e)
        await asyncio.sleep(interval)
