#!/usr/bin/env bash
# amw_tpu — full backup: SQLite DB + .env + nginx confs (capability parity
# with the reference's deploy/backup_full.sh).  Gzip archive, rotation that
# keeps RESERVE_PERCENT of the disk free, alert hook on failure.
# Cron: 0 4,16 * * * /opt/amw-tpu/deploy/backup_full.sh
#
# Env:
#   BACKUP_DIR       backup directory   (default <root>/backups)
#   RESERVE_PERCENT  free-space floor % (default 15)
#   ALERT_SCRIPT     alert hook         (default deploy/alert.sh)
#   DB_PATH          sqlite file        (default <root>/amw_tpu.sqlite3)

set -euo pipefail
# The archive bundles the plaintext .env (secrets): keep everything this
# script writes owner-only.
umask 077

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
PROJECT_ROOT="$(cd "$SCRIPT_DIR/.." && pwd)"
BACKUP_DIR="${BACKUP_DIR:-$PROJECT_ROOT/backups}"
RESERVE_PERCENT="${RESERVE_PERCENT:-15}"
ALERT_SCRIPT="${ALERT_SCRIPT:-$SCRIPT_DIR/alert.sh}"
DB_PATH="${DB_PATH:-$PROJECT_ROOT/amw_tpu.sqlite3}"
LOG_FILE="$BACKUP_DIR/backup.log"

mkdir -p "$BACKUP_DIR"
STAMP="$(date +%Y%m%d_%H%M%S)"
ARCHIVE="$BACKUP_DIR/backup_full_${STAMP}.tar.gz"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT

log() { echo "[$(date '+%Y-%m-%d %H:%M:%S')] $*" | tee -a "$LOG_FILE"; }

alert() {
    if [ -x "$ALERT_SCRIPT" ]; then "$ALERT_SCRIPT" "backup_full: $*" || true; fi
}

free_percent() {
    df -P "$BACKUP_DIR" | awk 'NR==2 {printf "%d", 100 - $5}' | tr -d %
}

# 1. Consistent DB snapshot via sqlite's online-backup API (not cp: a
#    mid-transaction copy can be unreadable).
if [ -f "$DB_PATH" ]; then
    if command -v sqlite3 >/dev/null 2>&1; then
        sqlite3 "$DB_PATH" ".backup '$STAGE/$(basename "$DB_PATH")'"
    else
        python3 - "$DB_PATH" "$STAGE/$(basename "$DB_PATH")" <<'PY'
import sqlite3, sys
src = sqlite3.connect(sys.argv[1])
dst = sqlite3.connect(sys.argv[2])
with dst:
    src.backup(dst)
PY
    fi
else
    log "no DB at $DB_PATH (fresh install?) — archiving config only"
fi

# 2. Config + reverse proxy.
[ -f "$PROJECT_ROOT/.env" ] && cp "$PROJECT_ROOT/.env" "$STAGE/env"
if [ -d /etc/nginx ]; then
    mkdir -p "$STAGE/nginx"
    cp -r /etc/nginx/sites-available "$STAGE/nginx/" 2>/dev/null || true
fi

tar -czf "$ARCHIVE" -C "$STAGE" .
log "wrote $ARCHIVE ($(du -h "$ARCHIVE" | cut -f1))"

# 3. Rotation: delete oldest while the free-space floor is breached
#    (always keep the newest archive).
while [ "$(free_percent)" -lt "$RESERVE_PERCENT" ]; do
    OLDEST="$(ls -1t "$BACKUP_DIR"/backup_full_*.tar.gz 2>/dev/null | tail -1)"
    [ -n "$OLDEST" ] && [ "$OLDEST" != "$ARCHIVE" ] || break
    log "free space < ${RESERVE_PERCENT}% — removing $OLDEST"
    rm -f "$OLDEST"
done

if [ "$(free_percent)" -lt "$RESERVE_PERCENT" ]; then
    log "WARNING: still below the ${RESERVE_PERCENT}% free-space floor"
    alert "disk below ${RESERVE_PERCENT}% free after rotation"
fi
