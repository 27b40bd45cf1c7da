#!/bin/sh
# Nightly SQLite backup (cron), mirrors deploy/backup_db.sh in the reference.
set -eu
DB="${AMW_DB_PATH:-/opt/amw-tpu/amw_tpu.sqlite3}"
OUT_DIR="${AMW_BACKUP_DIR:-/opt/amw-tpu/backups}"
KEEP_DAYS="${AMW_BACKUP_KEEP_DAYS:-14}"
mkdir -p "$OUT_DIR"
STAMP="$(date +%Y%m%d_%H%M%S)"
sqlite3 "$DB" ".backup '$OUT_DIR/db_$STAMP.sqlite3'"
gzip "$OUT_DIR/db_$STAMP.sqlite3"
find "$OUT_DIR" -name 'db_*.sqlite3.gz' -mtime "+$KEEP_DAYS" -delete
echo "backup done: $OUT_DIR/db_$STAMP.sqlite3.gz"
