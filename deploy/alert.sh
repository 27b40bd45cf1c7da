#!/bin/sh
# Telegram alert helper used by systemd OnFailure and cron monitors.
# Cron contexts (backup_full.sh, disk_monitor.sh) don't inherit the
# service environment, so when the token isn't already set this reads it
# from the install's .env — accepting both the reference's MAGIC_MASTER_
# prefix and AMW_ (matching runtime/config.py `_env`).  Values are
# extracted with sed, not sourced: .env may hold arbitrary secrets.
set -eu
MSG="${1:-alert}"
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
ENV_FILE="${AMW_ENV_FILE:-$SCRIPT_DIR/../.env}"

env_val() {
    [ -f "$ENV_FILE" ] || return 0
    sed -n "s/^$1=//p" "$ENV_FILE" | tail -1
}

TOKEN="${MAGIC_MASTER_TELEGRAM_BOT_TOKEN:-${AMW_TELEGRAM_BOT_TOKEN:-}}"
CHAT="${MAGIC_MASTER_TELEGRAM_ADMIN_CHAT_ID:-${AMW_TELEGRAM_ADMIN_CHAT_ID:-}}"
[ -n "$TOKEN" ] || TOKEN="$(env_val MAGIC_MASTER_TELEGRAM_BOT_TOKEN)"
[ -n "$TOKEN" ] || TOKEN="$(env_val AMW_TELEGRAM_BOT_TOKEN)"
[ -n "$CHAT" ] || CHAT="$(env_val MAGIC_MASTER_TELEGRAM_ADMIN_CHAT_ID)"
[ -n "$CHAT" ] || CHAT="$(env_val AMW_TELEGRAM_ADMIN_CHAT_ID)"

if [ -n "$TOKEN" ] && [ -n "$CHAT" ]; then
    curl -s -X POST "https://api.telegram.org/bot${TOKEN}/sendMessage" \
        -d chat_id="${CHAT}" -d text="🚨 ${MSG}" >/dev/null || true
else
    logger -t amw-tpu "ALERT: ${MSG}"
fi
