#!/bin/sh
# Telegram alert helper used by systemd OnFailure and cron monitors.
set -eu
MSG="${1:-alert}"
TOKEN="${MAGIC_MASTER_TELEGRAM_BOT_TOKEN:-}"
CHAT="${MAGIC_MASTER_TELEGRAM_ADMIN_CHAT_ID:-}"
if [ -n "$TOKEN" ] && [ -n "$CHAT" ]; then
    curl -s -X POST "https://api.telegram.org/bot${TOKEN}/sendMessage" \
        -d chat_id="${CHAT}" -d text="🚨 ${MSG}" >/dev/null || true
else
    logger -t amw-tpu "ALERT: ${MSG}"
fi
