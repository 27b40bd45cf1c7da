#!/bin/sh
# Disk space monitor (cron): alert when free space is low.
set -eu
THRESHOLD_MB="${AMW_DISK_MIN_MB:-500}"
FREE_MB=$(df -Pm / | awk 'NR==2 {print $4}')
if [ "$FREE_MB" -lt "$THRESHOLD_MB" ]; then
    /opt/amw-tpu/deploy/alert.sh "Low disk space: ${FREE_MB}MB free"
fi
