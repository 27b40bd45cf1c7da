#!/usr/bin/env bash
# amw_tpu — install / update / restart on a TPU VM (no Docker).
# Capability parity with the reference's deploy/deploy.sh, adapted to the
# TPU serving stack: a venv with the baked JAX/libtpu, a persistent XLA
# compilation cache volume, and graph warmup at service start.
#
#   First run (full install):   sudo ./deploy.sh install
#   Code update:                sudo ./deploy.sh update
#   Restart only:               sudo ./deploy.sh restart
#
# The repository is expected to be cloned at INSTALL_DIR (or run this
# script from a checkout; it copies itself over).

set -euo pipefail

INSTALL_DIR="${INSTALL_DIR:-/opt/amw-tpu}"
APP_USER="${APP_USER:-amwtpu}"
APP_GROUP="${APP_GROUP:-amwtpu}"
VENV_DIR="$INSTALL_DIR/venv"
SERVICE="amw-tpu.service"
# Persistent XLA compilation cache: compiled chain executables survive
# restarts, so a restarted service's first job loads in ~seconds instead
# of paying the minute-scale compile (runtime/compile_cache.py).
CACHE_DIR="${CACHE_DIR:-$INSTALL_DIR/.jax_cache}"

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
PROJECT_ROOT="$(cd "$SCRIPT_DIR/.." && pwd)"
if [ -f "$PROJECT_ROOT/requirements.txt" ]; then
    SOURCE_ROOT="$PROJECT_ROOT"
else
    SOURCE_ROOT="$INSTALL_DIR"
fi

log() { echo "[deploy] $*"; }

need_root() {
    if [ "$(id -u)" -ne 0 ]; then
        echo "run with sudo: sudo $0 $1" >&2
        exit 1
    fi
}

sync_code() {
    if [ "$SOURCE_ROOT" != "$INSTALL_DIR" ]; then
        log "syncing $SOURCE_ROOT -> $INSTALL_DIR"
        mkdir -p "$INSTALL_DIR"
        rsync -a --delete \
            --exclude venv --exclude .jax_cache --exclude backups \
            --exclude '*.sqlite3' --exclude .env \
            "$SOURCE_ROOT/" "$INSTALL_DIR/"
    fi
    # A checkout that lost the executable bit would silently disable the
    # whole alert chain (systemd OnFailure requires an executable
    # ExecStart; backup_full.sh skips non-executable ALERT_SCRIPT).
    chmod +x "$INSTALL_DIR"/deploy/*.sh
}

pip_install() {
    # A failed dependency install must not relaunch the service on stale
    # or broken packages — fail the deploy loudly instead.
    if ! "$VENV_DIR/bin/pip" install -q -r "$INSTALL_DIR/requirements.txt"; then
        log "ERROR: pip install failed — NOT restarting the service."
        log "Fix the dependency problem and re-run, or restart manually."
        exit 1
    fi
}

build_native() {
    # C++ PCM helpers (amw_tpu/native); falls back to numpy when absent.
    if command -v g++ >/dev/null 2>&1; then
        log "building native PCM extension"
        (cd "$INSTALL_DIR" && "$VENV_DIR/bin/python" -m amw_tpu.native.build) \
            || log "native build failed — numpy fallback stays active"
    fi
}

do_install() {
    need_root install
    log "full install into $INSTALL_DIR"

    log "system packages (ffmpeg, nginx, python venv)"
    if command -v apt-get >/dev/null 2>&1; then
        apt-get update -qq
        apt-get install -y -qq ffmpeg nginx python3-venv rsync || true
    fi

    id -u "$APP_USER" >/dev/null 2>&1 || useradd -r -m -s /usr/sbin/nologin "$APP_USER"
    sync_code

    if [ ! -d "$VENV_DIR" ]; then
        log "creating venv (system site packages: keeps the image's jax/libtpu)"
        python3 -m venv --system-site-packages "$VENV_DIR"
    fi
    pip_install
    build_native

    mkdir -p "$CACHE_DIR" "$INSTALL_DIR/backups"
    [ -f "$INSTALL_DIR/.env" ] || {
        cp "$INSTALL_DIR/deploy/env.production.example" "$INSTALL_DIR/.env"
        log "created .env from example — EDIT IT (jwt secret, tokens) before exposing the service"
    }
    # .env holds the JWT secret / admin password / API keys and backups/
    # bundles .env — owner-only, never world-readable.
    chmod 600 "$INSTALL_DIR/.env"
    chmod 700 "$INSTALL_DIR/backups"
    chown -R "$APP_USER:$APP_GROUP" "$INSTALL_DIR"

    log "systemd units"
    sed "s|/opt/amw-tpu|$INSTALL_DIR|g; s|User=amwtpu|User=$APP_USER|; \
         s|/usr/bin/python3|$VENV_DIR/bin/python|" \
        "$INSTALL_DIR/deploy/systemd/amw-tpu.service" \
        > /etc/systemd/system/amw-tpu.service
    cp "$INSTALL_DIR/deploy/systemd/amw-tpu-alert@.service" /etc/systemd/system/
    systemctl daemon-reload
    systemctl enable "$SERVICE"

    if [ -d /etc/nginx/sites-enabled ]; then
        log "nginx reverse proxy"
        cp "$INSTALL_DIR/deploy/nginx/amw-tpu.conf" /etc/nginx/sites-available/amw-tpu.conf
        ln -sf /etc/nginx/sites-available/amw-tpu.conf /etc/nginx/sites-enabled/amw-tpu.conf
        nginx -t && systemctl reload nginx
    fi

    systemctl restart "$SERVICE"
    log "installed; check: systemctl status $SERVICE / curl localhost:8000/api/health"
}

do_update() {
    need_root update
    sync_code
    pip_install
    build_native
    chown -R "$APP_USER:$APP_GROUP" "$INSTALL_DIR"
    systemctl restart "$SERVICE"
    log "updated + restarted (warm restart: first job reloads executables from $CACHE_DIR)"
}

case "${1:-}" in
    install) do_install ;;
    update)  do_update ;;
    restart) need_root restart; systemctl restart "$SERVICE"; log restarted ;;
    *) echo "usage: $0 {install|update|restart}" >&2; exit 1 ;;
esac
