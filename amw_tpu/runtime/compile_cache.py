"""Persistent XLA compilation cache wiring.

The CPU reference starts mastering instantly; a TPU service pays a
~minute-scale XLA compile per (bucket, config) graph.  JAX's persistent
compilation cache (``jax_compilation_cache_dir``) keeps compiled
executables on disk so a restarted process — or the warmup pass — loads
them in seconds.  Enabled by default via ``settings.compilation_cache_dir``
(env ``AMW_COMPILATION_CACHE_DIR``; "" disables); the Docker image mounts
the directory as a volume so the cache survives container rebuilds.
"""

from __future__ import annotations

import logging
import os

_enabled_path: str | None = None


def enable(path: str | None = None) -> bool:
    """Idempotently point JAX at a persistent compilation cache directory.

    Returns True when the cache is active.  Safe to call before or after
    backend initialisation (the cache config is not backend-pinned)."""
    global _enabled_path
    if path is None:
        from .config import settings

        path = settings.compilation_cache_dir
    if not path:
        return False
    path = os.path.abspath(path)
    if _enabled_path == path:
        return True
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: mastering graphs are all worth persisting, and
        # the default 1 GiB-per-entry / 1 s-compile thresholds would skip
        # the small tool graphs that still cost relay round-trips.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled_path = path
        return True
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        logging.getLogger("amw_tpu.compile_cache").warning(
            "persistent compilation cache unavailable at %s", path,
            exc_info=True)
        return False
