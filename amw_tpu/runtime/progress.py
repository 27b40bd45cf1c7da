"""Per-stage progress for fused mastering graphs.

The reference reports ~17 stage updates per job from its Python stage loop
(backend/app/pipeline.py:1834-1907 → SSE at routers/mastering.py:1472).  A
fused XLA graph has no Python between stages, so stage completion is
surfaced one of two ways:

- **Device ticks** (CPU, real TPU): ``jax.debug.callback`` after each stage
  inside the jitted graph posts (token, stage_idx) to the registry below —
  real, observed progress with stage labels.
- **Timed interpolation** (axon TPU relay, which supports neither host
  callbacks nor honest intermediate readiness): the engine keeps an EMA of
  each graph's wall time and a ticker thread maps elapsed time onto the
  stage list.  Labels are real stage names; timing is an estimate (marked as
  such in the message).
"""

from __future__ import annotations

import itertools
import threading
import time

import numpy as np

_registry: dict = {}
_reg_lock = threading.Lock()
_tokens = itertools.count(1)

_CB_SUPPORTED: bool | None = None


def callbacks_supported() -> bool:
    """Probe once whether jax.debug.callback works on the default backend
    (the axon TPU relay raises UNIMPLEMENTED)."""
    global _CB_SUPPORTED
    if _CB_SUPPORTED is None:
        try:
            import jax

            def probe(x):
                jax.debug.callback(lambda v: None, x)
                return x + 1

            jax.block_until_ready(jax.jit(probe)(np.float32(0)))
            _CB_SUPPORTED = True
        except Exception:  # noqa: BLE001 — any backend failure means "no"
            _CB_SUPPORTED = False
    return _CB_SUPPORTED


def register(names, report) -> int:
    """Register a job's stage list + report callback; returns the token to
    pass into the graph."""
    tok = next(_tokens)
    with _reg_lock:
        _registry[tok] = {"names": list(names), "report": report, "last": -1}
    return tok


def unregister(tok: int) -> None:
    with _reg_lock:
        _registry.pop(tok, None)


def emit_stage_tick(tok, idx) -> None:
    """Called from inside the graph via jax.debug.callback (possibly out of
    order — progress is monotonic via ``last``)."""
    try:
        entry = _registry.get(int(tok))
        if entry is None:
            return
        i = int(idx)
        if i <= entry["last"]:
            return
        entry["last"] = i
        names = entry["names"]
        pct = 5 + int(90 * (i + 1) / max(len(names), 1))
        label = names[i] if i < len(names) else f"stage {i}"
        entry["report"](min(pct, 97), f"Mastering: {label}")
    except Exception:  # noqa: BLE001 — progress must never break a job
        pass


class TimedTicker:
    """Elapsed-time → stage-list interpolation for backends without device
    callbacks.  ``expected_sec`` comes from the engine's per-graph EMA; with
    no history the ticker stays quiet (the coarse 5/98% updates remain)."""

    def __init__(self, names, report, expected_sec: float | None,
                 interval: float = 0.15):
        self.names = list(names)
        self.report = report
        self.expected = expected_sec
        self.interval = interval
        self._stop = threading.Event()
        self._thread = None

    def __enter__(self):
        if self.expected and self.expected > 0.2 and self.names:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._t0 = time.monotonic()
            self._thread.start()
        return self

    def _run(self):
        last = -1
        while not self._stop.wait(self.interval):
            frac = min((time.monotonic() - self._t0) / self.expected, 0.97)
            i = min(int(frac * len(self.names)), len(self.names) - 1)
            # Emit every stage passed since the previous tick, not just the
            # current position: a starved ticker thread (loaded host) would
            # otherwise skip labels and SSE clients would see the stage list
            # jump s2 -> s7.
            for j in range(last + 1, i + 1):
                pct = 5 + int(90 * (j + 1) / len(self.names))
                self.report(min(pct, 97), f"Mastering: {self.names[j]} (est)")
            last = max(last, i)

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)
        return False
