"""Micro-batching job scheduler: the TPU-native replacement for the
reference's thread-per-job execution model.

The reference runs each mastering job on its own worker thread
(asyncio.to_thread + semaphores, SURVEY §2.4).  On a TPU, concurrent jobs
that resolve to the SAME compiled graph (same sample rate, length bucket,
channel count, chain config) should execute as ONE vmapped batch — device
throughput then matches the benchmark's batched numbers instead of the
single-track latency.

``Batcher`` collects submissions per graph key for up to ``window_ms`` (or
until ``max_batch`` is reached), stacks them, runs the engine's batch graph
once, and resolves each submitter's future.  Batch graphs are compiled
lazily per (key, rounded batch size) — sizes round up to powers of two so a
burst of 3 jobs reuses the 4-wide executable with one padded slot.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np
import jax


@dataclass
class _Pending:
    x: np.ndarray
    aux: object = None  # per-item metadata stacked alongside x (e.g. n_valid)
    future: Future = field(default_factory=Future)


class Batcher:
    """Generic same-graph micro-batcher.

    ``run_batch(key, xb)`` must be provided by the owner: it executes the
    batch [B, ...] for ``key`` and returns a list/array of per-item results.
    """

    def __init__(self, run_batch, *, window_ms: float = 50.0,
                 max_batch: int = 8):
        self._run_batch = run_batch
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self._lock = threading.Condition()
        self._queues: dict = {}
        self._thread = None
        self._stop = False

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self):
        with self._lock:
            self._stop = True
            self._lock.notify_all()
        if self._thread:
            self._thread.join(timeout=5)
            self._thread = None
        self._stop = False

    def submit(self, key, x: np.ndarray, aux=None,
               max_batch: int | None = None) -> Future:
        """``max_batch``: per-key cap (e.g. memory-derived from the item
        size) — the effective cap is the min over submissions for the key
        and the batcher-wide max."""
        item = _Pending(x=x, aux=aux)
        with self._lock:
            self._queues.setdefault(key, {"items": [], "first_ts": None,
                                          "cap": None})
            q = self._queues[key]
            if max_batch is not None:
                q["cap"] = (max_batch if q.get("cap") is None
                            else min(q["cap"], max_batch))
            q["items"].append(item)
            if q["first_ts"] is None:
                q["first_ts"] = time.monotonic()
            self._lock.notify_all()
        return item.future

    def _take_ready(self):
        now = time.monotonic()
        ready = []
        next_deadline = None
        for key, q in self._queues.items():
            if not q["items"]:
                continue
            deadline = q["first_ts"] + self.window
            cap = min(self.max_batch, q.get("cap") or self.max_batch)
            if len(q["items"]) >= cap or now >= deadline:
                ready.append((key, q["items"][:cap]))
                q["items"] = q["items"][cap:]
                if not q["items"]:
                    # cap is per-group, not a lifetime minimum: once the
                    # backlog drains, future submissions re-establish it
                    # (a transient low cap must not pin the key forever).
                    q["cap"] = None
                q["first_ts"] = time.monotonic() if q["items"] else None
            else:
                next_deadline = (deadline if next_deadline is None
                                 else min(next_deadline, deadline))
        return ready, next_deadline

    def _loop(self):
        while True:
            with self._lock:
                ready, deadline = self._take_ready()
                if not ready:
                    if self._stop:
                        return
                    timeout = (max(0.0, deadline - time.monotonic())
                               if deadline is not None else 0.5)
                    self._lock.wait(timeout=timeout)
                    continue
            for key, items in ready:
                try:
                    xb = np.stack([it.x for it in items])
                    if any(it.aux is not None for it in items):
                        auxb = np.stack([it.aux for it in items])
                        outs = self._run_batch(key, xb, auxb)
                    else:
                        outs = self._run_batch(key, xb)
                    for it, out in zip(items, outs):
                        it.future.set_result(out)
                except Exception as e:  # noqa: BLE001
                    for it in items:
                        if not it.future.done():
                            it.future.set_exception(e)


class BatchedChainRunner:
    """Batcher specialization for v2 chain graphs.

    ``key`` = (spec, canonical config string); the batch executable is
    jit(vmap(chain)) compiled lazily per (key, B_pow2) and cached.
    """

    def __init__(self, *, window_ms: float = 50.0, max_batch: int = 8):
        self._graphs: dict = {}
        self._glock = threading.Lock()
        self.batcher = Batcher(self._run, window_ms=window_ms,
                               max_batch=max_batch)
        self.batcher.start()

    def _batch_graph(self, key, b_pow2: int):
        import jax.numpy as jnp

        from ..models.chain import compile_chain

        spec, config_json = key
        gkey = (key, b_pow2)
        with self._glock:
            hit = self._graphs.get(gkey)
        if hit is not None:
            return hit
        import json as _json

        chain = compile_chain(spec, _json.loads(config_json), jit=False)
        fn = jax.jit(lambda xb, p: jax.vmap(chain.raw_fn, in_axes=(0, None))(xb, p))
        params = jax.device_put(chain.params)
        with self._glock:
            self._graphs.setdefault(gkey, (fn, params))
        return self._graphs[gkey]

    def _run(self, key, xb: np.ndarray):
        b = xb.shape[0]
        b_pow2 = 1 << (b - 1).bit_length()
        fn, params = self._batch_graph(key, b_pow2)
        if b_pow2 != b:
            pad = np.repeat(xb[:1], b_pow2 - b, axis=0)
            xb = np.concatenate([xb, pad], axis=0)
        out = np.asarray(fn(xb, params))
        return [out[i] for i in range(b)]

    def master(self, spec, config_json: str, x: np.ndarray,
               timeout: float = 600.0) -> np.ndarray:
        """Blocking per-call API (runs on a worker thread): submit and wait."""
        fut = self.batcher.submit((spec, config_json), x)
        return fut.result(timeout=timeout)

    def close(self):
        self.batcher.stop()
