"""Mastering execution engine: compiled-graph cache + job runners.

The reference runs numpy chains on worker threads; here each job resolves to
a cached, fused, jitted TPU graph keyed by (sample rate, length bucket,
channels, chain/pro configuration).  Variable track lengths hit a small set
of buckets so steady-state service traffic never recompiles; the loudness
target is a runtime parameter inside the graph.
"""

from __future__ import annotations

import json
import threading
import time

import numpy as np
import jax

from ..models.pipeline_v1 import build_v1_pipeline
from ..models.v2_job import build_v2_job_graph
from ..ops import basic, design, meters
from ..spec import GraphSpec
from ..utils.audio_io import export_audio, load_audio_from_bytes
from .config import settings

_SILENT_MSG = (
    "Processing produced silence. Disable some of the extra modules "
    "(Spectral Denoiser, De-esser, Transient Designer, Parallel Compression, "
    "Dynamic EQ) and try again."
)
_NANINF_MSG = (
    "Processing produced invalid values (NaN/Inf). Disable Dynamic EQ or "
    "other extra modules and try again."
)


class ValidationError(ValueError):
    pass


import contextlib
import os


@contextlib.contextmanager
def _maybe_profile(tag: str):
    """JAX profiler capture when AMW_PROFILE_DIR is set (the TPU analog of
    the reference's mastering-trace observability, SURVEY §5.1) — produces
    xprof traces viewable in TensorBoard/Perfetto."""
    prof_dir = os.environ.get("AMW_PROFILE_DIR")
    if not prof_dir:
        yield
        return
    with jax.profiler.trace(os.path.join(prof_dir, tag)):
        yield


class MasteringEngine:
    """Thread-safe cache of compiled mastering graphs."""

    def __init__(self, exact: bool | None = None, bucket: bool = True,
                 micro_batch: bool | None = None):
        from . import compile_cache

        compile_cache.enable()  # restart-warm starts (no-op when disabled)
        self.exact = settings.engine_exact_mode if exact is None else exact
        self.bucket = bucket
        self.micro_batch = (settings.engine_micro_batch
                            if micro_batch is None else micro_batch)
        # Serving mesh: with >1 local device the micro-batcher shards its
        # batches data-parallel over a dp mesh, and long uploads route to
        # the sequence-parallel path (parallel/timeshard.py) — the TPU
        # answer to the reference's semaphore concurrency
        # (jobs_store.py:19-20).  Single-chip service behavior is unchanged.
        self.mesh = None
        if settings.engine_mesh:
            try:
                import jax as _jax

                from ..parallel.mesh import init_distributed, make_mesh

                # Multi-host pods: join the jax.distributed cluster before
                # any device use (required for the runtime to see the local
                # chips at all on some deployments).  The SERVING mesh is
                # then built over this process's LOCAL devices only: an
                # HTTP job lands on one process, and a jit laid out over
                # other hosts' (non-addressable) devices cannot be driven
                # from one process — SPMD programs need every process to
                # execute the same computation.  Pods therefore scale
                # serving with one service replica per host (sp/dp confined
                # to each host's ICI domain, job traffic balanced above) —
                # docs/SCALING.md; pod-wide meshes stay available to SPMD
                # batch scripts via parallel.mesh.make_pod_mesh.
                if settings.engine_coordinator:
                    init_distributed(
                        settings.engine_coordinator,
                        settings.engine_num_processes or None,
                        None if settings.engine_process_id < 0
                        else settings.engine_process_id)
                if len(_jax.local_devices()) > 1:
                    self.mesh = make_mesh(local_only=True)
            except Exception:  # noqa: BLE001 — backend probe must not kill init
                self.mesh = None
        n_mesh = self.mesh.devices.size if self.mesh is not None else 1
        from collections import OrderedDict

        # LRU-capped: every distinct (bucket, chain-config, target, style)
        # signature compiles its own graph whose params/executable pin HBM
        # and host memory — unbounded custom configs would otherwise leak.
        self._cache: "OrderedDict" = OrderedDict()
        self._batch_graphs: "OrderedDict" = OrderedDict()
        self._cache_cap = 32
        # Sequence-parallel graphs compile per exact track length (the
        # track-end edge windows need static lengths), so distinct long
        # uploads rarely share one; give them their own small LRU so a
        # burst of DJ-set jobs cannot evict the hot bucketed dp graphs.
        self._sp_cache: "OrderedDict" = OrderedDict()
        self._sp_cache_cap = 4
        self._dur_ema: dict = {}  # graph key -> EMA of run wall time (sec)
        self._lock = threading.Lock()
        self._batcher = None
        self.last_batch_info: dict | None = None
        if self.micro_batch:
            from .batcher import Batcher

            # Per-batch capacity scales with the mesh: 8 tracks per device.
            self._batcher = Batcher(
                self._run_v2_batch,
                window_ms=settings.engine_batch_window_ms,
                max_batch=settings.engine_max_micro_batch * n_mesh)
            self._batcher.start()

    # -- graph cache -------------------------------------------------------

    def _get_graph(self, kind: str, spec: GraphSpec, key_extra: str, build):
        key = (kind, spec, key_extra)
        cache = self._sp_cache if kind == "sp" else self._cache
        cap = self._sp_cache_cap if kind == "sp" else self._cache_cap
        with self._lock:
            hit = cache.get(key)
            if hit is not None:
                cache.move_to_end(key)
                return hit
        built = build()
        with self._lock:
            cache.setdefault(key, built)
            cache.move_to_end(key)
            while len(cache) > cap:
                old_key, _ = cache.popitem(last=False)
                # drop batch graphs derived from the evicted base graph
                # (their keys are (base_key, b_pow2))
                for bk in [b for b in self._batch_graphs
                           if b[0] == old_key]:
                    self._batch_graphs.pop(bk, None)
            return cache[key]


    def _note_duration(self, ema_key, dt: float) -> None:
        """EMA of a graph's wall time for progress interpolation; bounded
        (oldest-inserted entries dropped) so unbounded distinct configs
        don't leak key strings.  Locked: concurrent job threads write here,
        and an unguarded evicting ``pop`` could race another thread's pop
        and fail a job over progress-only bookkeeping."""
        with self._lock:
            prev = self._dur_ema.get(ema_key)
            self._dur_ema[ema_key] = (dt if prev is None
                                      else 0.7 * prev + 0.3 * dt)
            while len(self._dur_ema) > 4 * self._cache_cap:
                self._dur_ema.pop(next(iter(self._dur_ema)), None)

    def _get_duration(self, ema_key) -> float | None:
        with self._lock:
            return self._dur_ema.get(ema_key)

    # Tracks shorter than this (seconds) compile at their exact length:
    # the valid-end dynamic edge windows (ops.validctx) need the valid
    # region to dominate the largest filter settle window, and sub-3 s
    # tracks compile quickly anyway.
    MIN_BUCKET_SEC = 3.0

    def _spec_for(self, sr: int, n: int, channels: int):
        if self.bucket and n >= int(self.MIN_BUCKET_SEC * sr):
            bn = n
            from ..parallel.batch import DEFAULT_BUCKETS_SEC

            # Ladder cap (engine_max_bucket_sec): the long buckets trade
            # padded compute for shared executables; beyond the cap (HBM
            # working set ~32·nfft bytes) uploads compile at exact length.
            max_sec = float(settings.engine_max_bucket_sec or 0)
            for s in DEFAULT_BUCKETS_SEC:
                if max_sec and s > max_sec:
                    break
                cand = int(round(s * sr))
                if cand >= n:
                    bn = cand
                    break
            else:
                bn = n
        else:
            bn = n
        return GraphSpec(sr=sr, n=bn, channels=channels, exact=self.exact)

    @staticmethod
    def _pad(x: np.ndarray, n_bucket: int) -> np.ndarray:
        pad = n_bucket - x.shape[-1]
        if pad <= 0:
            return x
        return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])

    # -- job runners -------------------------------------------------------
    # (No host-side DC pre-pass: the in-graph dc_offset op averages over the
    # traced n_valid — ops/basic.remove_dc_offset — so bucket padding cannot
    # dilute the correction, and amount<1 blends of the dc module keep the
    # reference's partial-removal semantics.)

    def master_v2_bytes(
        self, data: bytes, filename: str, *,
        target_lufs: float, out_format: str = "wav", style: str = "standard",
        chain_config: dict | None = None, dither_type: str | None = None,
        auto_blank_sec: float | None = None, bitrate: int | None = None,
        pro: dict | None = None, progress=None,
    ) -> dict:
        """Full v2 job: decode → fused graph → validate → export."""
        report = progress or (lambda pct, msg: None)
        report(2, "Loading audio…")
        audio, sr = load_audio_from_bytes(data, filename or "wav")
        if (pro or {}).get("apply_vocal_isolation"):
            from . import settings_store

            if not settings_store.get_setting_bool(
                    "vocal_isolation_enabled",
                    settings.vocal_isolation_enabled):
                raise RuntimeError("Vocal isolation is disabled on this server")
            report(3, "Vocal isolation…")
            from ..models import vocal

            # htdemucs (converted weights) when configured, DSP fallback.
            # On a >1-device serving mesh the separator's window groups
            # shard across dp (htdemucs_jax.separate_mesh).
            audio = vocal.isolate_vocal(audio, sr, mesh=self.mesh)
            pro = {k: v for k, v in pro.items() if k != "apply_vocal_isolation"}
        n, C = audio.shape[-1], audio.shape[0]
        if (self.mesh is not None
                and n > int(settings.engine_sp_threshold_sec * sr)):
            # DJ-set-length upload: time-shard the single track over the
            # serving mesh instead of compiling a huge single-device graph.
            try:
                return self._master_v2_sp(
                    audio, sr, target_lufs=target_lufs, out_format=out_format,
                    style=style, chain_config=chain_config,
                    dither_type=dither_type, auto_blank_sec=auto_blank_sec,
                    bitrate=bitrate, pro=pro, report=report)
            except ValidationError:
                raise  # real output failure — re-mastering won't change it
            except ValueError as e:
                # Config unsupported by the time-shard builder (reverb IR
                # wider than the halo, non-uniform gating grid, track too
                # short for the shard count): serve on the single-device
                # path instead of failing a job the single-chip engine
                # handles fine.
                import logging

                logging.getLogger("amw_tpu.engine").warning(
                    "sp path rejected config (%s); falling back to the "
                    "single-device graph", e)
        spec = self._spec_for(sr, n, C)
        key = json.dumps(
            {"cfg": chain_config, "pro": pro, "style": style,
             "t": round(float(target_lufs), 2)},
            sort_keys=True, default=str)
        report(5, "Mastering (v2)…")
        from . import progress as prog_mod

        use_ticks = (progress is not None and self._batcher is None
                     and prog_mod.callbacks_supported())
        cache_extra = key + (";ticks" if use_ticks else "")
        params, fn, (names, _raw) = self._get_graph(
            "v2", spec, cache_extra,
            lambda: self._built_v2(spec, chain_config, pro, target_lufs,
                                   style, use_ticks),
        )
        audio = np.ascontiguousarray(audio, np.float32)
        xb = self._pad(audio, spec.n)
        nv = np.int32(n)
        ema_key = ("v2", spec, key)
        t0 = time.monotonic()
        with _maybe_profile("master_v2"):
            if self._batcher is not None:
                ema = self._get_duration(ema_key) if progress else None
                # Memory-derived batch cap: B=8 at the 180 s bucket is the
                # validated PER-DEVICE HBM working set; longer buckets batch
                # fewer tracks (a 600 s bucket caps at 2 per device), and a
                # serving mesh multiplies the cap by its device count.
                n_mesh = self.mesh.devices.size if self.mesh is not None else 1
                cap = n_mesh * max(1, int((8 * 180 * 44100) // max(spec.n, 1)))
                with prog_mod.TimedTicker(names, report, ema):
                    res = self._batcher.submit(
                        ("v2", spec, key), xb, aux=nv,
                        max_batch=cap).result(timeout=600.0)
                dt = time.monotonic() - t0
                self._note_duration(ema_key, dt)
            elif use_ticks:
                tok = prog_mod.register(names, report)
                try:
                    res = fn(xb, params, nv, np.int32(tok))
                    res = {k: np.asarray(v) for k, v in res.items()}
                finally:
                    prog_mod.unregister(tok)
            else:
                # Backends without host callbacks (axon relay): interpolate
                # stage progress against this graph's measured wall time.
                ema = self._get_duration(ema_key) if progress else None
                with prog_mod.TimedTicker(names, report, ema):
                    res = fn(xb, params, nv)
                    res = {k: np.asarray(v) for k, v in res.items()}
                dt = time.monotonic() - t0
                self._note_duration(ema_key, dt)
        out = np.asarray(res["out"])[..., :n]
        return self._finish_v2(
            out, sr, res, report, out_format=out_format,
            chain_config=chain_config, dither_type=dither_type,
            auto_blank_sec=auto_blank_sec, bitrate=bitrate)

    def _finish_v2(self, out, sr, res, report, *, out_format, chain_config,
                   dither_type, auto_blank_sec, bitrate) -> dict:
        """Shared v2 tail: validate device stats, export, shape the reply."""
        before = float(np.asarray(res["before_lufs"]))
        after = float(np.asarray(res["after_lufs"]))
        peak = float(np.asarray(res["peak"]))
        finite = bool(np.asarray(res["finite"]))

        if out.size == 0 or peak < 1e-5:
            raise ValidationError(_SILENT_MSG)
        if not finite:
            raise ValidationError(_NANINF_MSG)

        report(98, "Exporting file…")
        dt = dither_type or (chain_config or {}).get("dither_type") or "tpdf"
        if dt not in ("tpdf", "ns_e", "ns_itu"):
            dt = "tpdf"
        ab = (auto_blank_sec if auto_blank_sec is not None
              else float((chain_config or {}).get("auto_blank_sec", 0) or 0))
        out_bytes = export_audio(out, sr, out_format.lower(), dither_type=dt,
                                 auto_blank_sec=max(0.0, ab), bitrate=bitrate)
        return {
            "bytes": out_bytes, "sr": sr,
            "before_lufs": None if before < -1e8 else before,
            "after_lufs": None if after < -1e8 else after,
        }

    def _master_v2_sp(self, audio, sr, *, target_lufs, out_format, style,
                      chain_config, dither_type, auto_blank_sec, bitrate,
                      pro, report) -> dict:
        """Sequence-parallel v2 job: ONE long track time-sharded over the
        serving mesh (parallel/timeshard.py) with the same (config, pro)
        surface.  Used for uploads past ``engine_sp_threshold_sec`` — the
        800 MB DJ-set capability (reference config.py:26-33) served across
        every chip instead of one.  Graphs cache per (track length, config)
        — exact lengths are deliberate: the track-end edge-window variants
        that make sp output match the single-chip graph need static window
        sizes, so bucketing long tracks would reintroduce the zero-history
        end divergence.  Distinct long uploads therefore usually pay one
        compile each (amortized over minutes of audio); sp graphs live in
        their own small LRU so they can't evict the hot dp bucket graphs,
        and the persistent compilation cache absorbs repeats across
        restarts."""
        from ..parallel.timeshard import build_sp_master

        audio = np.ascontiguousarray(audio, np.float32)
        C, n = audio.shape
        # Length quantization (engine_sp_quantize_sec): snap the track up to
        # a grid so distinct long uploads share one compiled sp executable
        # instead of paying a fresh exact-length compile each.  The pad is
        # mastered as trailing silence — BS.1770 gating discards silent
        # blocks (≤ ~0.001 LU effect on a >10 min track) and the output is
        # sliced back to the true length before export.
        grid = int(float(settings.engine_sp_quantize_sec or 0) * sr)
        n_q = ((n + grid - 1) // grid) * grid if grid > 0 else n
        key = json.dumps(
            {"cfg": chain_config, "pro": pro, "style": style,
             "t": round(float(target_lufs), 2), "sp": True},
            sort_keys=True, default=str)
        report(5, "Mastering (sequence-parallel)…")
        fn, params, n_pad = self._get_graph(
            "sp", (sr, n_q, C), key,
            lambda: build_sp_master(
                sr, n_q, C, self.mesh, target_lufs=target_lufs, style=style,
                chain_config=chain_config, pro=pro, stats=True))
        xp = np.pad(audio, ((0, 0), (0, n_pad - n)))
        ema_key = ("sp", (sr, n_q, C), key)
        from . import progress as prog_mod

        t0 = time.monotonic()
        with _maybe_profile("master_v2_sp"):
            ema = self._get_duration(ema_key)
            with prog_mod.TimedTicker(["sp_master"], report, ema):
                res = fn(xp, params)
                res = {k: np.asarray(v) for k, v in res.items()}
            self._note_duration(ema_key, time.monotonic() - t0)
        out = res["out"][..., :n]
        return self._finish_v2(
            out, sr, res, report, out_format=out_format,
            chain_config=chain_config, dither_type=dither_type,
            auto_blank_sec=auto_blank_sec, bitrate=bitrate)

    def warmup(self, buckets_sec=(180.0,), sr: int = 44100,
               target_lufs: float = -14.0, style: str = "standard") -> None:
        """Precompile (and execute once on zeros) the default v2 graph for
        the given buckets so the first production job doesn't pay the
        ~minute-scale first compile.  Run from a background thread at
        service startup (settings.engine_warmup)."""
        for sec in buckets_sec:
            try:
                spec = GraphSpec(sr=sr, n=int(round(sec * sr)), channels=2,
                                 exact=self.exact)
                key = json.dumps(
                    {"cfg": None, "pro": {}, "style": style,
                     "t": round(float(target_lufs), 2)},
                    sort_keys=True, default=str)
                _, fn, _ = self._get_graph(
                    "v2", spec, key,
                    lambda: self._built_v2(spec, None, {}, target_lufs,
                                           style))
                x = np.zeros((2, spec.n), np.float32)
                if self._batcher is not None:
                    # Production jobs run through the micro-batcher, whose
                    # (mesh-wide) batch executable is a different program —
                    # warm THAT one, via the same code path.
                    self._run_v2_batch(("v2", spec, key), x[None],
                                       np.asarray([spec.n], np.int32))
                else:
                    jax.block_until_ready(
                        fn(x, self._cache[("v2", spec, key)][0],
                           np.int32(spec.n)))
            except Exception:  # noqa: BLE001 — warmup is best-effort
                import logging

                logging.getLogger("amw_tpu.engine").warning(
                    "warmup failed for bucket %.0fs", sec, exc_info=True)
        # htdemucs: when a converted checkpoint is configured, precompile
        # the whole-track separation executable for every window-count
        # bucket the warmup durations imply (the scan executable keys on
        # that power-of-two bucket, not the exact length).
        if buckets_sec:
            try:
                from ..models import vocal

                vocal.warmup_htdemucs(buckets_sec)
            except Exception:  # noqa: BLE001 — warmup is best-effort
                import logging

                logging.getLogger("amw_tpu.engine").warning(
                    "htdemucs warmup failed", exc_info=True)

    def _put_params(self, params):
        """Graph params live replicated over the serving mesh (when one
        exists) so sharded batch steps start without a per-call reshard."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(params, NamedSharding(self.mesh, P()))
        return jax.device_put(params)

    def _built_v2(self, spec, chain_config, pro, target_lufs, style,
                  stage_ticks: bool = False):
        params, raw_fn, names = build_v2_job_graph(
            spec, chain_config, pro, target_lufs, style, jit=False,
            stage_ticks=stage_ticks,
        )
        # Ordered host callbacks (stage ticks) only run single-device —
        # pin that variant to one chip instead of the serving mesh.
        put = jax.device_put if stage_ticks else self._put_params
        return put(params), jax.jit(raw_fn), (names, raw_fn)

    # -- micro-batching (see runtime/batcher.py) ---------------------------

    def _batch_size_for(self, b: int) -> int:
        """Compiled batch width for ``b`` submitted tracks: next power of
        two, rounded up to a multiple of the serving mesh so the dp
        sharding divides evenly (a burst of 3 jobs on a v5e-8 runs as one
        8-wide sharded step, one track per chip)."""
        b_eff = 1 << (b - 1).bit_length()
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            b_eff = n_dev * (-(-b_eff // n_dev))
        return b_eff

    def _run_v2_batch(self, bkey, xb, nvb):
        kind, spec, key = bkey
        with self._lock:
            entry = self._cache.get((kind, spec, key))
        if entry is None:
            # LRU-evicted between submit and batch execution (needs >cap
            # distinct compiles inside one 50 ms batch window — effectively
            # impossible, but fail with a retryable message, not KeyError).
            raise RuntimeError(
                "compiled graph evicted under cache pressure; retry the job")
        params, _fn, (names, raw_fn) = entry
        b = xb.shape[0]
        b_eff = self._batch_size_for(b)
        gkey = (bkey, b_eff)
        with self._lock:
            bfn = self._batch_graphs.get(gkey)
        if bfn is None:
            if self.mesh is not None:
                # Data-parallel serving step: the micro-batch shards over
                # the dp mesh with replicated graph params — this is where
                # the HTTP service actually uses every chip on the board.
                from jax.sharding import NamedSharding, PartitionSpec as P

                axis = self.mesh.axis_names[0]
                x_sh = NamedSharding(self.mesh, P(axis))
                p_sh = NamedSharding(self.mesh, P())
                bfn = jax.jit(
                    lambda x, p, nv: jax.vmap(raw_fn, in_axes=(0, None, 0))(
                        x, p, nv),
                    in_shardings=(x_sh, p_sh, x_sh))
            else:
                bfn = jax.jit(
                    lambda x, p, nv: jax.vmap(raw_fn, in_axes=(0, None, 0))(
                        x, p, nv))
            with self._lock:
                self._batch_graphs.setdefault(gkey, bfn)
            bfn = self._batch_graphs[gkey]
        nvb = np.asarray(nvb, np.int32)
        if b_eff != b:
            xb = np.concatenate(
                [xb, np.repeat(xb[:1], b_eff - b, axis=0)], axis=0)
            nvb = np.concatenate([nvb, np.repeat(nvb[:1], b_eff - b)])
        res = bfn(xb, params, nvb)
        # Observability for /api/metrics and the mesh serving tests: how
        # wide the step ran and across how many devices it was sharded.
        self.last_batch_info = {
            "batch": b, "batch_compiled": b_eff,
            "devices": len(getattr(res["out"], "sharding",
                                   None).device_set)
            if hasattr(res["out"], "sharding") else 1,
        }
        res = {k: np.asarray(v) for k, v in res.items()}
        return [{k: v[i] for k, v in res.items()} for i in range(b)]

    def master_v1_bytes(
        self, data: bytes, filename: str, *,
        target_lufs: float, out_format: str = "wav", style: str = "standard",
        denoise_strength: float = 0.0, transient_attack: float = 1.0,
        transient_sustain: float = 1.0, reference_env=None,
        reference_strength: float = 0.8, dither_type: str = "tpdf",
        bitrate: int | None = None, progress=None,
    ) -> dict:
        report = progress or (lambda pct, msg: None)
        report(2, "Loading audio…")
        audio, sr = load_audio_from_bytes(data, filename or "wav")
        n, C = audio.shape[-1], audio.shape[0]
        spec = self._spec_for(sr, n, C)
        key = json.dumps(
            {"style": style, "t": round(float(target_lufs), 2),
             "dn": round(float(denoise_strength), 2),
             "ta": round(float(transient_attack), 2),
             "ts": round(float(transient_sustain), 2),
             "ref": reference_env is not None,
             "rs": round(float(reference_strength), 2)},
            sort_keys=True)
        report(5, "Mastering…")
        from . import progress as prog_mod

        use_ticks = progress is not None and prog_mod.callbacks_supported()
        cache_extra = key + (";ticks" if use_ticks else "")
        params, fn, names = self._get_graph(
            "v1", spec, cache_extra,
            lambda: self._built_v1(spec, target_lufs, style, denoise_strength,
                                   transient_attack, transient_sustain,
                                   reference_env, reference_strength,
                                   use_ticks),
        )
        audio = np.ascontiguousarray(audio, np.float32)
        xb = self._pad(audio, spec.n)
        ema_key = ("v1", spec, key)
        t0 = time.monotonic()
        with _maybe_profile("master_v1"):
            if use_ticks:
                tok = prog_mod.register(names, report)
                try:
                    res = fn(xb, params, np.int32(n), np.int32(tok))
                    res = {k: np.asarray(v) for k, v in res.items()}
                finally:
                    prog_mod.unregister(tok)
            else:
                ema = self._get_duration(ema_key) if progress else None
                with prog_mod.TimedTicker(names, report, ema):
                    res = fn(xb, params, np.int32(n))
                    res = {k: np.asarray(v) for k, v in res.items()}
                dt = time.monotonic() - t0
                self._note_duration(ema_key, dt)
        out = np.asarray(res["out"])[..., :n]
        before = float(np.asarray(res["before_lufs"]))
        after = float(np.asarray(res["after_lufs"]))
        peak = float(np.asarray(res["peak"]))
        finite = bool(np.asarray(res["finite"]))
        if out.size == 0 or peak < 1e-5:
            raise ValidationError(_SILENT_MSG)
        if not finite:
            raise ValidationError(_NANINF_MSG)
        report(98, "Exporting file…")
        out_bytes = export_audio(out, sr, out_format.lower(),
                                 dither_type=dither_type, bitrate=bitrate)
        return {
            "bytes": out_bytes, "sr": sr,
            "before_lufs": None if before < -1e8 else before,
            "after_lufs": None if after < -1e8 else after,
        }

    def _built_v1(self, spec, target_lufs, style, denoise_strength,
                  transient_attack, transient_sustain, reference_env,
                  reference_strength, stage_ticks: bool = False):
        params, raw_fn, names = build_v1_pipeline(
            spec, target_lufs=target_lufs, style=style,
            denoise_strength=denoise_strength,
            transient_attack=transient_attack,
            transient_sustain=transient_sustain,
            reference_env=reference_env,
            reference_strength=reference_strength, jit=False,
            stage_ticks=stage_ticks,
        )
        settle = meters.k_weight_settle(spec.sr)
        nfft = design.next_fft_size(spec.n + settle)
        Hk = meters.k_weight_response(spec.sr, nfft)
        try:
            plan = meters.plan_blocks(spec.sr, spec.n)
        except ValueError:
            plan = None
        all_params = list(params) + [[Hk]]

        def fn(x, ps, n_valid=None, prog_tok=None):
            before = (meters.integrated_lufs(x, ps[-1][0], nfft, plan,
                                             n_valid=n_valid)
                      if plan is not None else np.float32(-1e9))
            y = raw_fn(x, ps[:-1], n_valid, prog_tok)
            after = (meters.integrated_lufs(y, ps[-1][0], nfft, plan,
                                            n_valid=n_valid)
                     if plan is not None else np.float32(-1e9))
            finite, peak = basic.validate_stats(y)
            return {"out": y, "before_lufs": before, "after_lufs": after,
                    "peak": peak, "finite": finite}

        return jax.device_put(all_params), jax.jit(fn), names


    # -- synchronous tools -------------------------------------------------

    def reference_match_bytes(self, data_src: bytes, fname_src: str,
                              data_ref: bytes, fname_ref: str, *,
                              strength: float = 0.8,
                              out_format: str = "wav",
                              bitrate: int | None = None) -> dict:
        """Reference mastering tool (mastering.py:1305-1366): match the
        source's spectral balance to the reference track."""
        from ..models.v2_job import build_v2_job_graph  # noqa: F401 (engine dep)
        from ..ops.spectral import build_reference_match
        from ..refimpl import pipeline as refimpl

        audio, sr = load_audio_from_bytes(data_src, fname_src)
        ref_audio, ref_sr = load_audio_from_bytes(data_ref, fname_ref)
        if ref_sr != sr:
            ref_mono = np.mean(ref_audio, axis=0)
            ref_audio = refimpl.resample_fft(
                ref_mono[None], ref_sr, sr)
        ref_env = refimpl.spectral_envelope(ref_audio, sr)
        n, C = audio.shape[-1], audio.shape[0]
        spec = self._spec_for(sr, n, C)
        # The reference envelope is a runtime parameter (params[0]), so the
        # jitted graph is cached per (spec, strength) and reused across
        # different reference tracks.
        key = f"refmatch:{round(float(strength), 3)}"

        def _build_tool():
            from ..ops import validctx

            raw = build_reference_match(spec, np.ones_like(ref_env),
                                        strength=float(strength))[1]

            def tool_fn(x, p, nv):
                # Source-envelope frames and output anchored at the valid
                # length of the bucket-padded track.
                with validctx.valid_length(nv):
                    return validctx.mask_tail(raw(x, p))

            return None, jax.jit(tool_fn), None

        cached = self._get_graph("tool", spec, key, _build_tool)
        _, fn, _ = cached
        params = jax.device_put(
            build_reference_match(spec, ref_env, strength=float(strength))[0])
        xb = self._pad(np.ascontiguousarray(audio, np.float32), spec.n)
        out = np.asarray(fn(xb, params, np.int32(n)))[..., :n]
        out_bytes = export_audio(out, sr, out_format.lower(), bitrate=bitrate)
        return {"bytes": out_bytes, "sr": sr}

    def upscale_bytes(self, data: bytes, filename: str, *,
                      target_sr: int) -> dict:
        """FFT resample to a higher rate + 16-bit WAV (mastering.py:1369-1406)."""
        from ..ops.fdfilter import resample_fft, resample_plan

        audio, sr = load_audio_from_bytes(data, filename)
        if target_sr <= sr:
            raise ValueError(
                f"Upscale: target_sr ({target_sr}) must exceed the current "
                f"sample rate ({sr})")
        n = audio.shape[-1]
        n_out = int(round(n * target_sr / sr))

        def _build_upscale():
            # Bluestein tables ride as runtime args: arbitrary track lengths
            # are not native TPU FFT sizes (fdfilter.resample_plan).
            plan = resample_plan(n, n_out)
            plan_dev = (jax.device_put(plan) if plan else None)
            return (jax.jit(lambda x, p: resample_fft(x, n_out, p)), plan_dev)

        # Through _get_graph: one cached graph per (sr, n, target) with LRU
        # eviction — upscale keys are effectively per-track (arbitrary n).
        jfn, plan_dev = self._get_graph(
            "upscale", (sr, n), str(target_sr), _build_upscale)
        out = np.asarray(jfn(np.ascontiguousarray(audio, np.float32),
                             plan_dev))
        out_bytes = export_audio(out.astype(np.float32), target_sr, "wav",
                                 dither_type="tpdf")
        return {"bytes": out_bytes, "sr": target_sr}


# Module-level default engine (created lazily by the service).
_default_engine: MasteringEngine | None = None


def get_engine() -> MasteringEngine:
    global _default_engine
    if _default_engine is None:
        _default_engine = MasteringEngine()
    return _default_engine
