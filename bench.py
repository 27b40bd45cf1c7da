#!/usr/bin/env python
"""Benchmark: full v1 mastering chain throughput on one TPU chip.

Workload = BASELINE config #1: 3-minute stereo 44.1 kHz track -> -14 LUFS
"spotify" default chain (the reference's ``run_mastering_pipeline``), fused
into one jitted graph and vmapped over a batch.  Prints ONE JSON line per
completed section, each a full snapshot of the results so far — the LAST
parseable line is the record, and it is complete after every section even
if the driver kills the process mid-run (VERDICT r3: the final-emit-only
design lost the whole round-3 record to a driver timeout).

Compile cost: the persistent XLA compilation cache is enabled against
``BENCH_CACHE_DIR`` (default ``.jax_cache`` next to this file, the same
directory the deployed service uses) — on a warmed machine every graph in
this file loads from disk in ~1 s instead of paying the 30-50 s remote
compile, which keeps the whole run well inside the driver budget.

Timing notes: on the axon relay backend ``block_until_ready`` returns at
remote enqueue, so every measurement is fenced by fetching a scalar
reduction of the output (forces full execution), with the relay round-trip
baseline measured separately and subtracted.
"""

import json
import os
import signal
import sys
import time

import numpy as np

# Keep the watchdog WELL below the driver's budget: with per-section emits
# a late stall costs only the unfinished sections, never the record.
WATCHDOG_SEC = int(os.environ.get("BENCH_WATCHDOG_SEC", "2100"))

RESULTS = {
    "metric": "realtime_factor_v1_chain",
    "value": 0.0,
    "unit": "x_realtime_per_chip",
    "vs_baseline": 0.0,
    "sections": [],
}


def emit(extra=None, section=None):
    if section:
        RESULTS["sections"].append(section)
    out = dict(RESULTS)
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def _watchdog(signum, frame):
    emit({"partial": True,
          "error": f"watchdog at {WATCHDOG_SEC}s — sections after the last "
                   "reported one did not finish (slow remote compile or "
                   "relay stall)"})
    os._exit(0 if RESULTS["value"] else 2)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_track(sr: int, dur_sec: float, seed: int = 0) -> np.ndarray:
    g = np.random.default_rng(seed)
    n = int(sr * dur_sec)
    t = np.arange(n) / sr
    x = (0.28 * np.sin(2 * np.pi * 110 * t)
         + 0.12 * np.sin(2 * np.pi * 997 * t)
         + 0.06 * np.sin(2 * np.pi * 6100 * t)
         + 0.05 * g.standard_normal(n))
    env = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 0.25 * t))
    left = (x * env).astype(np.float32)
    right = (0.85 * x * env).astype(np.float32)
    return np.clip(np.stack([left, right]), -0.99, 0.99)


def _wait_for_backend():
    """Block until the TPU backend initializes in a probe SUBPROCESS.

    A relay left in a bad state by a previous client (failed compile,
    killed waiter — docs/TPU_NOTES.md) surfaces as backend-init
    UNAVAILABLE, and a failed init is cached for the process lifetime in
    jax, so the retry must happen in fresh subprocesses.  Probes are never
    killed (a killed claim-waiter re-wedges the relay); a probe that
    hangs is exactly the wait the bench would have paid anyway, and the
    outer watchdog still bounds the total run."""
    import subprocess

    # Default sized for the round-3 outage signature (docs/TPU_NOTES.md):
    # backend-init failures can persist for hours, each probe hanging
    # ~25 min — so wait most of the watchdog budget before giving up.
    deadline = time.time() + int(os.environ.get(
        "BENCH_INIT_WAIT_SEC", str(max(WATCHDOG_SEC - 300, 900))))
    while True:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True)
        if r.returncode == 0:
            return
        if time.time() > deadline:
            log("backend never initialized:", r.stderr.strip()[-200:])
            emit({"error": "TPU backend unavailable after init wait"})
            os._exit(2)
        log("backend init failed; retrying in 60s")
        time.sleep(60)


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_SEC)
    _wait_for_backend()
    # Re-arm: an outage recovery may have eaten most of the budget — the
    # measurement itself still deserves the full window.
    signal.alarm(WATCHDOG_SEC)
    import jax
    import jax.numpy as jnp

    from amw_tpu import refimpl
    from amw_tpu.models.pipeline_v1 import build_v1_pipeline
    from amw_tpu.runtime import compile_cache
    from amw_tpu.spec import GraphSpec

    cache_dir = os.environ.get(
        "BENCH_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    if compile_cache.enable(cache_dir):
        log(f"persistent compile cache: {cache_dir}")
        RESULTS["compile_cache"] = True

    sr = 44100
    dur = 180.0
    n = int(sr * dur)
    log(f"devices: {jax.devices()}")

    # Tiny transfer FIRST: when the relay is wedged (a dead claim from an
    # interrupted run — docs/TPU_NOTES.md) this is where the hang shows,
    # with a clear log line, instead of blaming the big params transfer.
    t0 = time.perf_counter()
    float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
    log(f"relay probe: first tiny put+sum {time.perf_counter() - t0:.1f}s")

    spec = GraphSpec(sr=sr, n=n, channels=2, exact=True)
    params, raw_fn, names = build_v1_pipeline(
        spec, target_lufs=-14.0, style="standard", jit=False
    )
    log(f"stages: {names}")
    t0 = time.perf_counter()
    params_dev = jax.device_put(params)
    log(f"params transfer dispatched in {time.perf_counter() - t0:.1f}s")

    def batched(b):
        return jax.jit(
            lambda xb, p: jnp.sum(
                jnp.square(jax.vmap(raw_fn, in_axes=(0, None))(xb, p))
            )
        )

    # fence(): fetching a scalar forces execution through the relay.
    def fence(v):
        return float(v)

    # Relay round-trip baseline.  The RTT drifts during a run (a congested
    # relay has measured 204 ms at startup vs ~30 ms steady) and it is
    # SUBTRACTED from every section's wall time, so a stale high estimate
    # can push single-dispatch latencies negative.  measure_relay() is
    # re-run before the latency-sensitive sections and keeps the minimum
    # seen (congestion noise is one-sided).
    ready = jax.device_put(np.ones(8, np.float32))

    def measure_relay():
        nonlocal relay
        for _ in range(2):
            fence(jnp.sum(ready))
        t0 = time.perf_counter()
        for _ in range(4):
            fence(jnp.sum(ready))
        relay = min(relay, (time.perf_counter() - t0) / 4)
        return relay

    relay = float("inf")
    measure_relay()
    log(f"relay round-trip: {relay*1e3:.0f} ms")
    RESULTS["relay_rtt_ms"] = round(relay * 1e3, 1)

    # Find the largest micro-batch that compiles (remote compiler limits).
    # B=16 at 180 s hits an XLA TPU bounds-check failure (an N x N operand
    # materializes during fusion) and the failed compile can wedge the axon
    # relay session — only attempt it when explicitly asked.
    trials = (8, 4, 2, 1)
    if os.environ.get("BENCH_TRY_B16") == "1":
        trials = (16,) + trials
    micro = None
    step = None
    xb = None
    for trial in trials:
        try:
            tracks = np.stack([make_track(sr, dur, seed=i) for i in range(trial)])
            xb = jax.device_put(tracks)
            f = batched(trial)
            t0 = time.perf_counter()
            fence(f(xb, params_dev))
            dt_c = time.perf_counter() - t0
            log(f"micro-batch={trial} compiled+ran in {dt_c:.1f}s")
            # Warm-cache telemetry: with <repo>/.jax_cache populated by a
            # previous run this reads ~1-4 s (persistent-cache hit through
            # the relay, docs/TPU_NOTES.md round-4) instead of 30-60 s.
            RESULTS.setdefault("compile_s", {})["chain"] = round(dt_c, 1)
            micro, step = trial, f
            break
        except Exception as e:  # noqa: BLE001
            log(f"micro-batch={trial} failed: {type(e).__name__}: {str(e)[:160]}")
    if step is None:
        emit({"error": "no batch size compiled"})
        return

    # Steady-state throughput (amortize the fence over several dispatches).
    reps = 4
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = step(xb, params_dev)
    fence(acc)
    dt = (time.perf_counter() - t0 - relay) / reps
    rtf = micro * dur / dt
    log(f"throughput: {dt:.3f}s per batch of {micro} -> {rtf:.0f}x realtime")
    RESULTS.update({"value": round(rtf, 1), "batch": micro})
    emit(section="throughput")

    # Single-track p50 latency (its own compiled graph).
    step1 = batched(1)
    x1 = jax.device_put(make_track(sr, dur, seed=0)[None])
    fence(step1(x1, params_dev))
    measure_relay()  # refresh: p50 is a single dispatch, RTT-dominated
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        fence(step1(x1, params_dev))
        lats.append(max(0.0, time.perf_counter() - t0 - relay))
    p50 = float(np.median(lats))
    log(f"p50 single-track latency: {p50*1e3:.0f} ms")
    RESULTS["p50_latency_ms"] = round(p50 * 1e3, 1)
    emit(section="p50")

    # CPU oracle baseline + parity on a shorter probe (the quality gate —
    # run it before the slow-compiling extras).
    try:
        probe_dur = 20.0
        probe = make_track(sr, probe_dur, seed=99)
        t0 = time.perf_counter()
        want = refimpl.v1_pipeline(probe, sr, target_lufs=-14.0,
                                   style="standard")
        cpu_dt = time.perf_counter() - t0
        cpu_rtf = probe_dur / cpu_dt
        log(f"CPU oracle (1 core): {cpu_dt:.1f}s for {probe_dur}s -> "
            f"{cpu_rtf:.2f}x realtime")

        pspec = GraphSpec(sr=sr, n=int(sr * probe_dur), channels=2, exact=True)
        pparams, pfn, _ = build_v1_pipeline(pspec, target_lufs=-14.0,
                                            style="standard", jit=True)
        got = np.asarray(pfn(probe, jax.device_put(pparams)))
        err = float(np.max(np.abs(got.astype(np.float64) - want)))
        err_dbfs = 20 * np.log10(max(err, 1e-12))
        lu_delta = abs(refimpl.integrated_lufs(got, sr)
                       - refimpl.integrated_lufs(want, sr))
        out_lufs = refimpl.integrated_lufs(got, sr)
        tp = refimpl.true_peak_dbfs(got, sr)
        log(f"parity: max err {err_dbfs:.1f} dBFS, LU delta {lu_delta:.4f}, "
            f"out LUFS {out_lufs:.2f}, TP {tp:.2f} dBTP")
        RESULTS.update({
            "vs_baseline": round(rtf / cpu_rtf, 1),
            "cpu_oracle_rtf": round(cpu_rtf, 2),
            "parity_max_err_dbfs": round(err_dbfs, 1),
            "parity_lu_delta": round(lu_delta, 4),
            "out_lufs": round(out_lufs, 2),
            "out_true_peak_dbtp": round(tp, 2),
        })
        emit(section="parity")
    except Exception as e:  # noqa: BLE001
        log(f"parity section failed: {type(e).__name__}: {str(e)[:200]}")

    # Multi-core CPU oracle (VERDICT r3 weak #7): the reference serves
    # concurrent jobs via 2+1 semaphore slots (jobs_store.py:19-20), so the
    # defensible speedup denominator is the oracle thread-pooled across a
    # batch, not one core.  numpy releases the GIL in its inner loops.
    try:
        from concurrent.futures import ThreadPoolExecutor

        threads = min(os.cpu_count() or 1, 8)
        jobs = [make_track(sr, probe_dur, seed=50 + i)
                for i in range(threads)]
        with ThreadPoolExecutor(threads) as pool:  # warm the pool
            t0 = time.perf_counter()
            list(pool.map(
                lambda tr: refimpl.v1_pipeline(tr, sr, target_lufs=-14.0,
                                               style="standard"), jobs))
            mc_dt = time.perf_counter() - t0
        mc_rtf = threads * probe_dur / mc_dt
        log(f"CPU oracle ({threads} threads): {mc_dt:.1f}s for "
            f"{threads}x{probe_dur}s -> {mc_rtf:.2f}x realtime")
        RESULTS.update({
            "cpu_oracle_rtf_multicore": round(mc_rtf, 2),
            "cpu_oracle_threads": threads,
            "vs_baseline_multicore": round(rtf / mc_rtf, 1),
        })
        emit(section="oracle_multicore")
    except Exception as e:  # noqa: BLE001
        log(f"multicore oracle failed: {type(e).__name__}: {str(e)[:160]}")

    # Sustained batch throughput (BASELINE config #4): stream 256 tracks of
    # MIXED valid lengths through the bucketed, valid-length-masked v2 path
    # in micro-batch chunks, dispatches pipelined, one fence at the end.
    # Device buffers are reused across dispatches so this measures sustained
    # compute throughput (production overlaps host I/O with device work).
    try:
        from amw_tpu.models.v2_job import build_v2_job_graph

        vparams, vraw, _vn = build_v2_job_graph(
            spec, None, {}, target_lufs=-14.0, style="standard", jit=False)
        vstep = jax.jit(
            lambda xb, p, nv: jnp.sum(jnp.square(
                jax.vmap(vraw, in_axes=(0, None, 0))(xb, p, nv)["out"])))
        vp = jax.device_put(vparams)
        g = np.random.default_rng(7)
        nvb = jax.device_put(
            g.integers(int(0.8 * n), n, size=micro).astype(np.int32))
        t0 = time.perf_counter()
        fence(vstep(xb, vp, nvb))
        dt_c = time.perf_counter() - t0
        log(f"masked v2 batch={micro} compiled+ran in {dt_c:.1f}s")
        RESULTS.setdefault("compile_s", {})["masked_v2"] = round(dt_c, 1)
        total_tracks = 256
        n_disp = max(1, total_tracks // micro)
        acc = None
        t0 = time.perf_counter()
        for _ in range(n_disp):
            acc = vstep(xb, vp, nvb)
        fence(acc)
        sus_dt = time.perf_counter() - t0 - relay
        done = n_disp * micro
        sus_tpm = done / sus_dt * 60.0
        sus_rtf = done * dur / sus_dt
        log(f"sustained (BASELINE #4): {done} tracks in {sus_dt:.1f}s -> "
            f"{sus_tpm:.0f} tracks/min, {sus_rtf:.0f}x realtime, "
            f"recompiles: 0 (single cached executable)")
        RESULTS.update({"sustained_tracks_per_min": round(sus_tpm, 1),
                        "sustained_rtf": round(sus_rtf, 1)})
        # Dedicated production-path headline (round-5 item 3): steady-state
        # RTF of the bucketed, n_valid-masked v2 graph — the program
        # /api/v2/master actually serves — measured like the v1 headline
        # (per-dispatch, fence amortized).  Gate: >= 5000x.
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = vstep(xb, vp, nvb)
        fence(acc)
        v2_dt = (time.perf_counter() - t0 - relay) / reps
        v2_rtf = micro * dur / v2_dt
        log(f"masked v2 (production path): {v2_dt:.3f}s per batch of "
            f"{micro} -> {v2_rtf:.0f}x realtime")
        RESULTS["realtime_factor_v2_masked"] = round(v2_rtf, 1)
        emit(section="sustained")
    except Exception as e:  # noqa: BLE001
        log(f"sustained bench failed: {type(e).__name__}: {str(e)[:200]}")

    # Export path (BASELINE config #3): resample 44.1k -> 48k, TPDF dither,
    # 16-bit quantize — all on device; host WAV writing excluded (I/O).
    try:
        from amw_tpu.ops import dither as dither_ops
        from amw_tpu.ops.fdfilter import resample_fft, resample_plan

        key = jax.random.PRNGKey(0)
        out_batch_shape = (micro, 2, n)
        n48 = int(round(n * 48000 / sr))
        # Bluestein tables as runtime args: 180 s at 44.1/48 kHz is not a
        # native TPU FFT size (a bare jnp.fft there materializes an
        # f32[n, n] DFT).
        rplan = jax.device_put(resample_plan(n, n48))

        def export_step(y, k, plan):
            y48 = resample_fft(y, n48, plan)
            noise = dither_ops.dither_noise(k, y48.shape, "tpdf")
            return jnp.sum(dither_ops.quantize16(y48, noise).astype(jnp.int32))

        exp_jit = jax.jit(export_step)
        y_dev = jax.device_put(np.zeros(out_batch_shape, np.float32))
        fence(exp_jit(y_dev, key, rplan))
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = exp_jit(y_dev, key, rplan)
        fence(acc)
        exp_dt = (time.perf_counter() - t0 - relay) / reps
        exp_rtf = micro * dur / max(exp_dt, 1e-9)
        log(f"export path (48k resample + TPDF dither + int16): "
            f"{exp_dt:.3f}s -> {exp_rtf:.0f}x")
        RESULTS["export_path_rtf"] = round(exp_rtf, 1)
        emit(section="export")
    except Exception as e:  # noqa: BLE001
        log(f"export bench failed: {type(e).__name__}: {str(e)[:200]}")

    # Genre sweep (BASELINE config #2): club -9 with the edm style graph
    # (adds exciter + imager + parallel compression stages).
    try:
        params2, raw2, _ = build_v1_pipeline(
            spec, target_lufs=-9.0, style="edm", jit=False)
        step2 = jax.jit(
            lambda xb, p: jnp.sum(jnp.square(
                jax.vmap(raw2, in_axes=(0, None))(xb, p))))
        p2 = jax.device_put(params2)
        fence(step2(xb, p2))
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = step2(xb, p2)
        fence(acc)
        dt2 = (time.perf_counter() - t0 - relay) / reps
        sweep_rtf = micro * dur / dt2
        log(f"genre sweep (edm, -9 LUFS): {dt2:.3f}s -> {sweep_rtf:.0f}x")
        RESULTS["genre_sweep_rtf"] = round(sweep_rtf, 1)
        emit(section="genre_sweep")
    except Exception as e:  # noqa: BLE001
        log(f"genre sweep failed: {type(e).__name__}: {str(e)[:160]}")

    # True-peak-limited genre sweep gate (BASELINE config #3 / VERDICT r2
    # item 5): edm -9 graph + the 4x-oversampled TP limiter (ops/tplimit),
    # measured at probe length; gate out_true_peak_dbtp_limited <= -1.0.
    try:
        from amw_tpu.ops import meters as meters_ops
        from amw_tpu.ops.tplimit import build_true_peak_limiter

        probe_dur = 20.0
        pspec = GraphSpec(sr=sr, n=int(sr * probe_dur), channels=2,
                          exact=True)
        p3, raw3, _ = build_v1_pipeline(pspec, target_lufs=-9.0, style="edm",
                                        jit=False)
        _, tp_fn = build_true_peak_limiter(pspec, ceiling_db=-1.5)

        def sweep_tp(x, p):
            y = tp_fn(raw3(x, p), None)
            return meters_ops.true_peak_dbfs(y)

        jtp = jax.jit(sweep_tp)
        probe = make_track(sr, probe_dur, seed=99)
        p3d = jax.device_put(p3)
        tp_lim = fence(jtp(probe, p3d))
        t0 = time.perf_counter()
        tp_lim = fence(jtp(probe, p3d))
        tp_dt = time.perf_counter() - t0 - relay
        log(f"TP-limited sweep (edm -9 + tplimit): out TP "
            f"{tp_lim:.2f} dBTP (gate <= -1.0), probe {tp_dt*1e3:.0f} ms")
        RESULTS["out_true_peak_dbtp_limited"] = round(tp_lim, 2)
        emit(section="tp_gate")
    except Exception as e:  # noqa: BLE001
        log(f"TP-limited sweep failed: {type(e).__name__}: {str(e)[:160]}")

    # Persistent-compilation-cache restart warm start (VERDICT r2 item 3):
    # fresh subprocess compiles the probe graph twice — the second process
    # loads the executable from jax_compilation_cache_dir in seconds.
    # Deliberately run on the CPU backend: the restart-warm capability is
    # backend-agnostic, and a second live process must not contend for the
    # relay's device claim while this one holds it (docs/TPU_NOTES.md).
    # (The TPU-backend evidence is this very run: with BENCH_CACHE_DIR
    # warmed, the compile lines above read ~1 s instead of 30-50 s.)
    try:
        import subprocess
        import tempfile

        cc_dir = tempfile.mkdtemp(prefix="amw_jaxcache_")
        child = (
            "import os,sys,time,numpy as np\n"
            "sys.path.insert(0, '.')\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from amw_tpu.runtime import compile_cache\n"
            f"compile_cache.enable({cc_dir!r})\n"
            "from amw_tpu.models.pipeline_v1 import build_v1_pipeline\n"
            "from amw_tpu.spec import GraphSpec\n"
            f"spec = GraphSpec(sr={sr}, n={int(sr * 20.0)}, channels=2, "
            "exact=True)\n"
            "params, fn, _ = build_v1_pipeline(spec, target_lufs=-14.0, "
            "style='standard', jit=True)\n"
            "x = np.zeros((2, spec.n), np.float32)\n"
            "t0 = time.perf_counter()\n"
            "out = jax.block_until_ready(fn(x, jax.device_put(params)))\n"
            "print('FIRSTJOB', time.perf_counter() - t0)\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        times = []
        for tag in ("cold", "restart"):
            r = subprocess.run([sys.executable, "-c", child],
                               capture_output=True, text=True, timeout=900,
                               env=env,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in r.stdout.splitlines():
                if line.startswith("FIRSTJOB"):
                    times.append(float(line.split()[1]))
        if len(times) == 2:
            log(f"compile cache (cpu backend): cold first-job "
                f"{times[0]:.1f}s -> restart first-job {times[1]:.1f}s")
            RESULTS["cold_first_job_s"] = round(times[0], 1)
            RESULTS["restart_first_job_s"] = round(times[1], 1)
            emit(section="compile_cache")
    except Exception as e:  # noqa: BLE001
        log(f"compile-cache bench failed: {type(e).__name__}: {str(e)[:160]}")

    # Per-stage p50 map (VERDICT r2 item 6): marginal cost of each fused v1
    # stage at batch=micro via cumulative prefixes (see scripts/bench_stages
    # for caveats near fused pairs).  The optimization map.  Each prefix is
    # timed as the best of 3 timed pairs — a single 2-rep sample through the
    # relay carries ~±90 ms of scheduling noise (round-3's map showed an
    # IDENTITY style_eq stage at 179.8 ms marginal), best-of filters it.
    try:
        stage_fns = raw_fn.stage_fns
        stage_ms = {}
        prev = 0.0
        for k in range(1, len(names) + 1):
            def fn_k(x, ps, _k=k):
                y = x
                for f, p in zip(stage_fns[:_k], ps[:_k]):
                    y = f(y, p)
                return y

            jit_k = jax.jit(lambda x, p, f=fn_k: jnp.sum(jnp.square(
                jax.vmap(f, in_axes=(0, None))(x, p))))
            fence(jit_k(xb, params_dev))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                acc = None
                for _ in range(2):
                    acc = jit_k(xb, params_dev)
                fence(acc)
                dt = (time.perf_counter() - t0 - relay) / 2
                best = dt if best is None else min(best, dt)
            stage_ms[names[k - 1]] = round(max(best - prev, 0.0) * 1e3, 1)
            prev = best
        log("stage marginal ms: " + json.dumps(stage_ms))
        RESULTS["stage_ms"] = stage_ms
        emit(section="stage_map")
    except Exception as e:  # noqa: BLE001
        log(f"stage map failed: {type(e).__name__}: {str(e)[:160]}")

    # htdemucs (BASELINE config #5): released-shape forward RTF + the
    # isolate-vocal -> master end-to-end number (VERDICT r2 item 2), now
    # with the e2e budget split into stages (VERDICT r3 item 4).
    try:
        from amw_tpu.models import htdemucs_jax as hj

        cfg = hj.HTConfig()
        hparams = hj.init_params(cfg)
        # inference_params: cast to the serving dtype (bf16 on TPU) once,
        # host-side — forward() requires params already in the act dtype.
        hdev = jax.device_put(hj.inference_params(hparams))
        seg = cfg.segment_samples
        g = np.random.default_rng(0)
        mixb = jax.device_put(
            (0.1 * g.standard_normal((4, 2, seg))).astype(np.float32))
        hfwd = jax.jit(lambda p, x: jnp.sum(jnp.square(hj.forward(p, x, cfg))))
        t0 = time.perf_counter()
        fence(hfwd(hdev, mixb))
        dt_c = time.perf_counter() - t0
        log(f"htdemucs batch=4 compiled+ran in {dt_c:.1f}s")
        RESULTS.setdefault("compile_s", {})["htdemucs"] = round(dt_c, 1)
        t0 = time.perf_counter()
        acc = None
        for _ in range(3):
            acc = hfwd(hdev, mixb)
        fence(acc)
        hdt = (time.perf_counter() - t0 - relay) / 3
        h_rtf = 4 * cfg.segment / hdt
        log(f"htdemucs fwd batch=4: {hdt*1e3:.0f} ms -> {h_rtf:.0f}x realtime")
        RESULTS["htdemucs_fwd_rtf"] = round(h_rtf, 1)
        # Batch-scaling probe: is the forward step sublinear in batch (it is
        # HBM/launch-bound, not FLOP-bound)?  Informs the serving batch.
        try:
            mixb8 = jax.device_put(
                (0.1 * g.standard_normal((8, 2, seg))).astype(np.float32))
            fence(hfwd(hdev, mixb8))
            t0 = time.perf_counter()
            acc = None
            for _ in range(3):
                acc = hfwd(hdev, mixb8)
            fence(acc)
            hdt8 = (time.perf_counter() - t0 - relay) / 3
            rtf8 = 8 * cfg.segment / hdt8
            log(f"htdemucs fwd batch=8: {hdt8*1e3:.0f} ms -> "
                f"{rtf8:.0f}x realtime")
            RESULTS["htdemucs_fwd_rtf_b8"] = round(rtf8, 1)
        except Exception as e:  # noqa: BLE001
            log(f"fwd b8 probe failed: {type(e).__name__}: {str(e)[:120]}")
        emit(section="htdemucs_fwd")

        # Quality gate (VERDICT r3 item 5): held-out vocal SNR of the
        # committed trained tiny checkpoint vs the mixture-as-estimate
        # baseline (same metric tests/test_htdemucs_parity.py floors at
        # 8 dB; training measured ~13.8 dB).
        try:
            import importlib.util
            import pathlib

            from amw_tpu.models.vocal import htdemucs_checkpoint_path

            root = pathlib.Path(__file__).resolve().parent
            tspec = importlib.util.spec_from_file_location(
                "train_htdemucs_tiny",
                root / "scripts" / "train_htdemucs_tiny.py")
            train_mod = importlib.util.module_from_spec(tspec)
            tspec.loader.exec_module(train_mod)
            os.environ["AMW_HTDEMUCS_CKPT"] = "bundled"
            try:
                qcfg, qparams = hj.load_params(htdemucs_checkpoint_path())
            finally:
                os.environ.pop("AMW_HTDEMUCS_CKPT", None)
            rng = np.random.default_rng(987654)  # held-out seed
            stems = train_mod.synth_batch(rng, 4, qcfg.segment_samples,
                                          qcfg.samplerate)
            qmix = stems.sum(axis=1).astype(np.float32)
            # inference_params: the bf16-auto serving mode rejects raw f32
            # params (same cast the fwd section above does).
            pred = np.asarray(jax.jit(
                lambda p, x: hj.forward(p, x, qcfg))(
                jax.device_put(hj.inference_params(dict(qparams))),
                jnp.asarray(qmix)))
            vt = stems[:, 3]

            def snr(est):
                return 10 * np.log10(np.sum(vt ** 2)
                                     / max(np.sum((est - vt) ** 2), 1e-12))

            s_model, s_base = snr(pred[:, 3]), snr(qmix)
            log(f"htdemucs quality: vocal SNR {s_model:.1f} dB vs mixture "
                f"baseline {s_base:.1f} dB (held-out)")
            RESULTS["htdemucs_vocal_snr_db"] = round(float(s_model), 1)
            RESULTS["htdemucs_mixture_snr_db"] = round(float(s_base), 1)
            # Generator-INDEPENDENT eval (round-5 item 2): a second corpus
            # with a different synthesis recipe + a deterministic song-like
            # mix (scripts/gen_sep_eval.py) — the honest quality floor.
            gspec = importlib.util.spec_from_file_location(
                "gen_sep_eval", root / "scripts" / "gen_sep_eval.py")
            gmod = importlib.util.module_from_spec(gspec)
            gspec.loader.exec_module(gmod)
            os.environ["AMW_HTDEMUCS_CKPT"] = "bundled"
            try:
                heval = gmod.eval_checkpoint(htdemucs_checkpoint_path(),
                                             batch=8)
            finally:
                os.environ.pop("AMW_HTDEMUCS_CKPT", None)
            log(f"htdemucs heldout-generator quality: {heval}")
            RESULTS["htdemucs_vocal_snr_heldout_db"] = round(
                heval["heldout_vocal_snr_db"], 1)
            RESULTS["htdemucs_mixture_snr_heldout_db"] = round(
                heval["heldout_mixture_snr_db"], 1)
            RESULTS["htdemucs_vocal_snr_song_db"] = round(
                heval["song_vocal_snr_db"], 1)
            emit(section="htdemucs_quality")
        except Exception as e:  # noqa: BLE001
            log(f"htdemucs quality gate failed: "
                f"{type(e).__name__}: {str(e)[:160]}")

        # isolate -> master e2e: separate a 60 s track (vocals stem picked
        # on device), then the fused v1 chain on the stem.
        e2e_dur = 60.0
        n_e2e = int(cfg.samplerate * e2e_dur)
        track = (0.1 * g.standard_normal((2, n_e2e))).astype(np.float32)
        # Serving uploads decode from 16-bit WAV: quantize the synthetic
        # track to the int16 grid so separate() exercises the same
        # lossless int16 transfer path production does.
        track = np.round(track * 32768.0).clip(-32767, 32767) \
            .astype(np.float32) / np.float32(32768.0)
        espec = GraphSpec(sr=cfg.samplerate, n=n_e2e, channels=2, exact=True)
        mparams, mfn, _ = build_v1_pipeline(espec, target_lufs=-14.0,
                                            style="standard", jit=True)
        mdev = jax.device_put(mparams)
        # warmup at the FULL track length: the device overlap-add step is
        # compiled per padded track length, so a shorter warmup would leave
        # the timed run paying the compile.  FENCE the warmup output —
        # block_until_ready returns at remote enqueue, so an unfenced
        # warmup execution is still queued when the timed region starts
        # and its ~seconds of separation land inside the measurement.
        warm = hj.separate(hdev, track, cfg, stems=("vocals",),
                           device_out=True)
        fence(jnp.sum(jnp.square(warm)))
        fence(jnp.sum(jnp.square(mfn(jnp.asarray(track), mdev))))
        measure_relay()

        # Stage split (each stage fenced separately; sums slightly above
        # the pipelined e2e number below, which fences once).
        e2e_stage_ms = {}
        t0 = time.perf_counter()
        vocals = hj.separate(hdev, track, cfg, stems=("vocals",),
                             device_out=True)[0]
        fence(jnp.sum(jnp.square(vocals)))
        e2e_stage_ms["upload+separate"] = round(
            (time.perf_counter() - t0 - relay) * 1e3, 1)
        t0 = time.perf_counter()
        mastered = mfn(jnp.clip(vocals, -1.0, 1.0), mdev)
        fence(jnp.sum(jnp.square(mastered)))
        e2e_stage_ms["master"] = round(
            (time.perf_counter() - t0 - relay) * 1e3, 1)
        # Upload alone (device_put of the int16 mix + fence).
        xi16 = np.round(track * 32768.0).astype(np.int16)
        t0 = time.perf_counter()
        up = jax.device_put(xi16)
        fence(jnp.sum(up.astype(jnp.float32)))
        e2e_stage_ms["upload_alone"] = round(
            (time.perf_counter() - t0 - relay) * 1e3, 1)
        log(f"e2e stage split: {json.dumps(e2e_stage_ms)}")
        RESULTS["htdemucs_e2e_stage_ms"] = e2e_stage_ms

        # Headline e2e: one pipelined pass, single fence at the end.
        t0 = time.perf_counter()
        # device_out: the vocals stem never leaves the device between the
        # separator and the mastering graph (saves 2× track bytes of relay
        # traffic vs a host round trip).
        vocals = hj.separate(hdev, track, cfg, stems=("vocals",),
                             device_out=True)[0]
        mastered = mfn(jnp.clip(vocals, -1.0, 1.0), mdev)
        fence(jnp.sum(jnp.square(mastered)))
        e2e = time.perf_counter() - t0 - relay
        e2e_rtf = e2e_dur / e2e
        log(f"isolate+master e2e ({e2e_dur:.0f}s track): {e2e:.2f}s -> "
            f"{e2e_rtf:.1f}x realtime (scan path)")
        RESULTS["htdemucs_e2e_rtf"] = round(e2e_rtf, 1)

        # Streaming path (round-5 item 1a): per-group slab uploads enqueued
        # behind each group's forward, so the relay can overlap the next
        # slab's transfer with the current group's compute.
        try:
            warm_s = hj.separate(hdev, track, cfg, stems=("vocals",),
                                 device_out=True, stream=True)
            fence(jnp.sum(jnp.square(warm_s)))
            measure_relay()
            t0 = time.perf_counter()
            vocals_s = hj.separate(hdev, track, cfg, stems=("vocals",),
                                   device_out=True, stream=True)[0]
            mastered_s = mfn(jnp.clip(vocals_s, -1.0, 1.0), mdev)
            fence(jnp.sum(jnp.square(mastered_s)))
            e2e_s = time.perf_counter() - t0 - relay
            rtf_s = e2e_dur / e2e_s
            log(f"isolate+master e2e STREAM: {e2e_s:.2f}s -> "
                f"{rtf_s:.1f}x realtime")
            RESULTS["htdemucs_e2e_rtf_stream"] = round(rtf_s, 1)
            if rtf_s > e2e_rtf:
                RESULTS["htdemucs_e2e_rtf"] = round(rtf_s, 1)
                RESULTS["htdemucs_e2e_mode"] = "stream"
        except Exception as e:  # noqa: BLE001
            log(f"stream e2e failed: {type(e).__name__}: {str(e)[:160]}")
        emit(section="htdemucs_e2e")
    except Exception as e:  # noqa: BLE001
        log(f"htdemucs bench failed: {type(e).__name__}: {str(e)[:160]}")

    # Mixed-traffic sustained serving (round-5 item 3): short uploads, a
    # long upload, and an isolate-vocal job through the REAL engine
    # (decode -> bucketed masked graph -> validate -> dithered export), the
    # path /api/v2/master serves.  Wall clock includes host codec work.
    try:
        from amw_tpu.runtime.config import settings as rt_settings
        from amw_tpu.runtime.engine import MasteringEngine
        from amw_tpu.utils import wav as wav_mod

        rt_settings.mastering_debug_skip_limits = True
        eng = MasteringEngine(bucket=True, micro_batch=False)

        def wav_blob(dur_s, seed):
            x = make_track(sr, dur_s, seed=seed)
            q = (np.clip(x, -1, 1) * 32767).astype(np.int16)
            return wav_mod.write_wav_int16(q, sr)

        jobs = ([("short", wav_blob(20.0, s), {}) for s in range(4)]
                + [("med", wav_blob(170.0, 7), {}),
                   ("med", wav_blob(175.0, 8), {})])
        os.environ["AMW_HTDEMUCS_CKPT"] = "bundled"
        try:
            from amw_tpu.runtime import settings_store

            settings_store.set_setting("vocal_isolation_enabled", True)
            jobs.append(("isolate", wav_blob(60.0, 9),
                         {"pro": {"apply_vocal_isolation": True}}))
            # Warmup pass: compile/load every job's graph, fenced by the
            # blocking bytes result itself.
            for _name, blob, kw in jobs:
                eng.master_v2_bytes(blob, "t.wav", target_lufs=-14.0, **kw)
            t0 = time.perf_counter()
            audio_sec = 0.0
            for _name, blob, kw in jobs:
                r = eng.master_v2_bytes(blob, "t.wav", target_lufs=-14.0,
                                        **kw)
                audio_sec += len(r["bytes"]) / (2 * 2 * sr)  # 16-bit stereo
            mt_dt = time.perf_counter() - t0
        finally:
            os.environ.pop("AMW_HTDEMUCS_CKPT", None)
        mt_rtf = audio_sec / mt_dt
        log(f"mixed traffic ({len(jobs)} jobs, {audio_sec:.0f}s audio, "
            f"incl. decode/export + isolate): {mt_dt:.2f}s -> "
            f"{mt_rtf:.0f}x realtime, {len(jobs)/mt_dt*60:.0f} jobs/min")
        RESULTS["mixed_traffic_rtf"] = round(mt_rtf, 1)
        RESULTS["mixed_traffic_jobs_per_min"] = round(len(jobs) / mt_dt * 60,
                                                      1)
        emit(section="mixed_traffic")
    except Exception as e:  # noqa: BLE001
        log(f"mixed traffic failed: {type(e).__name__}: {str(e)[:200]}")

    # Long-upload cold latency (round-5 item 4): first job for a 20-min
    # track in THIS process — the ladder bucket (1260 s) compile/cache-load
    # plus the run.  With the persistent cache warmed by a previous bench
    # run this is the restart-cold number the 600 s SSE budget cares about.
    try:
        t0 = time.perf_counter()
        blob = wav_blob(1200.0, 11)
        dec_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = eng.master_v2_bytes(blob, "t.wav", target_lufs=-14.0)
        cold_long = time.perf_counter() - t0
        assert len(r["bytes"]) > 1000
        log(f"cold long job (20 min upload, 1260s ladder bucket): "
            f"{cold_long:.1f}s (host fixture gen {dec_s:.1f}s)")
        RESULTS["cold_long_job_s"] = round(cold_long, 1)
        emit(section="cold_long")
    except Exception as e:  # noqa: BLE001
        log(f"cold long job failed: {type(e).__name__}: {str(e)[:200]}")

    emit(section="done")


if __name__ == "__main__":
    main()
