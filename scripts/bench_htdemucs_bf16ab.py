#!/usr/bin/env python
"""On-TPU A/B of htdemucs inference dtype (f32 vs bf16).

Two measurements per mode, each in its own subprocess (the dtype is baked
at module import, and one relay client at a time is the law —
docs/TPU_NOTES.md):

1. quality — full `separate()` of a deterministic 2.5-segment mix through
   the bundled genuinely-trained tiny checkpoint; stems saved to /tmp and
   compared across modes as per-stem SNR (the CPU gate in
   tests/test_htdemucs_parity.py asserts >= 30 dB; TPU numerics differ, so
   this re-gates on hardware before flipping the serving default).
2. throughput — released-shape random-init forward, batch 4 (timing is
   weight-independent; mirrors scripts/bench_htdemucs.py).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_htdemucs_bf16ab.py

Reference capability: services/vocal_isolation.py:13-63 (Demucs htdemucs
subprocess); this framework serves the same model as a JAX graph, and bf16
is the TPU-native inference dtype if stems hold.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

OUT = "/tmp/amw_ht_ab_{mode}.npz"


def _run_mode() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from amw_tpu.models import htdemucs_jax as hj
    from amw_tpu.models.vocal import htdemucs_checkpoint_path

    mode = os.environ["AMW_HTDEMUCS_DTYPE"]
    assert hj._DTYPE == mode

    # --- quality: trained tiny checkpoint, deterministic mix ------------
    cfg, params = hj.load_params(htdemucs_checkpoint_path())
    dev_params = jax.device_put(hj.inference_params(params))
    seg = cfg.segment_samples
    n = int(seg * 2.5)
    t = np.arange(n) / cfg.samplerate
    rng = np.random.default_rng(7)
    mix = np.stack([
        0.3 * np.sin(2 * np.pi * 220 * t) + 0.15 * np.sin(2 * np.pi * 997 * t),
        0.3 * np.sin(2 * np.pi * 220 * t + 0.5) + 0.1 * rng.standard_normal(n),
    ]).astype(np.float32)
    stems = hj.separate(dev_params, mix, cfg)
    np.savez(OUT.format(mode=mode), stems=np.asarray(stems, np.float32))

    # --- throughput: released shape, random weights, batch 4 ------------
    rcfg = hj.HTConfig()
    rparams = jax.device_put(hj.inference_params(hj.init_params(rcfg)))
    xb = jax.device_put((0.1 * rng.standard_normal(
        (4, 2, rcfg.segment_samples))).astype(np.float32))
    fwd = jax.jit(lambda p, x: jnp.sum(jnp.square(hj.forward(p, x, rcfg))))
    float(fwd(rparams, xb))  # compile fence
    reps = 5
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = fwd(rparams, xb)
    float(acc)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"mode": mode, "released_batch4_ms": round(dt * 1e3, 1),
                      "rtf": round(4 * rcfg.segment / dt, 1)}))


def _wait_for_backend() -> None:
    deadline = time.time() + int(os.environ.get("BENCH_INIT_WAIT_SEC", "5400"))
    while True:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True)
        if r.returncode == 0:
            return
        if time.time() > deadline:
            print(json.dumps({"error": "TPU backend unavailable"}))
            raise SystemExit(2)
        print("backend init failed; retrying in 60s", file=sys.stderr)
        time.sleep(60)


def main() -> None:
    if os.environ.get("AMW_HTDEMUCS_DTYPE"):
        _run_mode()
        return
    _wait_for_backend()
    env_base = {k: v for k, v in os.environ.items()
                if k != "AMW_HTDEMUCS_DTYPE"}
    env_base["AMW_HTDEMUCS_CKPT"] = "bundled"
    for mode in ("f32", "bf16"):
        subprocess.run([sys.executable, __file__],
                       env=dict(env_base, AMW_HTDEMUCS_DTYPE=mode),
                       check=True)

    import numpy as np

    a = np.load(OUT.format(mode="f32"))["stems"].astype(np.float64)
    b = np.load(OUT.format(mode="bf16"))["stems"].astype(np.float64)
    snrs = {}
    for i in range(a.shape[0]):
        err = np.sum(np.square(a[i] - b[i]))
        sig = np.sum(np.square(a[i]))
        snrs[f"stem{i}"] = round(
            10 * np.log10(max(sig, 1e-20) / max(err, 1e-20)), 1)
    print(json.dumps({"bf16_vs_f32_snr_db": snrs,
                      "min_snr_db": min(snrs.values())}))


if __name__ == "__main__":
    main()
