#!/usr/bin/env python
"""htdemucs forward on TPU at the released model shape (BASELINE config #5
compute path): compile + time one 7.8 s segment, report segments/sec and
realtime factor for 4-stem separation.

Weights are random unless AMW_HTDEMUCS_CKPT points at a converted
checkpoint — timing is weight-independent (same graph).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_htdemucs.py
Set AMW_HTDEMUCS_DTYPE=bf16 to measure the bf16 inference mode (weights +
activations bf16, norms/softmax/STFT f32 — see models/htdemucs_jax.py).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amw_tpu.models import htdemucs_jax as hj

    cfg = hj.HTConfig()  # released htdemucs shape
    seg = cfg.segment_samples
    print(f"devices: {jax.devices()}")
    print(f"config: depth={cfg.depth} ch={cfg.channels} "
          f"bottom={cfg.bottom_channels} t_layers={cfg.t_layers} "
          f"segment={cfg.segment}s ({seg} samples)")

    import os

    ckpt = os.environ.get("AMW_HTDEMUCS_CKPT")
    if ckpt:
        cfg, params = hj.load_params(ckpt)
        print(f"loaded converted weights from {ckpt}")
    else:
        t0 = time.perf_counter()
        params = hj.init_params(cfg)
        print(f"random-init weights (torch oracle) in "
              f"{time.perf_counter()-t0:.1f}s "
              f"({sum(v.size for v in params.values())/1e6:.1f} M params)")

    dev_params = jax.device_put(hj.inference_params(params))
    if hj._resolve_dtype() != "f32":
        print(f"inference dtype: {hj._resolve_dtype()}")
    rng = np.random.default_rng(0)
    mix = jax.device_put(
        (0.1 * rng.standard_normal((1, 2, seg))).astype(np.float32))

    def fence(v):
        return float(v)

    ready = jax.device_put(np.ones(8, np.float32))
    for _ in range(2):
        fence(jnp.sum(ready))
    t0 = time.perf_counter()
    for _ in range(4):
        fence(jnp.sum(ready))
    relay = (time.perf_counter() - t0) / 4
    print(f"relay round-trip: {relay*1e3:.0f} ms")

    fwd = jax.jit(lambda p, x: jnp.sum(jnp.square(hj.forward(p, x, cfg))))
    t0 = time.perf_counter()
    fence(fwd(dev_params, mix))
    print(f"compiled+ran in {time.perf_counter()-t0:.1f}s")

    reps = 5
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = fwd(dev_params, mix)
    fence(acc)
    dt = (time.perf_counter() - t0 - relay) / reps
    rtf = cfg.segment / dt
    print(f"forward: {dt*1e3:.0f} ms per {cfg.segment}s segment -> "
          f"{rtf:.1f}x realtime (4-stem separation, batch 1)")

    # Overlap-25% segmented track estimate.
    eff = rtf * (1 - 0.25)
    print(f"segmented track throughput (overlap 0.25): ~{eff:.1f}x realtime")

    # Batched segments (separate()'s production batch=4).
    B = 4
    mixb = jax.device_put(
        (0.1 * rng.standard_normal((B, 2, seg))).astype(np.float32))
    t0 = time.perf_counter()
    fence(fwd(dev_params, mixb))
    print(f"batch={B} compiled+ran in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = fwd(dev_params, mixb)
    fence(acc)
    dtb = (time.perf_counter() - t0 - relay) / reps
    rtfb = B * cfg.segment / dtb
    print(f"forward batch={B}: {dtb*1e3:.0f} ms -> {rtfb:.1f}x realtime "
          f"(~{rtfb*0.75:.1f}x segmented)")

    # BASELINE config #5 end-to-end: htdemucs separation of a full track,
    # then the v1 mastering chain on the vocal stem — all on TPU.
    from amw_tpu.models.pipeline_v1 import build_v1_pipeline
    from amw_tpu.spec import GraphSpec

    dur = 60.0
    n = int(cfg.samplerate * dur)
    track = (0.1 * rng.standard_normal((2, n))).astype(np.float32)
    spec = GraphSpec(sr=cfg.samplerate, n=n, channels=2, exact=True)
    mparams, mfn, _ = build_v1_pipeline(spec, target_lufs=-14.0,
                                        style="standard", jit=True)
    mp_dev = jax.device_put(mparams)
    # warm both graphs; weights stay device-resident across calls.  Warm at
    # the FULL track length (the scan executable keys on the window-count
    # bucket) and fence it — an unfenced warmup is still queued when the
    # timed region starts (block_until_ready returns at remote enqueue).
    warm = hj.separate(dev_params, track, cfg, stems=("vocals",),
                       device_out=True)
    fence(jnp.sum(jnp.square(warm)))
    fence(jnp.sum(jnp.square(mfn(jnp.asarray(track), mp_dev))))
    t0 = time.perf_counter()
    vocals = hj.separate(dev_params, track, cfg, stems=("vocals",))[0]
    vocals = np.clip(vocals, -1.0, 1.0)
    mastered = mfn(jnp.asarray(vocals.astype(np.float32)), mp_dev)
    fence(jnp.sum(jnp.square(mastered)))
    e2e = time.perf_counter() - t0 - relay
    print(f"end-to-end (separate {dur:.0f}s + master vocal stem): "
          f"{e2e:.2f}s -> {dur/e2e:.1f}x realtime (BASELINE config #5; "
          f"includes {dur:.0f}s of stem download through the relay)")


if __name__ == "__main__":
    main()
