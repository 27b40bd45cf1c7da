#!/usr/bin/env python
"""Per-stage timing of the fused v1 chain on TPU (batch 8, 180 s).

Times cumulative prefixes of the stage list (stage boundaries of the fused
graph) so each stage's marginal cost = prefix[i] - prefix[i-1].  Prefix
graphs share the production builders, so fusions inside a stage are kept;
fusions ACROSS stage boundaries are broken at the cut point — treat the
numbers as upper bounds near fused pairs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stages.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amw_tpu.models.pipeline_v1 import build_v1_pipeline
    from amw_tpu.spec import GraphSpec
    from bench import make_track

    sr, dur, B = 44100, 180.0, 8
    n = int(sr * dur)
    spec = GraphSpec(sr=sr, n=n, channels=2, exact=True)
    params, raw_fn, names = build_v1_pipeline(
        spec, target_lufs=-14.0, style="standard", jit=False)
    params_dev = jax.device_put(params)
    xb = jax.device_put(
        np.stack([make_track(sr, dur, seed=i) for i in range(B)]))

    def fence(v):
        return float(v)

    ready = jax.device_put(np.ones(8, np.float32))
    for _ in range(2):
        fence(jnp.sum(ready))
    t0 = time.perf_counter()
    for _ in range(4):
        fence(jnp.sum(ready))
    relay = (time.perf_counter() - t0) / 4

    stage_fns = raw_fn.stage_fns
    prev = 0.0
    print(f"relay {relay*1e3:.0f} ms; timing {len(names)} stage prefixes")
    for k in range(1, len(names) + 1):
        def fn_k(x, ps, _k=k):
            for f, p in zip(stage_fns[:_k], ps[:_k]):
                x = f(x, p)
            return x

        jit_k = jax.jit(lambda x, p, f=fn_k: jnp.sum(jnp.square(
            jax.vmap(f, in_axes=(0, None))(x, p))))
        try:
            fence(jit_k(xb, params_dev))
        except Exception as e:  # noqa: BLE001
            print(f"prefix {k} ({names[k-1]}): compile failed: "
                  f"{str(e)[:120]}")
            continue
        reps = 3
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = jit_k(xb, params_dev)
        fence(acc)
        dt = (time.perf_counter() - t0 - relay) / reps
        print(f"prefix {k:2d} {names[k-1]:42s} cum {dt*1e3:7.1f} ms  "
              f"marginal {max(dt-prev, 0)*1e3:7.1f} ms")
        prev = dt


if __name__ == "__main__":
    main()
