#!/usr/bin/env python
"""Attribute envelope_follower host-glue cost: abs, ext concat, window
stack, output slice — vs the kernel itself, at the chain shape.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_scan_glue.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from amw_tpu.runtime import compile_cache

    compile_cache.enable("/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rows, n = 16, 7_938_000
    x = jax.device_put((0.2 * rng.standard_normal((rows, n))
                        ).astype(np.float32))

    ready = jax.device_put(np.ones(8, np.float32))
    float(jnp.sum(ready))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(ready))
        rtts.append(time.perf_counter() - t0)
    relay = sorted(rtts)[len(rtts) // 2]
    print(f"relay rtt {relay*1e3:.1f} ms (median of 10)")

    W, C, TB = 69_632, 124_416, 512
    K = -(-n // C)
    pad = K * C - n

    def bench(name, fn, *args, reps=4):
        jfn = jax.jit(lambda *a: jnp.sum(jnp.square(fn(*a)[..., :64])))
        try:
            float(jfn(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {str(e)[:160]}")
            return
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(reps):
                acc = jfn(*args)
            float(acc)
            dt = (time.perf_counter() - t0 - relay) / reps
            best = dt if best is None else min(best, dt)
        print(f"{name:24s} {best*1e3:8.2f} ms")

    def ext_of(v):
        return jnp.concatenate(
            [jnp.broadcast_to(v[..., :1], v.shape[:-1] + (W,)), v,
             jnp.broadcast_to(v[..., -1:], v.shape[:-1] + (pad,))], axis=-1)

    def windows_of(v):
        ext = ext_of(v)
        return jnp.stack(
            [jax.lax.slice_in_dim(ext, k * C, k * C + W + C, axis=-1)
             for k in range(K)], axis=-2)

    bench("abs", jnp.abs, x)
    bench("ext concat", ext_of, x)
    bench("windows stack", windows_of, x)
    bench("windows reshape+pad",
          lambda v: jnp.pad(windows_of(v).reshape(rows * K, W + C),
                            ((0, 0), (0, 0))), x)

    from amw_tpu.ops import scan as sc

    import os
    os.environ["AMW_SCAN_GROUPS"] = "8"
    bench("envelope_follower S8",
          lambda v: sc.envelope_follower(jnp.abs(v), 0.99435, 0.999733), x)

    # kernel alone on a prebuilt wm
    wm = jax.device_put(np.abs(rng.standard_normal(
        (rows * K, W + C)).astype(np.float32)))
    bench("_env_pallas S8 skip",
          lambda w: sc._env_pallas(w, 0.99435, 0.999733,
                                   skip=W // TB, groups=8), wm)


if __name__ == "__main__":
    main()
