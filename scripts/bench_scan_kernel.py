#!/usr/bin/env python
"""Time the de-esser / envelope Pallas kernels at the chain's hot shape.

Compares AMW_SCAN_GROUPS=1 (the pre-round-4 single-group layout) against
the grouped ILP layout at the production shape [8 tracks, 2 ch, 180 s].

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scan_kernel.py [groups ...]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from amw_tpu.runtime import compile_cache

    compile_cache.enable("/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp

    from amw_tpu.ops import scan as sc
    from amw_tpu.ops.dynamics import ar_coefs

    sr = 44100
    n = int(sr * 180)
    g = np.random.default_rng(0)
    sc_sig = jax.device_put(
        (0.2 * g.standard_normal((8, 2, n))).astype(np.float32))
    y3_sig = jax.device_put(
        (0.5 * g.standard_normal((8, 2, n))).astype(np.float32))

    ready = jax.device_put(np.ones(8, np.float32))
    float(jnp.sum(ready))
    t0 = time.perf_counter()
    for _ in range(4):
        float(jnp.sum(ready))
    relay = (time.perf_counter() - t0) / 4
    print(f"relay rtt {relay*1e3:.1f} ms, n {n}")

    att, rel = ar_coefs(sr, 0.004, 0.085)
    k = max(3, int(sr * 0.0015)) | 1

    groups_list = [int(a) for a in sys.argv[1:]] or [1, 8]
    for grp in groups_list:
        os.environ["AMW_SCAN_GROUPS"] = str(grp)

        def dee(y3, s):
            return jnp.sum(jnp.square(sc.deesser_gain_combine(
                y3, s, att, rel, 0.1, 3.0, k)[..., :64]))

        def env(s):
            return jnp.sum(jnp.square(sc.envelope_follower(
                jnp.abs(s), att, rel)[..., :64]))

        for name, fn, args in (
                (f"deesser S={grp}", jax.jit(dee), (y3_sig, sc_sig)),
                (f"envelope S={grp}", jax.jit(env), (sc_sig,))):
            t0 = time.perf_counter()
            try:
                float(fn(*args))
            except Exception as e:  # noqa: BLE001
                print(f"{name:16s} FAILED: {str(e)[:200]}")
                continue
            comp = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                acc = None
                for _ in range(4):
                    acc = fn(*args)
                float(acc)
                dt = (time.perf_counter() - t0 - relay) / 4
                best = dt if best is None else min(best, dt)
            print(f"{name:16s} {best*1e3:8.2f} ms   (compile {comp:.1f}s)")


if __name__ == "__main__":
    main()
