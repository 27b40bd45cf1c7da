#!/usr/bin/env python
"""Micro-timing of the components inside the three dominant v1 stages
(target_eq+deesser / dynamics / normalize+final) at batch 8, 180 s.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_microops.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from amw_tpu.ops import design
    from amw_tpu.ops import fft_pallas as fp
    from amw_tpu.ops.fdfilter import box_smooth_same
    from amw_tpu.ops.scan import envelope_follower
    from bench import make_track

    sr, dur, B = 44100, 180.0, 8
    n = int(sr * dur)
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
    print(f"relay {relay*1e3:.0f} ms")

    def bench(name, fn, *args, reps=3):
        j = jax.jit(fn)
        try:
            fence(j(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:120]}")
            return
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = j(*args)
        fence(acc)
        dt = (time.perf_counter() - t0 - relay) / reps
        print(f"{name:46s} {dt*1e3:8.1f} ms")

    # FFT pair with 2 stacked responses, via the production pallas plan.
    nfft = design.next_fft_size(n + 2 * 40000 + 3 * 70000 + 16)
    print(f"nfft = {nfft} ({nfft / (1 << 20):.1f} Mi)")
    R = np.random.default_rng(0).standard_normal(nfft // 2 + 1)
    resp2 = np.stack([fp.permute_full_response(R.astype(np.float64), nfft),
                      fp.permute_full_response(R.astype(np.float64), nfft)])
    resp2 = jax.device_put(resp2)
    tabs = jax.device_put(fp.plan_params(nfft))

    def fwd_inv2(x, r2, t):
        def one(xc):
            Xr, Xi, lead = fp.fwd_real(xc, nfft, tables=t)
            ys = fp.inv_multi(Xr, Xi, r2, nfft, lead, n, tables=t)
            return ys[0] + ys[1]
        return jnp.sum(jax.vmap(one, in_axes=(0,))(x))

    bench("pallas fwd_real + inv_multi(2)", fwd_inv2, xb, resp2, tabs)

    def fwd_only(x, t):
        def one(xc):
            Xr, Xi, lead = fp.fwd_real(xc, nfft, tables=t)
            return jnp.sum(Xr) + jnp.sum(Xi)
        return jnp.sum(jax.vmap(one, in_axes=(0,))(x))

    bench("pallas fwd_real only", fwd_only, xb, tabs)

    # Envelope follower over the full batch (as the deesser sidechain does).
    att, rel_c = 0.9943, 0.99973

    def env(x):
        return jnp.sum(envelope_follower(jnp.abs(x), att, rel_c))

    bench("envelope_follower [8,2,n]", env, xb)

    def env_vmapped(x):
        # as it actually runs inside the vmapped chain: per-element [2, n]
        return jnp.sum(jax.vmap(
            lambda xc: envelope_follower(jnp.abs(xc), att, rel_c))(x))

    bench("envelope_follower vmap([2,n])", env_vmapped, xb)

    # Box smoothing (deesser gain smoothing).
    k = max(3, int(sr * 0.0015)) | 1

    def box(x):
        return jnp.sum(box_smooth_same(x, k))

    bench(f"box_smooth_same k={k}", box, xb)

    def clip_pass(x):
        return jnp.sum(jnp.clip(x * 1.01, -1.0, 1.0))

    bench("single elementwise pass", clip_pass, xb)


if __name__ == "__main__":
    main()
