#!/usr/bin/env python
"""Decompose the two dominant 180 s v1 stages into their pieces on TPU.

The run-4 stage map (BENCH_r04_dev.json) shows target_eq+deesser ~100 ms
and dynamics ~78 ms per [8, 2, 180 s] batch at nfft 2^23.  This times each
constituent under the production vmap layout so optimization goes where
the milliseconds are:

  rt_K2_vmap        roundtrip_multi K=2 (target+sidechain responses)
  deesser_scan      deesser_gain_combine alone (envelope Pallas kernel)
  stage_target      the full fused stage fn
  rt_K4_reduce_vmap roundtrip_multi_reduce K=4 with soft-knee maps
  stage_dynamics    the full dynamics stage fn
  stage_norm_final  the full normalize+final stage fn

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_chain_pieces.py [dur_s]
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

    from amw_tpu.spec import GraphSpec
    from amw_tpu.ops import fused, bands, design
    import amw_tpu.ops.fft_pallas as fp

    sr = 44100
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    n = int(sr * dur)
    micro = 8
    spec = GraphSpec(sr=sr, n=n, channels=2, exact=True)

    g = np.random.default_rng(0)
    xb = jax.device_put((0.2 * g.standard_normal((micro, 2, n))
                         ).astype(np.float32))

    def fence(v):
        return float(v)

    ready = jax.device_put(np.ones(8, np.float32))
    fence(jnp.sum(ready))
    t0 = time.perf_counter()
    for _ in range(4):
        fence(jnp.sum(ready))
    relay = (time.perf_counter() - t0) / 4
    print(f"relay rtt {relay*1e3:.1f} ms, n {n}, batch {micro}")

    def bench(name, fn, *args, reps=4):
        jfn = jax.jit(lambda *a: jnp.sum(
            jnp.square(jax.tree.leaves(fn(*a))[0][..., :64])))
        try:
            fence(jfn(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {str(e)[:160]}")
            return None
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(reps):
                acc = jfn(*args)
            fence(acc)
            dt = (time.perf_counter() - t0 - relay) / reps
            best = dt if best is None else min(best, dt)
        print(f"{name:22s} {best*1e3:8.2f} ms")
        return best

    # --- target_eq + deesser ---
    built = fused.build_target_then_deesser(spec)
    assert built is not None
    p_td, f_td = built
    p_td_dev = jax.device_put(list(p_td))
    nfft = p_td[0].shape[-1] if hasattr(p_td[0], "shape") else None
    print(f"target nfft: {nfft}")

    bench("stage_target",
          lambda x, p: jax.vmap(f_td, in_axes=(0, None))(x, p),
          xb, p_td_dev)

    resp2, tabs = p_td[0], p_td[3]
    r2_dev = jax.device_put(resp2)
    tabs_dev = jax.device_put(tabs)
    nfft_t = resp2.shape[-1]
    bench("rt_K2_vmap",
          lambda x, r, t: jax.vmap(
              lambda xt: fp.roundtrip_multi(xt, r, nfft_t, nfft_t,
                                            tables=t),
              in_axes=0)(x, ),
          xb, r2_dev, tabs_dev)

    from amw_tpu.ops.scan import deesser_gain_combine
    from amw_tpu.ops.dynamics import ar_coefs

    att, rel = ar_coefs(sr, 0.004, 0.085)
    k = max(3, int(sr * 0.0015)) | 1
    bench("deesser_scan",
          lambda x: jax.vmap(
              lambda xt: deesser_gain_combine(
                  xt, xt * 0.25, att, rel, 0.1, 4.0, k))(x),
          xb)

    # --- stage_target glue isolation ---
    import amw_tpu.ops.fused as fused_mod

    real_dgc = fused_mod.deesser_gain_combine
    try:
        fused_mod.deesser_gain_combine = (
            lambda y3, sc, *a, **kw: y3 - sc)
        bench("stage_target no-dees",
              lambda x, p: jax.vmap(f_td, in_axes=(0, None))(x, p),
              xb, p_td_dev)
    finally:
        fused_mod.deesser_gain_combine = real_dgc

    # --- dynamics (soft-knee fused reduce) ---
    p_dy, f_dy = bands.build_dynamics(spec)
    p_dy_dev = jax.device_put(list(p_dy))
    bench("stage_dynamics",
          lambda x, p: jax.vmap(f_dy, in_axes=(0, None))(x, p),
          xb, p_dy_dev)

    # --- normalize + final ---
    nf = fused.build_normalize_then_final(spec, -14.0, None)
    assert nf is not None
    p_nf, f_nf, _ = nf
    p_nf_dev = jax.device_put(list(p_nf))
    bench("stage_norm_final",
          lambda x, p: jax.vmap(f_nf, in_axes=(0, None))(x, p),
          xb, p_nf_dev)


if __name__ == "__main__":
    main()
