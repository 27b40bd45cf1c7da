#!/usr/bin/env python
"""Attribute deesser_gain_combine cost between its pieces on TPU.

envelope-mode kernel vs gain-mode kernel on identical window views, the
box halo kernel, the final combine, and the view construction — at the
chain's production shape [16 rows, 7.94M].  Throwaway tuning harness
for ops/scan.py (run 1: find where the ~24 ms over the bare envelope
kernel goes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_deesser_pieces.py
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

    from amw_tpu.ops import scan as sc
    from amw_tpu.ops.dynamics import ar_coefs
    from amw_tpu.ops.fdfilter import box_smooth_same

    sr = 44100
    n = int(sr * 180)
    rows = 16
    rng = np.random.default_rng(0)
    x = jax.device_put((0.2 * rng.standard_normal((rows, n))
                        ).astype(np.float32))
    y3 = jax.device_put((0.5 * rng.standard_normal((rows, n))
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

    att, rel = ar_coefs(sr, 0.004, 0.085)
    thresh = 10 ** (-6.0 / 20)
    k = max(3, int(sr * 0.0015)) | 1

    # Reproduce the production windowing exactly.
    TB = 512
    W0 = sc.warmup_len(att, rel)
    k_target = max(1, -(-(sc._groups_cap() * 128) // rows))
    W = -(-W0 // TB) * TB
    C = -(-max(W, 16384, -(-n // k_target)) // TB) * TB
    K = -(-n // C)
    M = rows * K
    S, M_pad = sc._pick_groups(M)
    print(f"W {W}, C {C}, K {K}, M {M} -> S {S}, M_pad {M_pad}")

    def views(v):
        P, A = sc._win_views(v.reshape(rows, n), W, C, K)
        P = jnp.pad(P, ((0, M_pad - M), (0, 0)))
        A = jnp.pad(A, ((0, M_pad - M), (0, 0)))
        return P, A

    Ph, Ah = jax.jit(views)(x)
    Ph, Ah = jax.device_put(np.asarray(Ph)), jax.device_put(np.asarray(Ah))
    off = (np.tile(np.arange(K, dtype=np.int32), rows) * np.int32(C))
    off = np.pad(off, (0, M_pad - M))
    aux = jax.device_put(np.stack(
        [off, np.broadcast_to(np.int32(n), (M_pad,))]).astype(np.int32))
    gcur = jax.device_put(np.clip(np.abs(
        rng.standard_normal((rows, n)).astype(np.float32)), 0.35, 1.0))

    def bench(name, fn, *args, reps=4):
        jfn = jax.jit(lambda *a: jnp.sum(jnp.square(fn(*a)[..., :64])))
        try:
            float(jfn(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {str(e)[:160]}")
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
        print(f"{name:28s} {best*1e3:8.2f} ms")

    bench("views alone", lambda v: views(v)[1], x)
    bench("kernel env-mode",
          lambda p, a: sc._win_scan_pallas(
              p, a, attack=att, release=rel, groups=S), Ph, Ah)
    bench("kernel env-mode abs",
          lambda p, a: sc._win_scan_pallas(
              p, a, attack=att, release=rel, groups=S, take_abs=True),
          Ph, Ah)
    bench("kernel gain-mode",
          lambda p, a, ax: sc._win_scan_pallas(
              p, a, attack=att, release=rel, groups=S, aux=ax,
              gain=(thresh, 3.0, 0.35), take_abs=True), Ph, Ah, aux)
    bench("box k=%d alone" % k, lambda g: box_smooth_same(g, k), gcur)
    # compositional variants: where do the fusion-boundary costs land?
    gparams = dict(attack=att, release=rel, groups=S,
                   gain=(thresh, 3.0, 0.35), take_abs=True)

    def vk(v):
        P, A = views(v)
        return sc._win_scan_pallas(P, A, aux=aux, **gparams)

    bench("views+kernel", vk, x)
    bench("views+kernel+box",
          lambda v: box_smooth_same(
              vk(v)[:M].reshape(rows, K * C), k), x)
    bench("kernel+box (dev views)",
          lambda p, a: box_smooth_same(
              sc._win_scan_pallas(p, a, aux=aux, **gparams)[:M]
              .reshape(rows, K * C), k), Ph, Ah)
    bench("combine alone",
          lambda a, b, g: a - b + b * jnp.clip(g, 0.35, 1.0), y3, x, gcur)
    bench("deesser full", lambda a, b: sc.deesser_gain_combine(
        a, b, att, rel, thresh, 3.0, k), y3, x)
    bench("envelope_follower full",
          lambda v: sc.envelope_follower(jnp.abs(v), att, rel), x)


if __name__ == "__main__":
    main()
