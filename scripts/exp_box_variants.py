#!/usr/bin/env python
"""Box-smoothing kernel variants at the de-esser's shape [16, 7.9M], k=67.

The production halo kernel does k unaligned lane-slice adds per block
(measured 17.7 ms — compute-bound on vreg rotations, ~7x the HBM floor).
Variants: two-level sliding sum in-kernel (a+b+r slices), block sizes,
and plain-copy calibration (pad / reshape-slice) to size the glue.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_box_variants.py
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
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    R, n = 16, 7_938_000
    k = 67
    x = jax.device_put(np.clip(np.abs(
        rng.standard_normal((R, n)).astype(np.float32)), 0.35, 1.0))

    ready = jax.device_put(np.ones(8, np.float32))
    float(jnp.sum(ready))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(ready))
        rtts.append(time.perf_counter() - t0)
    relay = sorted(rtts)[len(rtts) // 2]
    print(f"relay rtt {relay*1e3:.1f} ms (median of 10)")

    def bench(name, fn, *args, reps=4):
        jfn = jax.jit(lambda *a: jnp.sum(jnp.square(fn(*a)[..., :64])))
        try:
            out = jfn(*args)
            float(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {str(e)[:200]}")
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

    def box_variant(TB, mode):
        half = k // 2
        nb = -(-n // TB)

        def kernel(prev_ref, cur_ref, nxt_ref, o_ref):
            j = pl.program_id(0)
            prev = jnp.where(j > 0, prev_ref[...], 0.0)
            nxt = jnp.where(j < pl.num_programs(0) - 1, nxt_ref[...], 0.0)
            win = jnp.concatenate(
                [prev[:, TB - half:], cur_ref[...], nxt[:, :half]], axis=-1)
            if mode == "flat":
                acc = win[:, :TB]
                for s in range(1, k):
                    acc = acc + win[:, s:s + TB]
            else:  # two-level a*b + r
                a = 8
                b = k // a
                r = k - a * b
                La = TB + k - a
                sa = win[:, 0:La]
                for s in range(1, a):
                    sa = sa + win[:, s:s + La]
                acc = sa[:, 0:TB]
                for j2 in range(1, b):
                    acc = acc + sa[:, j2 * a:j2 * a + TB]
                for s in range(a * b, k):
                    acc = acc + win[:, s:s + TB]
            o_ref[...] = acc * (1.0 / k)

        spec_c = pl.BlockSpec((R, TB), lambda j: (0, j))
        spec_p = pl.BlockSpec((R, TB), lambda j: (0, jnp.maximum(j - 1, 0)))
        spec_n = pl.BlockSpec(
            (R, TB), lambda j: (0, jnp.minimum(j + 1, nb - 1)))

        def run(v):
            xp = jnp.pad(v, ((0, 0), (0, nb * TB - n)))
            out = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=[spec_p, spec_c, spec_n],
                out_specs=spec_c,
                out_shape=jax.ShapeDtypeStruct(xp.shape, v.dtype),
            )(xp, xp, xp)
            return out[:, :n]

        return run

    from amw_tpu.ops.fdfilter import box_smooth_same

    bench("production box", lambda v: box_smooth_same(v, k), x)
    bench("flat TB2048", box_variant(2048, "flat"), x)
    bench("two-level TB2048", box_variant(2048, "two"), x)
    bench("two-level TB4096", box_variant(4096, "two"), x)
    bench("two-level TB8192", box_variant(8192, "two"), x)

    # calibration copies
    bench("pad copy (+8240)",
          lambda v: jnp.pad(v, ((0, 0), (0, 8240))), x)
    bench("reshape-slice copy",
          lambda v: v.reshape(16, 63, 126000).reshape(16, 7938000)[..., :n],
          x)

if __name__ == "__main__":
    main()
