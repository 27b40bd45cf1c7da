#!/usr/bin/env python
"""Kernel-variant experiments for the envelope/de-esser Pallas scans.

Times isolated kernel variants on a pre-built window matrix (no host
prep) to attribute cost between HBM, the MXU transposes, and the
sequential recurrence loop, across block sizes / group counts / loop
styles.  Throwaway tuning harness for ops/scan.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_scan_variants.py
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
    from jax.experimental.pallas import tpu as pltpu

    hi = jax.lax.Precision.HIGHEST

    def tdot(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)

    def tback(i128, g):
        return jax.lax.dot_general(
            i128, g, (((0,), (1,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)

    att, rel = 0.99435, 0.999733

    # Chain-shaped data: M x T total ~ the [16 rows, 7.9M] window volume.
    M_TOTAL = 1024
    T_TOTAL = 194_560  # 380 x 512
    rng = np.random.default_rng(0)
    wm_np = np.abs(rng.standard_normal((M_TOTAL, T_TOTAL))
                   ).astype(np.float32)
    wm = jax.device_put(wm_np)

    ready = jax.device_put(np.ones(8, np.float32))
    float(jnp.sum(ready))
    t0 = time.perf_counter()
    for _ in range(4):
        float(jnp.sum(ready))
    relay = (time.perf_counter() - t0) / 4
    print(f"relay rtt {relay*1e3:.1f} ms, data {wm_np.nbytes/1e6:.0f} MB")

    def build(S, TB, loop, xpose="mxu"):
        R = S * 128

        def kernel(x_ref, i128_ref, o_ref, xt_ref, ot_ref, e_ref):
            t_block = pl.program_id(1)
            for s in range(S):
                sl = slice(s * 128, (s + 1) * 128)
                if xpose == "mxu":
                    xt_ref[:, sl] = tdot(x_ref[sl, :], i128_ref[...])
                else:
                    xt_ref[:, sl] = x_ref[sl, :].T

            @pl.when(t_block == 0)
            def _():
                e_ref[0:1, :] = xt_ref[0:1, :]

            if loop == "none":
                ot_ref[...] = xt_ref[...]
            elif loop == "ds":
                U = 8

                def body(j, e):
                    for u in range(U):
                        row = xt_ref[pl.ds(j * U + u, 1), :]
                        coef = jnp.where(row > e, att, rel)
                        e = coef * e + (1.0 - coef) * row
                        ot_ref[pl.ds(j * U + u, 1), :] = e
                    return e

                e = jax.lax.fori_loop(0, TB // U, body, e_ref[0:1, :])
                e_ref[0:1, :] = e
            elif loop == "blk8":
                def body(j, e):
                    blk = xt_ref[pl.ds(j * 8, 8), :]  # one aligned load
                    rows = []
                    for u in range(8):
                        row = jax.lax.slice_in_dim(blk, u, u + 1, axis=0)
                        coef = jnp.where(row > e, att, rel)
                        e = coef * e + (1.0 - coef) * row
                        rows.append(e)
                    ot_ref[pl.ds(j * 8, 8), :] = jnp.concatenate(rows, 0)
                    return e

                e = jax.lax.fori_loop(0, TB // 8, body, e_ref[0:1, :])
                e_ref[0:1, :] = e

            for s in range(S):
                sl = slice(s * 128, (s + 1) * 128)
                if xpose == "mxu":
                    o_ref[sl, :] = tback(i128_ref[...], ot_ref[:, sl])
                else:
                    o_ref[sl, :] = ot_ref[:, sl].T

        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(M_TOTAL // R, T_TOTAL // TB),
                in_specs=[
                    pl.BlockSpec((R, TB), lambda m, t: (m, t),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 128), lambda m, t: (0, 0)),
                ],
                out_specs=pl.BlockSpec((R, TB), lambda m, t: (m, t),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M_TOTAL, T_TOTAL),
                                               jnp.float32),
                scratch_shapes=[pltpu.VMEM((TB, R), jnp.float32),
                                pltpu.VMEM((TB, R), jnp.float32),
                                pltpu.VMEM((1, R), jnp.float32)],
            )(x, jnp.eye(128, dtype=jnp.float32))

        return jax.jit(lambda x: jnp.sum(jnp.square(run(x)[..., :64])))

    cases = [
        ("S8 TB512 none", 8, 512, "none", "mxu"),
        ("S8 TB512 copy-noT", 8, 512, "none", "vpu"),
        ("S8 TB512 ds", 8, 512, "ds", "mxu"),
        ("S8 TB512 blk8", 8, 512, "blk8", "mxu"),
        ("S4 TB1024 blk8", 4, 1024, "blk8", "mxu"),
        ("S2 TB2048 blk8", 2, 2048, "blk8", "mxu"),
        ("S8 TB512 blk8-noT", 8, 512, "blk8", "vpu"),
        ("S4 TB1024 ds", 4, 1024, "ds", "mxu"),
    ]
    for name, S, TB, loop, xp in cases:
        try:
            fn = build(S, TB, loop, xp)
            t0 = time.perf_counter()
            float(fn(wm))
            comp = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED: {str(e)[:160]}")
            continue
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(4):
                acc = fn(wm)
            float(acc)
            dt = (time.perf_counter() - t0 - relay) / 4
            best = dt if best is None else min(best, dt)
        print(f"{name:22s} {best*1e3:8.2f} ms   (compile {comp:.1f}s)")


if __name__ == "__main__":
    main()
