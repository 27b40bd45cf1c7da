#!/usr/bin/env python
"""Per-stage timing of the Pallas staged FFT (ops/fft_pallas.py) on TPU.

The response-pair round trip measures ~38 ms at [16, 2^23] while the
HBM-traffic bound is ~4 ms and the MXU (bf16x3) bound ~3 ms/stage-sweep —
so one stage is eating the budget.  This times each pallas_call in
isolation (fenced by a scalar fetch, relay RTT subtracted):

  stage_a_fwd   packed complex stage A          (1.09 GB traffic)
  stage_bc      fused forward B+C               (1.09 GB)
  stage_bccb_K  fused fwd B+C + K resp inv C+B  ((0.5+K*0.5+K*0.064) GB)
  stage_cb      split inverse C+B               (1.09 GB)
  stage_a_inv   inverse stage A (complex)       (1.09 GB)
  roundtrip_K   full roundtrip_multi            (ends-to-end)
  xla_pair      jnp.fft rfft*H->irfft           (XLA baseline)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fft_stages.py [nfft_log2]
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

    from amw_tpu.ops import fft_pallas as fp

    print(f"dot={fp._resolve_mode() if fp._MODE != 'auto' else 'auto'} "
          f"cplx={fp._CPLX}")

    nfft = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 23)
    R = 16
    R2 = R // 2
    rng = np.random.default_rng(0)
    x = rng.standard_normal((R, nfft)).astype(np.float32) * 0.1
    f = np.fft.rfftfreq(nfft, 1 / 44100.0)
    H = (1.0 + 0.5 * np.cos(f / 2000.0)) * np.exp(-f / 18000.0)
    resp1 = np.stack([fp.permute_full_response(H, nfft)])
    resp4 = np.stack([fp.permute_full_response(H * g, nfft)
                      for g in (1.0, 0.7, 0.5, 0.3)])

    tables = fp.plan_params(nfft)
    xd = jax.device_put(jnp.asarray(x))
    r1 = jax.device_put(jnp.asarray(resp1))
    r4 = jax.device_put(jnp.asarray(resp4))

    def fence(v):
        return float(v)

    ready = jax.device_put(np.ones(8, np.float32))
    fence(jnp.sum(ready))
    t0 = time.perf_counter()
    for _ in range(4):
        fence(jnp.sum(ready))
    relay = (time.perf_counter() - t0) / 4
    print(f"relay rtt {relay*1e3:.1f} ms, nfft 2^{int(np.log2(nfft))}, "
          f"rows {R} (packed {R2})")

    def bench(name, fn, *args, reps=6):
        jfn = jax.jit(fn)
        try:
            out = jfn(*args)
            fence(jnp.sum(jax.tree.leaves(out)[0][..., :8].astype(jnp.float32)))
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} FAILED: {str(e)[:140]}")
            return
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            acc = jfn(*args)
        fence(jnp.sum(jax.tree.leaves(acc)[0][..., :8].astype(jnp.float32)))
        dt = (time.perf_counter() - t0 - relay) / reps
        print(f"{name:20s} {dt*1e3:8.2f} ms")
        return dt

    # stage inputs at rest (packed complex rows)
    xr = xd[:R2]
    xi = xd[R2:]

    bench("stage_a_fwd", lambda a, b: fp._stage_a(a, b, nfft, False, tables),
          xr, xi)
    Ar, Ai = jax.jit(lambda a, b: fp._stage_a(a, b, nfft, False, tables))(
        xr, xi)
    Ar, Ai = jax.device_put(Ar), jax.device_put(Ai)
    bench("stage_bc", lambda a, b: fp._stage_bc(a, b, nfft, tables), Ar, Ai)
    Br, Bi = jax.jit(lambda a, b: fp._stage_bc(a, b, nfft, tables))(Ar, Ai)
    bench("stage_bccb_K1",
          lambda a, b, r: fp._stage_bccb_multi(a, b, r, nfft, tables),
          Ar, Ai, r1)
    bench("stage_bccb_K4",
          lambda a, b, r: fp._stage_bccb_multi(a, b, r, nfft, tables),
          Ar, Ai, r4)
    bench("stage_cb",
          lambda a, b: fp._stage_cb(a, b, nfft, tables), Br, Bi)
    bench("stage_a_inv",
          lambda a, b: fp._stage_a(a, b, nfft, True, tables), Br, Bi)
    bench("roundtrip_K1",
          lambda a, r: fp.roundtrip_multi(a, r, nfft, nfft, tables=tables),
          xd, r1)
    bench("roundtrip_K4",
          lambda a, r: fp.roundtrip_multi(a, r, nfft, nfft, tables=tables),
          xd, r4)

    # The chain vmaps per-track ops over the batch: the pallas calls then
    # see [2, nfft] per element plus a leading batch grid dim (and the
    # row-pair packing degrades to R2=1).  Measure that tax directly.
    xv = xd.reshape(8, 2, nfft)
    bench("roundtrip_K4_vmap",
          lambda a, r: jax.vmap(
              lambda t: fp.roundtrip_multi(t, r, nfft, nfft, tables=tables),
              in_axes=0)(a),
          xv, r4)

    Hf = np.concatenate([H, np.conj(H[1:-1][::-1])])
    hr = jax.device_put(Hf.real.astype(np.float32))
    hi = jax.device_put(Hf.imag.astype(np.float32))

    def xla_pair(a, br, bi):
        X = jnp.fft.fft(a.astype(jnp.complex64), axis=-1)
        return jnp.real(jnp.fft.ifft(X * jax.lax.complex(br, bi), axis=-1))

    bench("xla_pair", xla_pair, xd, hr, hi, reps=3)

    # A/B the stage-A lane-tile width (read at trace time, so one process
    # can sweep it).
    import os

    for m in ("1", "4"):
        os.environ["AMW_FFT_A_COLS"] = m
        bench(f"stage_a_fwd_m{m}",
              lambda a, b: fp._stage_a(a, b, nfft, False, tables), xr, xi)
        bench(f"roundtrip_K4_vmap_m{m}",
              lambda a, r: jax.vmap(
                  lambda t: fp.roundtrip_multi(t, r, nfft, nfft,
                                               tables=tables),
                  in_axes=0)(a),
              xv, r4)
    os.environ.pop("AMW_FFT_A_COLS", None)


if __name__ == "__main__":
    main()
