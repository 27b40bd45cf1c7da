#!/usr/bin/env python
"""Per-block timing of the htdemucs forward at the released shape.

The whole-forward number (BENCH htdemucs_fwd_rtf) sits ~40x above the
sum of its MXU-flops and HBM-bytes floors (~300 GF bf16 ≈ 2 ms, ~4 GB
≈ 5 ms, measured ~230 ms at batch 4) — so the cost is in specific
poorly-mapped blocks, not in arithmetic.  This script times each block
in isolation (its own jit, fenced by a scalar fetch) to find them:
  spec | encoders(freq) | encoders(time) | transformer | decoders | ispec
plus a batch sweep of the full forward.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_htdemucs_parts.py
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from amw_tpu.models import htdemucs_jax as hj


def fence(v):
    return float(v)


def timeit(fn, *args, reps=3):
    fence(jnp.sum(fn(*args)))  # compile + warm
    t0 = time.perf_counter()
    acc = None
    for _ in range(reps):
        acc = jnp.sum(fn(*args))
    fence(acc)
    return (time.perf_counter() - t0) / reps


def main():
    cfg = hj.HTConfig()
    params = hj.init_params(cfg)
    p = jax.device_put(hj.inference_params(params))
    B = int(os.environ.get("B", "4"))
    g = np.random.default_rng(0)
    seg = cfg.segment_samples
    mix = jax.device_put((0.1 * g.standard_normal((B, 2, seg))
                          ).astype(np.float32))
    act = hj._act_dtype()

    # full forward at several batch sizes
    for b in (1, 2, 4, 8):
        mb = jax.device_put((0.1 * g.standard_normal((b, 2, seg))
                             ).astype(np.float32))
        f = jax.jit(lambda pp, x: hj.forward(pp, x, cfg))
        dt = timeit(f, p, mb)
        print(f"forward B={b}: {dt*1e3:7.1f} ms  "
              f"({b*cfg.segment/dt:6.1f}x rt)", flush=True)

    # block timings at B
    nfft, hop = cfg.nfft, cfg.hop

    def f_spec(x):
        re, im = hj._spec(x, nfft, hop)
        return re + im

    print(f"spec:        {timeit(jax.jit(f_spec), mix)*1e3:7.1f} ms",
          flush=True)

    re, im = hj._spec(np.asarray(mix), nfft, hop)
    Fq, T = re.shape[-2], re.shape[-1]
    xin = jax.device_put(np.concatenate([np.asarray(re), np.asarray(im)],
                                        axis=1).astype(np.float32))

    def f_enc_freq(pp, x):
        x = x.astype(act)
        for idx in range(cfg.depth):
            x = hj._henc(x, pp, f"encoder.{idx}", freq=True,
                         dconv_depth=cfg.dconv_depth)
        return x.astype(jnp.float32)

    print(f"enc(freq):   {timeit(jax.jit(f_enc_freq), p, xin)*1e3:7.1f} ms",
          flush=True)

    def f_enc_time(pp, x):
        x = x.astype(act)
        for idx in range(cfg.depth):
            x = hj._henc(x, pp, f"tencoder.{idx}", freq=False,
                         dconv_depth=cfg.dconv_depth)
        return x.astype(jnp.float32)

    print(f"enc(time):   {timeit(jax.jit(f_enc_time), p, mix)*1e3:7.1f} ms",
          flush=True)

    # transformer on realistic token shapes
    xe = np.asarray(jax.jit(f_enc_freq)(p, xin))
    xt = np.asarray(jax.jit(f_enc_time)(p, mix))
    b_, c_, f_, t_ = xe.shape

    def f_tr(pp, x4, x3):
        x4 = x4.astype(act)
        x3 = x3.astype(act)
        x = hj.conv1d(x4.reshape(b_, c_, f_ * t_),
                      pp["channel_upsampler.weight"],
                      pp["channel_upsampler.bias"])
        bc = x.shape[1]
        x = x.reshape(b_, bc, f_, t_)
        xt_ = hj.conv1d(x3, pp["channel_upsampler_t.weight"],
                        pp["channel_upsampler_t.bias"])
        pe2 = hj._sin_embedding_2d(bc, f_, t_)
        xtok = x.transpose(0, 3, 2, 1).reshape(b_, t_ * f_, bc)
        pe2 = jnp.asarray(pe2).transpose(2, 1, 0).reshape(1, t_ * f_, bc)
        xtok = hj.layer_norm(xtok, pp["crosstransformer.norm_in.weight"],
                             pp["crosstransformer.norm_in.bias"]) \
            + pe2.astype(x.dtype)
        t2 = xt_.shape[-1]
        pe1 = jnp.asarray(hj._sin_embedding_1d(t2, bc))[None].astype(x.dtype)
        ttok = xt_.transpose(0, 2, 1)
        ttok = hj.layer_norm(ttok, pp["crosstransformer.norm_in_t.weight"],
                             pp["crosstransformer.norm_in_t.bias"]) + pe1
        for i in range(cfg.t_layers):
            if i % 2 == 0:
                xtok = hj._t_layer(xtok, pp, f"crosstransformer.layers.{i}",
                                   cfg.t_heads)
                ttok = hj._t_layer(ttok, pp,
                                   f"crosstransformer.layers_t.{i}",
                                   cfg.t_heads)
            else:
                old = xtok
                xtok = hj._t_layer(xtok, pp, f"crosstransformer.layers.{i}",
                                   cfg.t_heads, cross_kv=ttok)
                ttok = hj._t_layer(ttok, pp,
                                   f"crosstransformer.layers_t.{i}",
                                   cfg.t_heads, cross_kv=old)
        return (jnp.sum(xtok.astype(jnp.float32))
                + jnp.sum(ttok.astype(jnp.float32)))

    xe_d, xt_d = jax.device_put(xe), jax.device_put(xt)
    fj = jax.jit(f_tr)
    fence(fj(p, xe_d, xt_d))
    t0 = time.perf_counter()
    acc = None
    for _ in range(3):
        acc = fj(p, xe_d, xt_d)
    fence(acc)
    print(f"transformer: {(time.perf_counter()-t0)/3*1e3:7.1f} ms",
          flush=True)

    def f_ispec(re_, im_):
        return jnp.sum(hj._ispec(re_, im_, hop, seg))

    S = len(cfg.sources)
    reb = jax.device_put(np.repeat(np.asarray(re)[:, None], S, 1)
                         .astype(np.float32))
    imb = jax.device_put(np.repeat(np.asarray(im)[:, None], S, 1)
                         .astype(np.float32))
    fj2 = jax.jit(f_ispec)
    fence(fj2(reb, imb))
    t0 = time.perf_counter()
    acc = None
    for _ in range(3):
        acc = fj2(reb, imb)
    fence(acc)
    print(f"ispec(S=4):  {(time.perf_counter()-t0)/3*1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
