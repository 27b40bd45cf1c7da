"""A/B the Pallas FFT dot precision (HIGHEST 6-pass vs HIGH 3-pass bf16).

The round-trip kernels are MXU-bound at Precision.HIGHEST (PROGRESS.md:
inverse ~14x off the HBM roofline), so the 3-pass decomposition is a ~2x
lever on the dot time — IF the extra rounding stays inside the -90 dBFS
parity budget (round-3 headroom: -119.5 dBFS at HIGHEST).

Run twice (subprocesses — the precision is baked at import):

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fft_precision.py

It forks itself with AMW_FFT_DOT_PREC in {highest, bf16x3}, printing
per-mode round-trip wall time and parity vs the float64 numpy oracle.
(Mosaic silently degrades lax HIGH to one-pass bf16, so the 3-pass split
is hand-built from plain bf16 dots — pass modes as argv to override.)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

NFFT = 1 << 23
R = 16
N_OUT = NFFT - (1 << 20)


def _run_mode() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from amw_tpu.ops import fft_pallas as fp

    mode = os.environ["AMW_FFT_DOT_PREC"]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((R, NFFT - (1 << 21))).astype(np.float32)
    # A realistic smooth EQ-ish response (real impulse, conj-symmetric).
    f = np.fft.rfftfreq(NFFT, 1 / 44100.0)
    H = (1.0 + 0.5 * np.cos(f / 2000.0)) * np.exp(-f / 18000.0)
    resp = fp.permute_full_response(H, NFFT)

    tables = fp.plan_params(NFFT)
    xd = jax.device_put(jnp.asarray(x))
    rd = jax.device_put(jnp.asarray(resp))

    fn = jax.jit(lambda a, r: fp.apply_response(a, r, NFFT, tables=tables,
                                                n_out=N_OUT))
    y = fn(xd, rd)
    float(y[0, 0])  # fence compile
    t0 = time.perf_counter()
    reps = 6
    for _ in range(reps):
        y = fn(xd, rd)
    float(jnp.max(jnp.abs(y)))  # fence
    dt = (time.perf_counter() - t0) / reps

    # Parity vs float64 oracle on a slice of rows (full 16 rows is slow on
    # host; 4 rows bound the max error well).
    full = np.zeros(NFFT, np.complex128)
    full[: NFFT // 2 + 1] = H
    full[NFFT // 2 + 1:] = np.conj(H[1: NFFT // 2][::-1])
    xs = x[:4].astype(np.float64)
    want = np.fft.ifft(np.fft.fft(xs, n=NFFT, axis=-1) * full,
                       axis=-1).real[:, :N_OUT]
    got = np.asarray(y[:4], np.float64)
    err = np.max(np.abs(got - want))
    err_dbfs = 20 * np.log10(max(err / max(np.max(np.abs(want)), 1e-12),
                                 1e-12))
    print(json.dumps({"mode": mode, "roundtrip_ms": round(dt * 1e3, 2),
                      "rows": R, "nfft": NFFT,
                      "parity_max_err_dbfs": round(err_dbfs, 1)}))


def _wait_for_backend() -> None:
    """Relay-recovery probe loop (docs/TPU_NOTES.md): a failed backend init
    is cached per process, so retry in FRESH subprocesses, and never kill a
    hung probe — it completes when the relay's claim clears."""
    deadline = time.time() + int(os.environ.get("BENCH_INIT_WAIT_SEC", "5400"))
    while True:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True)
        if r.returncode == 0:
            return
        if time.time() > deadline:
            print(json.dumps({"error": "TPU backend unavailable"}))
            raise SystemExit(2)
        print("backend init failed; retrying in 60s", file=sys.stderr)
        time.sleep(60)


def main() -> None:
    if os.environ.get("AMW_FFT_DOT_PREC"):
        _run_mode()
        return
    _wait_for_backend()
    modes = sys.argv[1:] or ["highest", "bf16x3"]
    for mode in modes:
        env = dict(os.environ, AMW_FFT_DOT_PREC=mode)
        subprocess.run([sys.executable, __file__], env=env, check=True)


if __name__ == "__main__":
    main()
