#!/usr/bin/env python
"""Self-diagnosis gates (reference: backend/run_self_diagnosis.py).

Masters a synthetic track per platform preset and checks the acceptance
gates: output LUFS within ±1 dB of target, file true peak ≤ -1.5 dBTP
(+1 dB tolerance), no NaN/Inf.  Exit code 0 = all gates pass.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from amw_tpu import refimpl  # noqa: E402
from amw_tpu.constants import PRESET_LUFS  # noqa: E402
from amw_tpu.models.pipeline_v1 import master_v1  # noqa: E402


def make_track(sr=44100, dur=12.0):
    g = np.random.default_rng(0)
    t = np.arange(int(sr * dur)) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 2000 * t)
         + 0.04 * g.standard_normal(len(t)))
    env = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 0.5 * t))
    return np.clip(np.stack([x * env, 0.85 * x * env]), -0.99, 0.99).astype(np.float32)


def main() -> int:
    sr = 44100
    x = make_track(sr)
    failures = []
    for preset, target in PRESET_LUFS.items():
        out = master_v1(x, sr, target_lufs=target, style="standard")
        lufs = refimpl.integrated_lufs(out, sr)
        tp = refimpl.true_peak_dbfs(out, sr)
        finite = bool(np.all(np.isfinite(out)))
        ok = abs(lufs - target) <= 1.0 and tp <= (-1.5 + 1.0) and finite
        print(f"{preset:10s} target {target:6.1f}  out {lufs:6.2f} LUFS  "
              f"TP {tp:6.2f} dBTP  finite={finite}  {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(preset)
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("All self-diagnosis gates passed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
