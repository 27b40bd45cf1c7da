#!/usr/bin/env python
"""Diagnose one audio file (reference: run_diagnose_file.py): decode, meter,
and report per-stage signal metrics through the default chain."""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from amw_tpu import refimpl  # noqa: E402
from amw_tpu.qa.mastering_regression import metrics_after_each_stage  # noqa: E402
from amw_tpu.utils import wav  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: run_diagnose_file.py file.wav")
        return 2
    audio, sr = wav.read_wav(open(sys.argv[1], "rb").read())
    dur = audio.shape[-1] / sr
    print(f"{sys.argv[1]}: {audio.shape[0]}ch {dur:.1f}s @ {sr} Hz")
    print(f"  integrated: {refimpl.integrated_lufs(audio, sr):.2f} LUFS")
    print(f"  true peak : {refimpl.true_peak_dbfs(audio, sr):.2f} dBTP")
    peak = float(np.max(np.abs(audio)))
    print(f"  peak      : {20 * np.log10(max(peak, 1e-12)):.2f} dBFS")
    windows = (("intro", 0.0, min(10.0, dur)),
               ("mid", dur * 0.45, min(dur * 0.55, dur)),
               ("late", max(dur - 6.0, 0.0), dur))
    print("\nstage-by-stage window metrics (default chain):")
    for row in metrics_after_each_stage(audio, sr, windows):
        cells = "  ".join(
            f"{k}: hf={m['hf_rms']:.4f} d={m['max_abs_diff']:.3f}"
            for k, m in row["windows"].items())
        print(f"  {row['stage']:24s} {cells}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
