#!/usr/bin/env python
"""Quick audio smoke test (reference: run_audio_test.py): generate a test
tone, master it through v1 and the default v2 chain, verify loudness/peak
gates, and write the results next to the script."""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from amw_tpu import refimpl  # noqa: E402
from amw_tpu.models import compile_chain  # noqa: E402
from amw_tpu.models.pipeline_v1 import master_v1  # noqa: E402
from amw_tpu.spec import GraphSpec  # noqa: E402
from amw_tpu.utils.audio_io import export_audio  # noqa: E402


def main() -> int:
    sr = 44100
    t = np.arange(8 * sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
    mix = np.stack([x, 0.85 * x])
    ok = True

    out1 = master_v1(mix, sr, target_lufs=-14.0)
    l1 = refimpl.integrated_lufs(out1, sr)
    print(f"v1: {l1:.2f} LUFS, TP {refimpl.true_peak_dbfs(out1, sr):.2f} dBTP")
    ok &= abs(l1 + 14.0) < 2.5

    spec = GraphSpec(sr=sr, n=mix.shape[-1], channels=2)
    out2 = compile_chain(spec, target_lufs=-14.0)(mix)
    l2 = refimpl.integrated_lufs(out2, sr)
    print(f"v2: {l2:.2f} LUFS, TP {refimpl.true_peak_dbfs(out2, sr):.2f} dBTP")
    ok &= abs(l2 + 14.0) < 2.5

    open("test_output_v1.wav", "wb").write(export_audio(out1, sr, "wav"))
    open("test_output_v2.wav", "wb").write(export_audio(out2, sr, "wav"))
    print("wrote test_output_v1.wav / test_output_v2.wav")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
