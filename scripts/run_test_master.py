#!/usr/bin/env python
"""Master a WAV file from the command line (reference: run_test_master.py).

Usage: python scripts/run_test_master.py in.wav out.wav [--preset spotify]
       [--style standard] [--target -14]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from amw_tpu import refimpl  # noqa: E402
from amw_tpu.constants import PRESET_LUFS  # noqa: E402
from amw_tpu.models.pipeline_v1 import master_v1  # noqa: E402
from amw_tpu.utils import wav  # noqa: E402
from amw_tpu.utils.audio_io import export_audio  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("--preset", default=None, choices=sorted(PRESET_LUFS))
    ap.add_argument("--style", default="standard")
    ap.add_argument("--target", type=float, default=-14.0)
    ap.add_argument("--dither", default="tpdf",
                    choices=["tpdf", "ns_e", "ns_itu"])
    args = ap.parse_args()

    target = PRESET_LUFS[args.preset] if args.preset else args.target
    audio, sr = wav.read_wav(open(args.infile, "rb").read())
    print(f"in : {audio.shape[0]}ch {audio.shape[1]} samples @ {sr} Hz, "
          f"{refimpl.integrated_lufs(audio, sr):.2f} LUFS")
    t0 = time.perf_counter()
    out = master_v1(audio, sr, target_lufs=target, style=args.style)
    dt = time.perf_counter() - t0
    dur = audio.shape[-1] / sr
    print(f"mastered in {dt:.2f}s ({dur / dt:.1f}x realtime), "
          f"{refimpl.integrated_lufs(out, sr):.2f} LUFS, "
          f"TP {refimpl.true_peak_dbfs(out, sr):.2f} dBTP")
    open(args.outfile, "wb").write(
        export_audio(out, sr, "wav", dither_type=args.dither))
    print(f"wrote {args.outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
