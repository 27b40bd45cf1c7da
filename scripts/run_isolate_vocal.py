#!/usr/bin/env python
"""Isolate vocals from a file (reference: run_isolate_vocal.py).

Uses the TPU STFT center-extraction separator; pass --model htdemucs with a
converted orbax checkpoint directory to use the neural separator instead.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("outfile")
    ap.add_argument("--model", default="center_extract")
    ap.add_argument("--weights", default=None,
                    help="orbax checkpoint dir for htdemucs")
    args = ap.parse_args()

    data = open(args.infile, "rb").read()
    if args.model == "htdemucs" and args.weights:
        # Route through the serving path (resampling to the model rate,
        # DSP fallback on load failure) with the checkpoint pinned.
        import os

        os.environ["AMW_HTDEMUCS_CKPT"] = args.weights
        from amw_tpu.models.vocal import isolate_vocal_bytes

        out = isolate_vocal_bytes(data, args.infile, model="htdemucs")
    else:
        from amw_tpu.models.vocal import isolate_vocal_bytes

        out = isolate_vocal_bytes(data, args.infile, model=args.model)
    open(args.outfile, "wb").write(out)
    print(f"wrote {args.outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
