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
        import numpy as np

        from amw_tpu.models.htdemucs_jax import load_params, separate
        from amw_tpu.utils import wav
        from amw_tpu.utils.audio_io import load_audio_from_bytes

        audio, sr = load_audio_from_bytes(data, args.infile)
        model, params = load_params(args.weights)
        stems = separate(model, params, audio)
        vocals = stems[model.cfg.sources.index("vocals")]
        out = wav.write_wav_float32(np.asarray(vocals), sr)
    else:
        from amw_tpu.models.vocal import isolate_vocal_bytes

        out = isolate_vocal_bytes(data, args.infile)
    open(args.outfile, "wb").write(out)
    print(f"wrote {args.outfile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
