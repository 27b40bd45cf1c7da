"""Build the native PCM codec: ``python -m amw_tpu.native.build``."""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
SRC = HERE / "pcm.cpp"
OUT = HERE / "libamwpcm.so"


def build(verbose: bool = True) -> pathlib.Path | None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(SRC), "-o", str(OUT),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        return OUT
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return None


if __name__ == "__main__":
    path = build()
    sys.exit(0 if path else 1)
