"""Build the native codecs: ``python -m amw_tpu.native.build``."""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
SRC = HERE / "pcm.cpp"
OUT = HERE / "libamwpcm.so"
SRC_FLAC = HERE / "flac.cpp"
OUT_FLAC = HERE / "libamwflac.so"


def _compile(src: pathlib.Path, out: pathlib.Path,
             verbose: bool) -> pathlib.Path | None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
        return out
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            print(f"native build failed: {e}", file=sys.stderr)
        return None


def build(verbose: bool = True) -> pathlib.Path | None:
    return _compile(SRC, OUT, verbose)


def build_flac(verbose: bool = True) -> pathlib.Path | None:
    return _compile(SRC_FLAC, OUT_FLAC, verbose)


if __name__ == "__main__":
    ok = build() and build_flac()
    sys.exit(0 if ok else 1)
