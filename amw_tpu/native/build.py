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
SRC_LAVC = HERE / "lavc.cpp"
OUT_LAVC = HERE / "libamwlavc.so"


def _compile(src: pathlib.Path, out: pathlib.Path, verbose: bool,
             extra: list[str] | None = None) -> pathlib.Path | None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out), *(extra or []),
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


def _lavc_include_dir() -> pathlib.Path | None:
    for d in ("/usr/include/x86_64-linux-gnu", "/usr/include",
              "/usr/local/include"):
        if (pathlib.Path(d) / "libavcodec" / "avcodec.h").exists():
            return pathlib.Path(d)
    return None


def build_lavc(verbose: bool = True) -> pathlib.Path | None:
    """Lossy-codec shim; needs the FFmpeg dev headers + shared libs.
    Returns None (callers fall back to the ffmpeg CLI / error contract)
    when they're absent."""
    inc = _lavc_include_dir()
    if inc is None:
        if verbose:
            print("lavc: FFmpeg dev headers not found", file=sys.stderr)
        return None
    return _compile(
        SRC_LAVC, OUT_LAVC, verbose,
        extra=[f"-I{inc}", "-lavformat", "-lavcodec", "-lswresample",
               "-lavutil"])


if __name__ == "__main__":
    ok = build() and build_flac()
    lavc = build_lavc()  # optional: absent headers is not a build failure
    print(f"lavc shim: {'built' if lavc else 'skipped'}", file=sys.stderr)
    sys.exit(0 if ok else 1)
