"""Host-side audio load/export (the chain's I/O boundary).

Mirrors the reference's format policy (pipeline.py:802-827, 965-1052):
WAV decodes natively (pure numpy codec), FLAC via native/flac.cpp, and
MP3/OPUS/AAC via the in-process FFmpeg-library shim (native/lavc.cpp) —
the reference needs the ffmpeg CLI for those (pydub subprocess). The CLI
remains as a fallback when the shim can't build (no g++ / no libav dev
headers), and the reference's explanatory error is raised when neither
path exists. Export always quantizes through the dithered 16-bit path
(except FLAC/WAV24, which are 24-bit).
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np

from ..refimpl import pipeline as refimpl
from . import wav


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def lavc_available() -> bool:
    """In-process FFmpeg-library codec shim (native/lavc.cpp)."""
    from .. import native

    return native.lavc_available()


def lossy_codec_available() -> bool:
    """Can MP3/OPUS/AAC be encoded/decoded on this host?"""
    return lavc_available() or ffmpeg_available()


def _ffmpeg_error(fmt: str) -> RuntimeError:
    return RuntimeError(
        f"Format {fmt.upper()} requires ffmpeg, which is not installed on this "
        "server. Install it with: sudo apt-get install -y ffmpeg"
    )


def _run_ffmpeg(args: list[str], input_bytes: bytes) -> bytes:
    proc = subprocess.run(
        ["ffmpeg", "-v", "error", *args],
        input=input_bytes, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg failed: {proc.stderr.decode()[:500]}")
    return proc.stdout


def load_audio_from_bytes(data: bytes, fmt: str):
    """-> (audio[C, N] float32, sr).  Channel-major (reference is [N, C]).

    WAV and FLAC decode natively (numpy codec / native/flac.cpp) — the
    reference handles both without ffmpeg via libsndfile
    (pipeline.py:802-817); MP3/OPUS/AAC ride the ffmpeg boundary exactly
    as the reference's pydub path does (pipeline.py:819-827)."""
    ext = fmt.rsplit(".", 1)[-1].lower().lstrip(".")
    if ext == "wav":
        return wav.read_wav(data)
    if ext == "flac" or data[:4] == b"fLaC":
        from .. import native

        if native.flac_available():
            try:
                q, sr, bits = native.flac_decode(data)
                return (q.astype(np.float32)
                        / np.float32(2 ** (bits - 1))), sr
            except ValueError:
                if not lossy_codec_available():
                    raise
        # unsupported stream shape or no toolchain: lavc/ffmpeg below
    if lavc_available():
        from .. import native

        try:
            return native.lavc_decode(data)
        except ValueError:
            if not ffmpeg_available():
                raise
    if not ffmpeg_available():
        raise _ffmpeg_error(ext)
    out = _run_ffmpeg(
        ["-i", "pipe:0", "-f", "wav", "-acodec", "pcm_f32le", "pipe:1"], data
    )
    return wav.read_wav(out)


def auto_blank_end(x: np.ndarray, sr: int, threshold_dbfs: float = -50.0,
                   min_silence_sec: float = 0.5) -> np.ndarray:
    """Trim trailing silence (pipeline.py:902-917)."""
    if x.size == 0 or min_silence_sec <= 0:
        return x
    thr = 10 ** (threshold_dbfs / 20.0)
    peak = np.max(np.abs(x), axis=0) if x.ndim > 1 else np.abs(x)
    above = np.nonzero(peak > thr)[0]
    if len(above) == 0:
        return x
    idx = min(x.shape[-1], int(above[-1]) + 1 + int(sr * min_silence_sec))
    return x[..., :idx]


def dithered_int16(x: np.ndarray, dither_type: str = "tpdf",
                   rng: np.random.Generator | None = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    x = np.clip(np.nan_to_num(np.asarray(x, np.float64),
                              nan=0.0, posinf=1.0, neginf=-1.0), -1.0, 1.0)
    n = x.shape[-1]
    if dither_type == "ns_e" and n >= 4:
        noise = refimpl.dither_ns_e(x.shape, rng)
    elif dither_type == "ns_itu" and n >= 8:
        noise = refimpl.dither_ns_itu(x.shape, rng)
    else:
        noise = refimpl.dither_tpdf(x.shape, rng)
    return refimpl.quantize16(x, noise)


def export_audio(
    samples: np.ndarray,
    sr: int,
    out_format: str = "wav",
    dither_type: str = "tpdf",
    auto_blank_sec: float = 0.0,
    bitrate: int | None = None,
    rng: np.random.Generator | None = None,
) -> bytes:
    """[C, N] float -> encoded bytes (pipeline.py:965-1052 semantics)."""
    x = np.atleast_2d(np.asarray(samples, np.float32))
    x = np.clip(x, -1.0, 1.0)
    if auto_blank_sec > 0:
        x = auto_blank_end(x, sr, threshold_dbfs=-50.0,
                           min_silence_sec=auto_blank_sec)

    if out_format == "wav":
        return wav.write_wav_int16(dithered_int16(x, dither_type, rng), sr)
    if out_format == "wav24":
        return wav.write_wav_int24(x, sr)
    if out_format == "wav32f":
        return wav.write_wav_float32(x, sr)

    if out_format == "flac":
        # 24-bit FLAC like the reference's soundfile PCM_24 export
        # (pipeline.py:990) — native codec first, ffmpeg fallback.
        from .. import native

        if native.flac_available():
            q = np.clip(np.round(np.asarray(x, np.float64) * 8388607.0),
                        -8388608, 8388607).astype(np.int32)
            return native.flac_encode(q, sr, bits=24)
        if not ffmpeg_available():
            raise _ffmpeg_error(out_format)
        src = wav.write_wav_int24(x, sr)
        return _run_ffmpeg(["-i", "pipe:0", "-f", "flac", "pipe:1"], src)
    if not lossy_codec_available():
        raise _ffmpeg_error(out_format)
    # encode the dithered 16-bit signal — identical input to the CLI path,
    # which pipes a 16-bit dithered WAV into ffmpeg (reference
    # pipeline.py:999-1052 likewise encodes post-dither audio via pydub)
    q16 = dithered_int16(x, dither_type, rng)  # [C, N] int16
    if out_format == "mp3":
        br = bitrate if bitrate in (128, 192, 256, 320) else 320
    elif out_format == "opus":
        br = bitrate if bitrate in (128, 192) else 192
    else:
        br = 192
    if lavc_available() and out_format in ("mp3", "opus", "aac"):
        from .. import native

        xq = q16.astype(np.float32) / 32767.0
        return native.lavc_encode(xq, sr, out_format, br)
    wav_bytes = wav.write_wav_int16(q16, sr)
    if out_format == "mp3":
        return _run_ffmpeg(
            ["-i", "pipe:0", "-f", "mp3", "-b:a", f"{br}k", "pipe:1"], wav_bytes)
    if out_format == "opus":
        return _run_ffmpeg(
            ["-i", "pipe:0", "-f", "opus", "-c:a", "libopus", "-b:a", f"{br}k",
             "pipe:1"], wav_bytes)
    if out_format == "aac":
        return _run_ffmpeg(
            ["-i", "pipe:0", "-f", "ipod", "-c:a", "aac", "-b:a", "192k",
             "-movflags", "frag_keyframe+empty_moov", "pipe:1"], wav_bytes)
    return _run_ffmpeg(["-i", "pipe:0", "-f", out_format, "pipe:1"], wav_bytes)
