"""Codec round-trips at the host I/O boundary.

Format policy mirrors the reference exactly (pipeline.py:802-827, 965-1052):
WAV and FLAC are handled natively (numpy codec + native/flac.cpp — the
reference uses libsndfile for both), while MP3/OPUS/AAC ride ffmpeg — in
the reference too (pydub). The FLAC tests therefore run everywhere; the
MP3/OPUS/AAC round-trips auto-skip where ffmpeg is absent (this CI image)
and run inside the Docker image, which installs it (see Dockerfile) — the
same machines the reference needs for those formats. The error contract
for the ffmpeg-gated formats is asserted unconditionally below.
"""

import numpy as np
import pytest

from amw_tpu.utils import audio_io

needs_ffmpeg = pytest.mark.skipif(
    not audio_io.ffmpeg_available(), reason="ffmpeg not installed")

SR = 44100


def _tone(n=SR, f=440.0, amp=0.5):
    t = np.arange(n) / SR
    x = (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)
    return np.stack([x, 0.8 * x])


def test_flac_export_then_load_roundtrip_native():
    """FLAC is a native capability (no ffmpeg): 24-bit export, lossless to
    quantization, real compression."""
    x = _tone()
    blob = audio_io.export_audio(x, SR, "flac")
    assert blob[:4] == b"fLaC"
    assert 1000 < len(blob) < x.size * 3  # genuinely compressed
    y, sr = audio_io.load_audio_from_bytes(blob, "test.flac")
    assert sr == SR and y.shape[0] == 2
    n = min(x.shape[-1], y.shape[-1])
    assert float(np.max(np.abs(x[:, :n] - y[:, :n]))) < 2e-7 + 2 ** -23


def test_flac_roundtrip_noise_and_silence():
    g = np.random.default_rng(7)
    x = np.concatenate([np.zeros((2, 3000), np.float32),
                        (0.3 * g.standard_normal((2, 5431))
                         ).astype(np.float32)], axis=1)
    blob = audio_io.export_audio(x, SR, "flac")
    y, sr = audio_io.load_audio_from_bytes(blob, "x.flac")
    assert y.shape == x.shape
    assert float(np.max(np.abs(np.clip(x, -1, 1) - y))) < 2e-7 + 2 ** -23


def test_ffmpeg_gated_formats_error_contract():
    """Without ffmpeg the lossy codecs raise the reference's explanatory
    error (pipeline.py:819-827 semantics) — never a silent fallback."""
    if audio_io.ffmpeg_available():
        pytest.skip("ffmpeg present: gated formats actually work here")
    x = _tone(2048)
    for fmt in ("mp3", "opus", "aac"):
        with pytest.raises(RuntimeError, match="ffmpeg"):
            audio_io.export_audio(x, SR, fmt)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        audio_io.load_audio_from_bytes(b"\xff\xfb" + b"\x00" * 100, "t.mp3")


@needs_ffmpeg
@pytest.mark.parametrize("fmt", ["mp3", "opus", "aac"])
def test_export_then_load_roundtrip_lossy(fmt):
    x = _tone()
    blob = audio_io.export_audio(x, SR, fmt)
    assert len(blob) > 1000
    y, sr = audio_io.load_audio_from_bytes(blob, f"test.{fmt}")
    assert y.shape[0] == 2
    # Lossy codecs change rate handling/length slightly; compare a trimmed
    # mid-section RMS and correlation instead of samples.
    n = min(x.shape[-1], y.shape[-1]) - 2048
    a = x[0, 1024:n]
    b = y[0, 1024:n]
    rms_a = float(np.sqrt(np.mean(a * a)))
    rms_b = float(np.sqrt(np.mean(b * b)))
    assert abs(rms_a - rms_b) < 0.1 * rms_a
    c = np.corrcoef(a, b)[0, 1]
    assert c > 0.9


@needs_ffmpeg
def test_mp3_bitrate_respected():
    x = _tone(SR * 2)
    small = audio_io.export_audio(x, SR, "mp3", bitrate=96)
    big = audio_io.export_audio(x, SR, "mp3", bitrate=320)
    assert len(big) > len(small) * 2
