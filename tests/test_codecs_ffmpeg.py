"""Codec round-trips through the ffmpeg boundary (MP3/FLAC/OPUS/AAC).

The reference exports through pydub/ffmpeg (backend/app/routers/
mastering.py export paths); this framework keeps the same host-side codec
boundary (utils/audio_io.py).  The dev/CI image has no ffmpeg — these tests
auto-skip there and run inside the Docker image (see Dockerfile), which is
where the formats actually ship.
"""

import numpy as np
import pytest

from amw_tpu.utils import audio_io

pytestmark = pytest.mark.skipif(
    not audio_io.ffmpeg_available(), reason="ffmpeg not installed")

SR = 44100


def _tone(n=SR, f=440.0, amp=0.5):
    t = np.arange(n) / SR
    x = (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)
    return np.stack([x, 0.8 * x])


@pytest.mark.parametrize("fmt", ["flac", "mp3", "opus", "aac"])
def test_export_then_load_roundtrip(fmt):
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
    if fmt == "flac":  # lossless: sample-exact to 16-bit quantization
        assert float(np.max(np.abs(a - b))) < 2e-4
    else:
        c = np.corrcoef(a, b)[0, 1]
        assert c > 0.9


def test_mp3_bitrate_respected():
    x = _tone(SR * 2)
    small = audio_io.export_audio(x, SR, "mp3", bitrate=96)
    big = audio_io.export_audio(x, SR, "mp3", bitrate=320)
    assert len(big) > len(small) * 2
