"""Codec round-trips at the host I/O boundary.

Format policy beats the reference (pipeline.py:802-827, 965-1052):
WAV and FLAC are handled natively (numpy codec + native/flac.cpp — the
reference uses libsndfile for both), and MP3/OPUS/AAC run through the
in-process FFmpeg-library shim (native/lavc.cpp) — the reference needs the
ffmpeg CLI subprocess (pydub) for those. All round-trips therefore run in
this CI image (no ffmpeg binary needed, only the libav shared libraries);
the ffmpeg CLI remains a fallback, and the reference's explanatory error
contract is asserted for hosts with neither.
"""

import numpy as np
import pytest

from amw_tpu.utils import audio_io

needs_lossy = pytest.mark.skipif(
    not audio_io.lossy_codec_available(),
    reason="no lossy codec boundary (no lavc shim, no ffmpeg CLI)")

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


def test_ffmpeg_gated_formats_error_contract(monkeypatch):
    """Without any codec boundary the lossy formats raise the reference's
    explanatory error (pipeline.py:819-827 semantics) — never a silent
    fallback. The no-codec host is simulated so this contract is asserted
    on every machine."""
    monkeypatch.setattr(audio_io, "lavc_available", lambda: False)
    monkeypatch.setattr(audio_io, "ffmpeg_available", lambda: False)
    x = _tone(2048)
    for fmt in ("mp3", "opus", "aac"):
        with pytest.raises(RuntimeError, match="ffmpeg"):
            audio_io.export_audio(x, SR, fmt)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        audio_io.load_audio_from_bytes(b"\xff\xfb" + b"\x00" * 100, "t.mp3")


@needs_lossy
@pytest.mark.parametrize("fmt", ["mp3", "opus", "aac"])
def test_export_then_load_roundtrip_lossy(fmt):
    x = _tone()
    blob = audio_io.export_audio(x, SR, fmt)
    assert len(blob) > 1000
    y, sr = audio_io.load_audio_from_bytes(blob, f"test.{fmt}")
    assert y.shape[0] == 2
    if sr != SR:
        # opus decodes at its native 48 kHz — resample for comparison
        t_src = np.arange(y.shape[-1]) / sr
        t_dst = np.arange(int(y.shape[-1] * SR / sr)) / SR
        y = np.stack([np.interp(t_dst, t_src, ch) for ch in y])
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


@needs_lossy
def test_mp3_bitrate_respected():
    x = _tone(SR * 2)
    # 128 and 320 are both in the reference's allowed set (an
    # out-of-set bitrate clamps to 320, mastering.py:749-766 semantics)
    small = audio_io.export_audio(x, SR, "mp3", bitrate=128)
    big = audio_io.export_audio(x, SR, "mp3", bitrate=320)
    assert len(big) > len(small) * 2
