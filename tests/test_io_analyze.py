"""WAV codec roundtrips, export path, and the analysis suite."""

import numpy as np
import pytest

from amw_tpu.utils import wav
from amw_tpu.utils.audio_io import auto_blank_end, dithered_int16, export_audio
from amw_tpu.models.analyze import analyze, lufs_analyze_tool
from amw_tpu import refimpl
from tests.conftest import make_sine

SR = 44100


def test_wav_int16_roundtrip(sine_stereo):
    q = dithered_int16(sine_stereo, "tpdf", np.random.default_rng(0))
    blob = wav.write_wav_int16(q, SR)
    back, sr = wav.read_wav(blob)
    assert sr == SR and back.shape == sine_stereo.shape
    assert np.max(np.abs(back - sine_stereo)) < 2.5 / 32768


def test_wav_float32_roundtrip(sine_stereo):
    blob = wav.write_wav_float32(sine_stereo, SR)
    back, sr = wav.read_wav(blob)
    np.testing.assert_allclose(back, sine_stereo, atol=0)


def test_wav_int24_roundtrip(sine_stereo):
    blob = wav.write_wav_int24(sine_stereo, SR)
    back, sr = wav.read_wav(blob)
    assert np.max(np.abs(back - sine_stereo)) < 2.0 / (1 << 23)


def test_dither_statistics():
    # Quantization error with TPDF dither must stay within ±1.5 LSB and be
    # unbiased.
    x = make_sine(amp=0.25)[0:1]
    q = dithered_int16(x, "tpdf", np.random.default_rng(1)).astype(np.float64)
    err = q - x * 32767.0
    assert np.max(np.abs(err)) <= 1.51
    assert abs(err.mean()) < 0.01


@pytest.mark.parametrize("dt", ["tpdf", "ns_e", "ns_itu"])
def test_export_wav_variants(sine_stereo, dt):
    blob = export_audio(sine_stereo, SR, "wav", dither_type=dt)
    back, sr = wav.read_wav(blob)
    assert sr == SR
    assert np.max(np.abs(back - sine_stereo)) < 0.002


def test_export_unavailable_codec_raises(sine_stereo, monkeypatch):
    from amw_tpu.utils import audio_io
    monkeypatch.setattr(audio_io, "lavc_available", lambda: False)
    monkeypatch.setattr(audio_io, "ffmpeg_available", lambda: False)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        export_audio(sine_stereo, SR, "mp3")


def test_auto_blank_end():
    x = np.zeros((2, SR * 2), np.float32)
    x[:, : SR // 2] = 0.5
    out = auto_blank_end(x, SR, min_silence_sec=0.5)
    assert out.shape[-1] == SR // 2 + int(SR * 0.5)


def test_analyze_basic(sine_stereo):
    out = analyze(sine_stereo, SR)
    assert out["version"] == "v2"
    assert out["channels"] == 2
    assert out["sample_rate"] == SR
    assert abs(out["duration_sec"] - 2.0) < 0.01
    assert out["lufs"] is not None
    want = refimpl.integrated_lufs(sine_stereo, SR)
    assert abs(out["lufs"] - want) < 0.05
    assert "streaming_preview" in out
    assert out["streaming_preview"]["Spotify"]["target_lufs"] == -14.0
    assert abs(out["stereo_correlation"] - 1.0) < 1e-3


def test_analyze_extended(sine_stereo):
    out = analyze(sine_stereo, SR, extended=True)
    assert len(out["spectrum_bars"]) == 64
    assert len(out["spectrum_bars_mid"]) == 64
    assert len(out["vectorscope_points"]) <= 1000
    assert len(out["lufs_timeline"]) >= 2
    assert out["timeline_step_sec"] > 0


def test_lufs_tool(sine_stereo):
    out = lufs_analyze_tool(sine_stereo, SR)
    assert isinstance(out["spotify_ready"], bool)
    assert out["true_peak_dbfs"] > -10
    want_tp = refimpl.true_peak_dbfs(sine_stereo, SR)
    assert abs(out["true_peak_dbfs"] - want_tp) < 0.05
    assert out["loudness_range_lu"] >= 0.0
    assert len(out["recommendations"]) >= 1
