"""Native C++ PCM codec vs the numpy reference paths."""

import numpy as np
import pytest

from amw_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codec not built (no g++)")


def test_pcm16_roundtrip():
    g = np.random.default_rng(0)
    x = np.clip(0.5 * g.standard_normal((2, 10000)), -1, 1).astype(np.float32)
    noise = np.zeros_like(x)
    q = native.pcm16_encode_dithered(x, noise)  # [C, N] int16
    interleaved = np.ascontiguousarray(q.T).astype("<i2").tobytes()
    back = native.pcm16_decode(interleaved, 2)
    assert back.shape == x.shape
    assert np.max(np.abs(back - x)) < 2.0 / 32768


def test_pcm16_matches_numpy_quantizer():
    from amw_tpu.refimpl import quantize16

    g = np.random.default_rng(1)
    x = np.clip(0.7 * g.standard_normal((2, 5000)), -1, 1).astype(np.float32)
    noise = (g.random((2, 5000), dtype=np.float32) - 0.5)
    got = native.pcm16_encode_dithered(x, noise)  # [C, N]
    want = quantize16(x, noise.astype(np.float64))  # [C, N]
    assert np.array_equal(got, want)


def test_pcm24_roundtrip():
    g = np.random.default_rng(2)
    x = np.clip(0.5 * g.standard_normal((2, 4096)), -1, 1).astype(np.float32)
    raw = native.pcm24_encode(x)
    back = native.pcm24_decode(raw, 2)
    assert np.max(np.abs(back - x)) < 1.5 / (1 << 23)


def test_wav_reader_uses_native_path():
    from amw_tpu.utils import wav

    g = np.random.default_rng(3)
    x = np.clip(0.5 * g.standard_normal((2, 8000)), -1, 1).astype(np.float32)
    q = (x * 32767).astype(np.int16)
    blob = wav.write_wav_int16(q, 44100)
    back, sr = wav.read_wav(blob)
    assert sr == 44100
    assert np.max(np.abs(back - q.astype(np.float32) / 32768.0)) < 1e-6
