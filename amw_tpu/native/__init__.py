"""ctypes bindings for the native PCM codec (libamwpcm.so).

Loads lazily; if the shared object is missing it is built on first use with
g++ (falling back silently to the numpy implementations in utils/wav.py when
no toolchain is available).
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libamwpcm.so"
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        from .build import build

        if build(verbose=False) is None:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.pcm16_to_f32_planar.argtypes = [i16p, f32p, i64, i32]
    lib.pcm24_to_f32_planar.argtypes = [u8p, f32p, i64, i32]
    lib.f32_interleaved_to_planar.argtypes = [f32p, f32p, i64, i32]
    lib.f32_planar_dither_to_pcm16.argtypes = [f32p, f32p, i16p, i64, i32]
    lib.f32_planar_to_pcm24.argtypes = [f32p, u8p, i64, i32]
    lib.f32_peak.argtypes = [f32p, i64]
    lib.f32_peak.restype = ctypes.c_float
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def pcm16_decode(raw: bytes, channels: int) -> np.ndarray:
    lib = get_lib()
    src = np.frombuffer(raw, "<i2")
    frames = len(src) // channels
    src = np.ascontiguousarray(src[: frames * channels])
    out = np.empty((channels, frames), np.float32)
    lib.pcm16_to_f32_planar(src, out, frames, channels)
    return out


def pcm24_decode(raw: bytes, channels: int) -> np.ndarray:
    lib = get_lib()
    src = np.frombuffer(raw, np.uint8)
    frames = len(src) // (3 * channels)
    src = np.ascontiguousarray(src[: frames * channels * 3])
    out = np.empty((channels, frames), np.float32)
    lib.pcm24_to_f32_planar(src, out, frames, channels)
    return out


def f32_decode(raw: bytes, channels: int) -> np.ndarray:
    lib = get_lib()
    src = np.frombuffer(raw, "<f4")
    frames = len(src) // channels
    src = np.ascontiguousarray(src[: frames * channels])
    out = np.empty((channels, frames), np.float32)
    lib.f32_interleaved_to_planar(src, out, frames, channels)
    return out


def pcm16_encode_dithered(x: np.ndarray, noise: np.ndarray) -> np.ndarray:
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    noise = np.ascontiguousarray(noise, np.float32)
    C, n = x.shape
    out = np.empty(n * C, np.int16)
    lib.f32_planar_dither_to_pcm16(x, noise, out, n, C)
    return out.reshape(n, C).T


def pcm24_encode(x: np.ndarray) -> bytes:
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    C, n = x.shape
    out = np.empty(n * C * 3, np.uint8)
    lib.f32_planar_to_pcm24(x, out, n, C)
    return out.tobytes()
