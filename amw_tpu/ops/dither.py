"""Dither generation and 16-bit quantization (device-side, JAX PRNG).

Reference: backend/app/pipeline.py:830-899.  TPDF = sum of two uniforms - 1
(1 LSB); ``ns_e`` = white noise through the 1-pole HP ``y = x - x[n-1] +
0.99·y[n-1]`` (×0.9); ``ns_itu`` = white noise through the 2-pole HP
``b=[1,-2,1], a=[1,-1.96,0.9604]`` (×0.9).  The noise-shaping filters are
linear, so they run through the causal frequency-domain filter; the RNG is
JAX's counter-based PRNG (reproducible under vmap/jit), so parity with the
reference is statistical, not bitwise.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import design


@functools.lru_cache(maxsize=None)
def _ns_response(kind: str, nfft: int) -> np.ndarray:
    if kind == "ns_e":
        b, a = (1.0, -1.0), (1.0, -0.99)
    elif kind == "ns_itu":
        b, a = (1.0, -2.0, 1.0), (1.0, -1.96, 0.9604)
    else:
        raise ValueError(kind)
    from .zphase import pack_complex

    return pack_complex(design.freqz(np.asarray(b), np.asarray(a), nfft))


def dither_noise(key: jax.Array, shape, dither_type: str = "tpdf") -> jax.Array:
    """Dither noise in LSB units for a [..., N] signal."""
    n = shape[-1]
    if dither_type == "tpdf" or n < (4 if dither_type == "ns_e" else 8):
        k1, k2 = jax.random.split(key)
        return (jax.random.uniform(k1, shape) + jax.random.uniform(k2, shape) - 1.0)
    white = 2.0 * jax.random.uniform(key, shape) - 1.0
    settle = 2000 if dither_type == "ns_e" else 4000
    nfft = design.next_fft_size(n + settle)
    Hp = jnp.asarray(_ns_response(dither_type, nfft))
    H = jax.lax.complex(Hp[0], Hp[1])
    y = jnp.fft.irfft(jnp.fft.rfft(white, n=nfft, axis=-1) * H, n=nfft, axis=-1)[..., :n]
    return y * 0.9


def quantize16(x: jax.Array, noise: jax.Array) -> jax.Array:
    """float [-1,1] -> int16 with additive dither (pipeline.py:880-899)."""
    x = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=-1.0)
    x = jnp.clip(x, -1.0, 1.0)
    d = x * 32767.0 + noise
    d = jnp.nan_to_num(d, nan=0.0, posinf=32767.0, neginf=-32768.0)
    return jnp.clip(jnp.round(d), -32768, 32767).astype(jnp.int16)
