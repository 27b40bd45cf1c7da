"""Schroeder reverb as precomputed-IR FFT convolution.

The reference runs numba-JIT per-sample comb/allpass recurrences
(pipeline.py:1065-1176).  Those are LTI systems, so the TPU-native design
precomputes the full wet impulse response on the host analytically
(comb IR: ``g^k`` at lags ``k·d``; allpass IR: ``-g`` then ``g^{k-1}(1-g²)``
at lags ``k·d``) and convolves on-device via XLA FFT — exact to the IR
truncation level (1e-9).  The data-dependent wet-peak normalization
(pipeline.py:1126-1128) stays on-device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..constants import REVERB_PRESETS
from ..spec import GraphSpec
from . import design
from .stereo import ms_decode, ms_encode

_EPS = 1e-9


def _comb_ir(d: int, g: float, max_len: int) -> np.ndarray:
    k_max = int(np.ceil(np.log(_EPS) / np.log(max(abs(g), 1e-12)))) if abs(g) < 1 else max_len // d
    k_max = min(k_max, (max_len - 1) // d)
    ir = np.zeros(k_max * d + 1)
    ir[::d] = g ** np.arange(k_max + 1)
    return ir


def _allpass_ir(d: int, g: float, max_len: int) -> np.ndarray:
    k_max = int(np.ceil(np.log(_EPS) / np.log(max(abs(g), 1e-12)))) if abs(g) < 1 else max_len // d
    k_max = min(max(k_max, 1), (max_len - 1) // d)
    ir = np.zeros(k_max * d + 1)
    ir[0] = -g
    k = np.arange(1, k_max + 1)
    ir[k * d] = (g ** (k - 1)) * (1.0 - g * g)
    return ir


@functools.lru_cache(maxsize=None)
def wet_ir(sr: int, n: int, reverb_type: str, decay_sec: float) -> np.ndarray:
    """Host-built wet IR for a preset, truncated to ``n`` samples (only the
    first n samples of the convolution are observable downstream)."""
    preset = REVERB_PRESETS.get(reverb_type, REVERB_PRESETS["plate"])
    decay = decay_sec if decay_sec > 0 else preset[0]
    comb_d, comb_g, ap_d, ap_g = preset[1], preset[2], preset[3], preset[4]
    decay_per_sec = 0.001 ** (1.0 / max(0.1, decay))
    acc = np.zeros(1)
    for d_ms, g in zip(comb_d, comb_g):
        d = min(int(sr * d_ms / 1000.0), n - 1)
        if d < 1:
            # degenerate comb passes the input through (pipeline.py:1075-1076)
            ir = np.ones(1)
        else:
            ir = _comb_ir(d, g * (decay_per_sec ** (d_ms / 1000.0)), n)
        L = max(len(acc), len(ir))
        merged = np.zeros(L)
        merged[: len(acc)] = acc
        merged[: len(ir)] += ir
        acc = merged
    acc = acc / max(len(comb_d), 1)
    from scipy.signal import fftconvolve

    for d_ms, g in zip(ap_d, ap_g):
        d = min(int(sr * d_ms / 1000.0), n - 1)
        if d < 1:
            continue
        acc = fftconvolve(acc, _allpass_ir(d, g, n))
    return acc[:n].astype(np.float32)


def _wet_ir_array(sr, n, reverb_type, decay_sec) -> np.ndarray:
    return wet_ir(sr, n, reverb_type, decay_sec)


def build_reverb(
    spec: GraphSpec,
    reverb_type: str = "plate",
    decay_sec: float = 1.2,
    mix: float = 0.15,
    mix_mid: float | None = None,
    mix_side: float | None = None,
):
    preset = REVERB_PRESETS.get(reverb_type, REVERB_PRESETS["plate"])
    decay = decay_sec if decay_sec > 0 else preset[0]
    ir = _wet_ir_array(spec.sr, spec.n, reverb_type, decay)
    nfft = design.next_fft_size(spec.n + len(ir))
    params = [ir]
    use_ms = spec.channels == 2 and (mix_mid is not None or mix_side is not None)
    m_mid = float(np.clip(mix_mid if mix_mid is not None else mix, 0.0, 1.0))
    m_side = float(np.clip(mix_side if mix_side is not None else mix, 0.0, 1.0))

    def _wet(x, ir_dev):
        from .validctx import mask_tail

        # Linear convolution cropped to the first n samples (the recurrence
        # only ever produces those) + per-signal peak normalization.  Causal
        # wet ringout past the valid end is masked so the peak (and the
        # normalization it drives) matches the exact-length graph.
        y = jnp.fft.irfft(
            jnp.fft.rfft(x, n=nfft, axis=-1) * jnp.fft.rfft(ir_dev, n=nfft), n=nfft, axis=-1
        )[..., : spec.n]
        y = mask_tail(y)
        peak = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
        scale = jnp.where(peak > 1e-6, 1.0 / jnp.minimum(peak, 2.0), 1.0)
        return y * scale

    def fn(x, params):
        ir_dev = params[0]
        if use_ms:
            mid, side = ms_encode(x)
            mo = mid * (1.0 - m_mid) + _wet(mid, ir_dev) * m_mid
            so = side * (1.0 - m_side) + _wet(side, ir_dev) * m_side
            return ms_decode(mo, so)
        out = x * (1.0 - mix) + _wet(x, ir_dev) * mix
        return jnp.clip(out, -1.0, 1.0)

    return params, fn
