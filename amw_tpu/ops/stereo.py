"""Stereo field ops: M/S encode/decode and the stereo imager.

Reference: backend/app/ms_utils.py:9-34 and pipeline.py:1329-1398
(``apply_stereo_imager`` — M/S width, optional 4-band widths, Haas
stereoize).  Channel axis is ``-2`` (channel-major layout).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..spec import GraphSpec
from .bands import band_split_plan


def ms_encode(x):
    """[..., 2, N] -> (mid, side), each [..., N]."""
    return (x[..., 0, :] + x[..., 1, :]) * 0.5, (x[..., 0, :] - x[..., 1, :]) * 0.5


def ms_decode(mid, side):
    left = jnp.clip(mid + side, -1.0, 1.0)
    right = jnp.clip(mid - side, -1.0, 1.0)
    return jnp.stack([left, right], axis=-2)


def _apply_width(x, width):
    mid, side = ms_encode(x)
    side = side * width
    return jnp.stack(
        [jnp.clip(mid + side, -1.0, 1.0), jnp.clip(mid - side, -1.0, 1.0)], axis=-2
    )


def build_stereo_imager(
    spec: GraphSpec,
    width: float = 1.0,
    stereoize_delay_ms: float = 0.0,
    stereoize_mix: float = 0.12,
    band_widths=None,
    crossovers_hz=None,
):
    if spec.channels != 2:
        return [], lambda x, params: x

    use_bands = band_widths is not None and len(band_widths) == 4 and spec.sr > 0
    if use_bands:
        params, split_fn = band_split_plan(spec, crossovers_hz)
        widths = tuple(float(band_widths[i]) for i in range(4))
    else:
        params, split_fn, widths = [], None, None

    delay_n = 0
    mix = 0.0
    if stereoize_delay_ms > 0 and spec.sr > 0 and stereoize_mix > 0:
        delay_n = max(0, min(int(spec.sr * stereoize_delay_ms / 1000.0), spec.n - 1))
        mix = min(0.35, max(0.0, float(stereoize_mix)))

    def fn(x, params):
        if use_bands:
            bands = split_fn(x, params)
            out = None
            for band, w in zip(bands, widths):
                wb = _apply_width(band, w)
                out = wb if out is None else out + wb
            out = jnp.clip(out, -1.0, 1.0)
        else:
            out = _apply_width(x, width)
        if delay_n > 0 and mix > 0:
            pad = jnp.zeros(out.shape[:-1] + (delay_n,), out.dtype)
            delayed = jnp.concatenate([pad, out[..., :-delay_n]], axis=-1)
            # Cross-feed: L gets delayed R and vice versa.
            crossed = delayed[..., ::-1, :]
            out = jnp.clip(out + mix * crossed, -1.0, 1.0)
        return out

    return params, fn
