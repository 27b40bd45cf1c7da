"""Spectral ops: STFT Wiener denoiser, spectral envelope, reference match.

Reference: backend/app/pipeline.py:1472-1524 (``apply_spectral_denoise``,
scipy stft/istft n_fft=2048 hop=512 hann), :1527-1551
(``compute_spectral_envelope``), :1554-1612 (``apply_reference_match``,
Savitzky-Golay-smoothed envelope ratio → linear-phase FIR).

The STFT replicates scipy.signal.stft's conventions: 'zeros' boundary padding
of nperseg//2 on both sides, zero-padding to a whole number of hops, periodic
Hann window, and 1/win.sum() forward scaling (so magnitude thresholds match
the reference bit-for-bit); istft inverts with the win²-overlap normalization.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..spec import GraphSpec
from . import design
from .fdfilter import fftconvolve_same_fd


@functools.lru_cache(maxsize=None)
def _hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float64)


def _stft_geometry(n: int, nperseg: int, hop: int):
    """scipy stft frame count: zero-pad nperseg//2 both sides, then pad so
    (len - nperseg) is a hop multiple."""
    ext = n + nperseg  # nperseg//2 both sides
    rem = (ext - nperseg) % hop
    pad_tail = 0 if rem == 0 else hop - rem
    total = ext + pad_tail
    frames = (total - nperseg) // hop + 1
    return total, frames, pad_tail


def stft(x, nperseg: int = 2048, hop: int = 512):
    """[..., N] -> complex frames [..., T, nperseg//2+1] with scipy scaling."""
    n = x.shape[-1]
    total, frames, _ = _stft_geometry(n, nperseg, hop)
    lead = nperseg // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lead, total - n - lead)])
    idx = (np.arange(frames) * hop)[:, None] + np.arange(nperseg)[None, :]
    framed = xp[..., idx]  # [..., T, nperseg]
    win = _hann_periodic(nperseg)
    scale = 1.0 / win.sum()
    return jnp.fft.rfft(framed * jnp.asarray(win, x.dtype), axis=-1) * scale


def istft(Z, n: int, nperseg: int = 2048, hop: int = 512, n_frames_valid=None):
    """Inverse of :func:`stft`, cropped to ``n`` output samples.

    ``n_frames_valid`` (traced, optional): number of frames the exact-length
    signal would have.  Frames beyond it are all-silent in a bucket-padded
    signal and contribute nothing to the overlap-add *numerator*, but the
    static window-square normalization would still count them — the one frame
    that can overlap valid output positions (frame ``n_frames_valid``) is
    subtracted from the denominator so the result matches the exact-length
    istft's right-edge normalization.
    """
    win = _hann_periodic(nperseg)
    frames = Z.shape[-2]
    total = (frames - 1) * hop + nperseg
    seg = jnp.fft.irfft(Z * win.sum(), n=nperseg, axis=-1) * jnp.asarray(win, jnp.float32)
    # Overlap-add via scatter into [..., total].
    idx = (np.arange(frames) * hop)[:, None] + np.arange(nperseg)[None, :]
    out = jnp.zeros(Z.shape[:-2] + (total,), seg.dtype)
    out = out.at[..., idx.reshape(-1)].add(seg.reshape(Z.shape[:-2] + (-1,)))
    # Window-square overlap normalization (host-computed constant).
    norm = np.zeros(total)
    np.add.at(norm, idx.reshape(-1), np.tile(win * win, frames))
    if n_frames_valid is None:
        norm = np.where(norm > 1e-10, norm, 1.0)
        out = out / jnp.asarray(norm, out.dtype)
    else:
        w2 = np.concatenate([win * win, np.zeros(1)])
        u = jnp.arange(total) - n_frames_valid * hop
        deficit = jnp.asarray(w2, jnp.float32)[
            jnp.clip(u, 0, nperseg)] * ((u >= 0) & (u < nperseg))
        deficit = jnp.where(n_frames_valid < frames, deficit, 0.0)
        nv_norm = jnp.asarray(norm, jnp.float32) - deficit
        nv_norm = jnp.where(nv_norm > 1e-10, nv_norm, 1.0)
        out = out / nv_norm
    lead = nperseg // 2
    return out[..., lead:lead + n]


def build_spectral_denoise(spec: GraphSpec, strength: float = 0.5,
                           noise_percentile: float = 15.0):
    strength = float(np.clip(strength, 0.0, 1.0))
    if strength < 0.01:
        return [], lambda x, params: x
    min_gain = 0.25

    def fn(x, params):
        from .validctx import masked_quantile_last, n_valid

        nv = n_valid()
        Z = stft(x)  # [..., T, F]
        mag = jnp.abs(Z)
        magT = jnp.swapaxes(mag, -1, -2)  # [..., F, T]
        if nv is None:
            t_valid = None
            noise = jnp.percentile(magT, noise_percentile, axis=-1,
                                   keepdims=True)
            med = jnp.median(magT, axis=-1, keepdims=True)
        else:
            # Noise profile over the frames the exact-length signal would
            # have — all-silent padding frames must not skew the percentile.
            hop, T = 512, magT.shape[-1]
            t_valid = (nv + hop - 1) // hop + 1
            masked = jnp.where(jnp.arange(T) < t_valid, magT, jnp.inf)
            noise = masked_quantile_last(masked, noise_percentile, t_valid)
            med = masked_quantile_last(masked, 50.0, t_valid)
        noise = jnp.maximum(noise, 1e-12)
        med = jnp.maximum(med, 1e-12)
        noise = jnp.minimum(noise, 0.85 * med)
        gain = 1.0 - strength * (jnp.swapaxes(noise, -1, -2) / (mag + 1e-10)) ** 2
        gain = jnp.clip(gain, min_gain, 1.0)
        Zg = Z * gain
        if t_valid is not None:
            # Frame t_valid straddles the track tail (it holds real samples
            # in the padded signal) but does not exist in the exact-length
            # STFT — zero every frame >= t_valid so the overlap-add numerator
            # matches; istft's n_frames_valid corrects the denominator.
            T = Zg.shape[-2]
            Zg = Zg * (jnp.arange(T) < t_valid)[:, None]
        rec = istft(Zg, spec.n, n_frames_valid=t_valid)
        return jnp.clip(rec, -1.0, 1.0)

    return [], fn


def spectral_envelope(x, n_fft: int = 8192):
    """Averaged RMS magnitude spectrum of the mono mix ([..., C, N] input).

    Under a valid-length context (bucket-padded input) only the frames the
    exact-length signal would produce enter the average."""
    from .validctx import n_valid

    mono = x.mean(axis=-2) if x.ndim >= 2 else x
    n = mono.shape[-1]
    hop = n_fft // 4
    count = (n - n_fft) // hop + 1
    win = np.hanning(n_fft).astype(np.float32)
    if count <= 0:
        return jnp.ones(mono.shape[:-1] + (n_fft // 2 + 1,), jnp.float32)
    idx = (np.arange(count) * hop)[:, None] + np.arange(n_fft)[None, :]
    frames = mono[..., idx] * jnp.asarray(win)
    power = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    nv = n_valid()
    if nv is None:
        return jnp.sqrt(power.mean(axis=-2))
    count_v = jnp.maximum((nv - n_fft) // hop + 1, 1)
    valid = (jnp.arange(count) < count_v)[:, None]
    return jnp.sqrt((power * valid).sum(axis=-2) / count_v)


@functools.lru_cache(maxsize=None)
def _savgol_plan(n_pts: int, window: int = 51, polyorder: int = 3):
    """Interior conv kernel + edge polynomial-projection matrices replicating
    scipy.signal.savgol_filter(..., mode='interp')."""
    from scipy.signal import savgol_coeffs

    window = min(window, (n_pts // 4) * 2 + 1)
    window = max(5, window if window % 2 == 1 else window + 1)
    half = window // 2
    coeffs = savgol_coeffs(window, polyorder).astype(np.float64)
    pos = np.arange(window, dtype=np.float64)
    V = np.vander(pos, polyorder + 1, increasing=True)
    proj = V @ np.linalg.pinv(V)
    return window, half, coeffs, proj[:half], proj[window - half:]


def savgol_smooth(r, window: int = 51, polyorder: int = 3):
    """Savitzky-Golay smoothing of a 1-D device array (scipy 'interp' mode)."""
    n_pts = r.shape[-1]
    window, half, coeffs, A_left, A_right = _savgol_plan(n_pts, window, polyorder)
    nfft = design.next_fft_size(n_pts + window)
    interior = fftconvolve_same_fd(r, jnp.asarray(coeffs, r.dtype), nfft)
    left = jnp.asarray(A_left, r.dtype) @ r[..., :window]
    right = jnp.asarray(A_right, r.dtype) @ r[..., -window:]
    return jnp.concatenate([left, interior[..., half:n_pts - half], right], axis=-1)


def build_reference_match(spec: GraphSpec, ref_env: np.ndarray,
                          strength: float = 1.0, n_fft: int = 8192):
    """Match the track's spectral balance to a reference envelope.

    ``ref_env``: precomputed reference-track envelope ([n_fft//2+1], host; use
    :func:`spectral_envelope` on the reference audio, resampled to spec.sr as
    in pipeline.py:1581-1584)."""
    strength = float(np.clip(strength, 0.0, 1.0))
    if strength < 0.01:
        return [], lambda x, params: x
    hann = np.hanning(n_fft).astype(np.float32)
    conv_nfft = design.next_fft_size(spec.n + n_fft)
    params = [ref_env.astype(np.float32), hann]

    def fn(x, params):
        ref_e, win = params
        src_env = spectral_envelope(x, n_fft)
        eps = 1e-8
        ratio = (ref_e + eps) / (src_env + eps)
        ratio = jnp.clip(savgol_smooth(ratio), 0.1, 10.0)
        ratio = jnp.clip(1.0 + (ratio - 1.0) * strength, 0.1, 10.0)
        # The reference builds a mirrored real spectrum and takes ifft(...).real
        # (pipeline.py:1599-1603) — identical to irfft of the half spectrum —
        # then applies the Hann window to the *wrapped* zero-phase IR verbatim.
        ir = jnp.fft.irfft(ratio, n=n_fft, axis=-1) * win
        y = fftconvolve_same_fd(x, ir, conv_nfft)
        return jnp.clip(y, -1.0, 1.0)

    return params, fn
