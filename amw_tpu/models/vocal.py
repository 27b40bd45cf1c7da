"""Vocal isolation on TPU.

The reference shells out to Demucs ``htdemucs`` (PyTorch subprocess,
services/vocal_isolation.py:13-63).  This build provides a TPU-native
two-stem separator implemented as a fused STFT-domain graph:

- Mid/Side decomposition: lead vocals are overwhelmingly center-panned.
- Inter-channel coherence mask: per STFT cell, the ratio of coherent
  (in-phase, equal-magnitude) energy to total energy gates the mid signal
  (a karaoke-style center extractor with soft Wiener-like masking).
- Spectral prior: a vocal-band emphasis (120 Hz – 10 kHz, raised-cosine
  edges) suppresses bass/air content that is center-panned but non-vocal.

This is a classical DSP separator — transparent, fast, and fully on-TPU —
not a neural model; an htdemucs-class JAX port (weights loadable via orbax)
is the planned upgrade path and the module keeps the same interface for it.

``isolate_vocal_bytes`` mirrors the reference's byte-level contract:
audio bytes in → two-stem "vocals" WAV bytes out.
"""

from __future__ import annotations

import functools
import threading

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.spectral import istft, stft
from ..spec import GraphSpec


def _vocal_band_weight(sr: int, n_bins: int, nperseg: int = 2048) -> np.ndarray:
    freqs = np.arange(n_bins) * (sr / nperseg)
    w = np.ones(n_bins)
    # raised-cosine high-pass edge 80->160 Hz
    lo0, lo1 = 80.0, 160.0
    # raised-cosine low-pass edge 9k->14k
    hi0, hi1 = 9000.0, 14000.0
    w = np.where(freqs < lo0, 0.0, w)
    ramp = (freqs - lo0) / (lo1 - lo0)
    w = np.where((freqs >= lo0) & (freqs < lo1),
                 0.5 - 0.5 * np.cos(np.pi * np.clip(ramp, 0, 1)), w)
    ramp2 = (freqs - hi0) / (hi1 - hi0)
    w = np.where((freqs >= hi0) & (freqs < hi1),
                 0.5 + 0.5 * np.cos(np.pi * np.clip(ramp2, 0, 1)), w)
    w = np.where(freqs >= hi1, 0.0, w)
    return w.astype(np.float32)


def build_vocal_isolation(spec: GraphSpec, strength: float = 1.0):
    """(params, fn): fn(x[C,N], params) -> vocals [C, N]."""
    n_bins = 2048 // 2 + 1
    params = [_vocal_band_weight(spec.sr, n_bins)]

    def fn(x, params):
        band_w = params[0]
        if x.shape[-2] == 1:
            # Mono: vocal-band emphasis only (no spatial cue available).
            Z = stft(x)
            V = Z * band_w
            return jnp.clip(istft(V, spec.n), -1.0, 1.0)
        L = stft(x[..., 0, :])
        R = stft(x[..., 1, :])
        mid = (L + R) * 0.5
        # Coherence: 1 for identical channels, ->0 for independent/out-of-phase.
        cross = L * jnp.conj(R)
        denom = (jnp.abs(L) ** 2 + jnp.abs(R) ** 2) * 0.5 + 1e-12
        coh = jnp.clip(jnp.real(cross) / denom, 0.0, 1.0)
        mask = (coh ** 2) * band_w * strength
        V = mid * mask
        v = istft(V, spec.n)
        vocals = jnp.stack([v, v], axis=-2)
        return jnp.clip(vocals, -1.0, 1.0)

    return params, fn


@functools.lru_cache(maxsize=8)
def _jitted(sr: int, n: int, channels: int):
    spec = GraphSpec(sr=sr, n=n, channels=channels)
    params, fn = build_vocal_isolation(spec)
    return jax.device_put(params), jax.jit(fn)


def is_available() -> bool:
    return True


# --- neural path: converted htdemucs weights (scripts/convert_htdemucs.py) --

_HT_SENTINEL = object()
_ht_cache = _HT_SENTINEL
_ht_cache_path: str | None = None
_ht_lock = threading.Lock()


def htdemucs_checkpoint_path() -> str | None:
    """Configured checkpoint directory: AMW_HTDEMUCS_CKPT env or the
    'htdemucs_checkpoint' runtime setting.  The special value ``bundled``
    resolves to the genuinely-trained tiny checkpoint committed at
    models/checkpoints/htdemucs_tiny (scripts/train_htdemucs_tiny.py) —
    the end-to-end proof artifact for the conversion + neural serving
    path; production deployments point this at converted released
    weights (scripts/convert_htdemucs.py)."""
    import os

    path = os.environ.get("AMW_HTDEMUCS_CKPT")
    if not path:
        try:
            from ..runtime import settings_store

            path = settings_store.get_setting_str(
                "htdemucs_checkpoint", None) or None
        except Exception:  # noqa: BLE001 — models layer must work standalone
            path = None
    if not path:
        return None
    if path == "bundled":
        path = os.path.join(os.path.dirname(__file__), "checkpoints",
                            "htdemucs_tiny")
    return os.path.abspath(os.path.expanduser(path))  # orbax needs absolute


def _htdemucs():
    """(cfg, device_params) when converted weights are configured and load,
    else None (DSP separator remains the fallback).  Keyed by the configured
    path, so pointing 'htdemucs_checkpoint' at (new) weights at runtime
    takes effect on the next request — only successful loads are cached.
    Locked: the warmup thread and the first request would otherwise race
    to load + device_put the same ~170 MB of weights twice."""
    global _ht_cache, _ht_cache_path
    with _ht_lock:
        path = htdemucs_checkpoint_path()
        if _ht_cache is not _HT_SENTINEL and path == _ht_cache_path \
                and _ht_cache is not None:
            return _ht_cache
        result = None
        if path:
            try:
                from . import htdemucs_jax as hj

                cfg, params = hj.load_params(path)
                # One host-side cast to the inference dtype (bf16 mode)
                # before the single device_put — never per request.
                result = (cfg, jax.device_put(hj.inference_params(params)))
            except Exception:  # noqa: BLE001 — fall back to DSP separator
                result = None
        _ht_cache = result
        _ht_cache_path = path
        return result


def warmup_htdemucs(durations_sec) -> int:
    """Precompile the whole-track separation executable for each distinct
    window-count bucket implied by ``durations_sec`` (no-op without a
    configured checkpoint).  Uses the SAME call as
    :func:`separate_htdemucs` below so the warmed executables are exactly
    the ones production jobs hit.  Returns the number of buckets warmed."""
    loaded = _htdemucs()
    if loaded is None:
        return 0
    cfg, params = loaded
    from . import htdemucs_jax as hj

    seen: set = set()
    for dur in durations_sec:
        T = int(cfg.samplerate * float(dur))
        nb_b = hj.oa_plan(cfg, T)[3]
        if nb_b in seen:
            continue
        seen.add(nb_b)
        # Each bucket has TWO executables since the int16 transfer
        # compression: int16-grid uploads (16-bit PCM sources — zeros
        # qualify) and f32 uploads (24-bit/float sources — the sub-LSB
        # fill forces that branch).  Warm both so neither source kind
        # pays a compile at request time.
        hj.separate(params, np.zeros((2, T), np.float32), cfg,
                    stems=("vocals",))
        hj.separate(params, np.full((2, T), 1e-6, np.float32), cfg,
                    stems=("vocals",))
    return len(seen)


_mesh_params_cache: dict = {}


def _mesh_params(params, mesh):
    """One mesh-replicated copy of the weights per mesh (a single-device
    committed dict handed to the shard_map executable would re-broadcast
    ~170 MB on every call)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (id(params), tuple(d.id for d in mesh.devices.flat))
    got = _mesh_params_cache.get(key)
    if got is None:
        got = jax.device_put(params, NamedSharding(mesh, P()))
        _mesh_params_cache.clear()  # one live mesh copy is enough
        _mesh_params_cache[key] = got
    return got


def separate_htdemucs(audio: np.ndarray, sr: int,
                      mesh=None) -> np.ndarray | None:
    """[C, N] -> vocals [C, N] via the TPU htdemucs forward, or None when no
    weights are configured.  Resamples to/from the model rate (44.1 kHz) as
    the reference's demucs CLI does internally.  With ``mesh`` (>1 device)
    the overlap-add window groups shard across the mesh's dp axis
    (htdemucs_jax.separate_mesh)."""
    loaded = _htdemucs()
    if loaded is None:
        return None
    cfg, params = loaded
    from . import htdemucs_jax as hj

    x = np.atleast_2d(np.ascontiguousarray(audio, np.float32))
    if x.shape[0] == 1:
        x = np.repeat(x, 2, axis=0)
    n = x.shape[-1]
    if sr != cfg.samplerate:
        # Model-rate conversion runs HOST-side (scipy/pocketfft handles
        # arbitrary lengths).  Only reduced-rate checkpoints (the tiny
        # 8 kHz one) ever take this branch — released-shape htdemucs runs
        # natively at 44.1 k — and the device Bluestein resample failed
        # remote compile (UNIMPLEMENTED) at exactly this 44.1k->8k length
        # pair (docs/TPU_NOTES.md round-5); the mastering chain's own 48 k
        # export resample stays on device.
        import scipy.signal as sg

        n_model = int(round(n * cfg.samplerate / sr))
        x = np.stack([sg.resample(ch.astype(np.float64), n_model)
                      for ch in x]).astype(np.float32)
    if mesh is not None and mesh.devices.size > 1:
        axis = mesh.axis_names[0]
        vocals = hj.separate_mesh(_mesh_params(params, mesh), x, mesh,
                                  cfg, axis=axis, stems=("vocals",))[0]
    else:
        vocals = hj.separate(params, x, cfg, stems=("vocals",))[0]
    if sr != cfg.samplerate:
        import scipy.signal as sg

        vocals = np.stack(
            [sg.resample(np.asarray(ch, np.float64), n)
             for ch in np.asarray(vocals)]).astype(np.float32)
    if audio.ndim == 2 and audio.shape[0] == 1:
        vocals = vocals.mean(axis=0, keepdims=True)
    return np.clip(vocals, -1.0, 1.0).astype(np.float32)


def isolate_vocal(audio: np.ndarray, sr: int,
                  model: str = "htdemucs", mesh=None) -> np.ndarray:
    """[C, N] -> vocals [C, N].  htdemucs (neural, when converted weights are
    configured) with the DSP center-extractor as fallback — mirrors the
    reference's model choice (services/vocal_isolation.py:23)."""
    if model in ("htdemucs", "auto"):
        vocals = separate_htdemucs(audio, sr, mesh=mesh)
        if vocals is not None:
            return vocals
    params, fn = _jitted(sr, audio.shape[-1], audio.shape[0])
    return np.asarray(fn(np.ascontiguousarray(audio, np.float32), params))


def isolate_vocal_bytes(audio_bytes: bytes, filename: str,
                        model: str = "htdemucs") -> bytes:
    """Bytes-level contract of the reference's ``isolate_vocal``."""
    from ..utils.audio_io import load_audio_from_bytes
    from ..utils import wav

    audio, sr = load_audio_from_bytes(audio_bytes, filename)
    vocals = isolate_vocal(audio, sr, model=model)
    return wav.write_wav_float32(vocals, sr)
