"""Hybrid-transformer source separation model (htdemucs-class) in JAX/flax.

The reference shells out to PyTorch Demucs ``htdemucs`` for vocal isolation
(services/vocal_isolation.py).  This module provides the TPU-native model
family: a dual-branch (waveform + spectrogram) U-Net with a cross-domain
transformer bottleneck, the same architectural shape as hybrid-transformer
Demucs, implemented in flax linen and jitted/shardable like everything else
in this framework.

Weights: ``load_params(path)`` restores an orbax checkpoint.  A converter for
upstream PyTorch checkpoints can populate that checkpoint offline; until
weights are provided, the production vocal-isolation path uses the DSP
separator in :mod:`amw_tpu.models.vocal`, and this model runs with random
initialization (shape-verified in tests).

Sources follow Demucs' convention: (drums, bass, other, vocals).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

SOURCES = ("drums", "bass", "other", "vocals")


@dataclasses.dataclass(frozen=True)
class HTDemucsConfig:
    sources: Sequence[str] = SOURCES
    audio_channels: int = 2
    depth: int = 4
    base_channels: int = 48
    growth: int = 2
    nfft: int = 4096
    hop: int = 1024
    t_layers: int = 5
    t_dim: int = 384
    t_heads: int = 8
    segment_samples: int = 44100 * 6


def _glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


class EncLayer(nn.Module):
    """Conv stride-4 encoder layer with a GLU 1x1 expansion (both branches)."""

    channels: int
    kernel: int = 8
    stride: int = 4

    @nn.compact
    def __call__(self, x):  # x: [B, T', C]
        x = nn.Conv(self.channels, (self.kernel,), strides=(self.stride,),
                    padding="SAME")(x)
        x = nn.gelu(x)
        y = nn.Conv(2 * self.channels, (1,))(x)
        return _glu_res(x, y)


def _glu_res(x, y):
    return x + _glu(y, axis=-1) * 0.5


class DecLayer(nn.Module):
    """Transposed-conv stride-4 decoder layer consuming the skip."""

    channels: int
    kernel: int = 8
    stride: int = 4
    last: bool = False

    @nn.compact
    def __call__(self, x, skip):
        x = x + skip
        y = nn.Conv(2 * x.shape[-1], (3,), padding="SAME")(x)
        x = _glu_res(x, y)
        x = nn.ConvTranspose(self.channels, (self.kernel,),
                             strides=(self.stride,), padding="SAME")(x)
        if not self.last:
            x = nn.gelu(x)
        return x


class CrossTransformer(nn.Module):
    """Cross-domain transformer: joint self-attention over the concatenated
    time-branch and spectral-branch bottleneck tokens."""

    layers: int
    dim: int
    heads: int

    @nn.compact
    def __call__(self, xt, xs):
        # xt: [B, Tt, D], xs: [B, Ts, D]
        def posemb(n, d):
            pos = np.arange(n)[:, None]
            i = np.arange(d // 2)[None, :]
            ang = pos / np.power(10000.0, 2 * i / d)
            emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
            return jnp.asarray(emb, jnp.float32)

        nt, ns = xt.shape[1], xs.shape[1]
        xt = xt + posemb(nt, self.dim)
        xs = xs + posemb(ns, self.dim)
        x = jnp.concatenate([xt, xs], axis=1)
        for _ in range(self.layers):
            h = nn.LayerNorm()(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim)(h, h)
            x = x + h
            h = nn.LayerNorm()(x)
            h = nn.Dense(4 * self.dim)(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim)(h)
            x = x + h
        return x[:, :nt], x[:, nt:]


class HTDemucs(nn.Module):
    cfg: HTDemucsConfig = HTDemucsConfig()

    @nn.compact
    def __call__(self, mix):  # mix: [B, C, T]
        cfg = self.cfg
        B, C, T = mix.shape
        S = len(cfg.sources)

        # --- spectral branch: real+imag as channels over freq frames.
        # Pad T so both branches stay stride-aligned through the U-Net.
        align = int(np.lcm(cfg.hop, 4 ** cfg.depth))
        pad = (-T) % align
        mp = jnp.pad(mix, ((0, 0), (0, 0), (0, pad)))
        frames = mp.shape[-1] // cfg.hop
        Z = jax.vmap(lambda ch: _stft(ch, cfg.nfft, cfg.hop), in_axes=1,
                     out_axes=1)(mp)  # [B, C, F, Frames]
        Z = Z[:, :, : cfg.nfft // 2, :]  # drop Nyquist (Demucs convention)
        spec_in = jnp.concatenate([Z.real, Z.imag], axis=1)  # [B, 2C, F, Fr]
        # fold freq into channels progressively via strided convs over freq:
        xs = jnp.transpose(spec_in, (0, 3, 2, 1))  # [B, Fr, F, 2C]
        Bf = xs.shape[0]
        xs = xs.reshape(B * frames, xs.shape[2], xs.shape[3])  # [B*Fr, F, 2C]
        skips_s = []
        ch = cfg.base_channels
        for d in range(cfg.depth):
            xs = EncLayer(ch)(xs)
            skips_s.append(xs)
            ch *= cfg.growth

        # --- time branch
        xt = jnp.transpose(mp, (0, 2, 1))  # [B, T, C]
        skips_t = []
        ch = cfg.base_channels
        for d in range(cfg.depth):
            xt = EncLayer(ch)(xt)
            skips_t.append(xt)
            ch *= cfg.growth
        bott = ch // cfg.growth

        # --- transformer bottleneck over both token sets
        ts_tokens = xs.reshape(B, frames * xs.shape[1], xs.shape[2])
        xt_tok = nn.Dense(cfg.t_dim)(xt)
        xs_tok = nn.Dense(cfg.t_dim)(ts_tokens)
        xt_tok, xs_tok = CrossTransformer(
            cfg.t_layers, cfg.t_dim, cfg.t_heads)(xt_tok, xs_tok)
        xt = xt + nn.Dense(bott)(xt_tok)
        xs = xs + nn.Dense(bott)(xs_tok).reshape(B * frames, xs.shape[1],
                                                 xs.shape[2])

        # --- decoders (mirror, skip connections), output S stems
        ch = bott
        for d in range(cfg.depth):
            last = d == cfg.depth - 1
            out_ch_t = (S * C) if last else ch // cfg.growth
            xt = DecLayer(out_ch_t, last=last)(xt, skips_t[-1 - d])
            out_ch_s = (S * 2 * C) if last else ch // cfg.growth
            xs = DecLayer(out_ch_s, last=last)(xs, skips_s[-1 - d])
            ch //= cfg.growth

        # time-branch output [B, T, S*C] -> [B, S, C, T]
        wave = jnp.transpose(xt, (0, 2, 1))[..., :T]
        wave = wave.reshape(B, S, C, T)

        # spectral-branch output -> complex masks -> iSTFT
        F_dim = spec_in.shape[2]
        xs = xs[:, :F_dim, :]
        xs = xs.reshape(B, frames, F_dim, S, 2, C)
        re = jnp.transpose(xs[..., 0, :], (0, 3, 4, 2, 1))  # [B,S,C,F,Fr]
        im = jnp.transpose(xs[..., 1, :], (0, 3, 4, 2, 1))
        # restore the dropped Nyquist bin as zero before the iSTFT
        zpad = [(0, 0)] * 3 + [(0, 1), (0, 0)]
        re = jnp.pad(re, zpad)
        im = jnp.pad(im, zpad)
        spec_wave = jax.vmap(jax.vmap(
            lambda r, i: _istft(r + 1j * i, cfg.nfft, cfg.hop, T),
            in_axes=(1, 1), out_axes=1), in_axes=(1, 1), out_axes=1)(re, im)

        return wave + spec_wave  # [B, S, C, T]


def _stft(x, nfft, hop):  # x: [B, T] -> [B, F, frames]
    frames = x.shape[-1] // hop
    pad = nfft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    idx = (np.arange(frames) * hop)[:, None] + np.arange(nfft)[None, :]
    win = jnp.asarray(np.hanning(nfft).astype(np.float32))
    fr = xp[:, idx] * win
    return jnp.swapaxes(jnp.fft.rfft(fr, axis=-1), -1, -2)


def _istft(Z, nfft, hop, T):  # Z: [B, F, frames] -> [B, T]
    fr = jnp.fft.irfft(jnp.swapaxes(Z, -1, -2), n=nfft, axis=-1)
    win = jnp.asarray(np.hanning(nfft).astype(np.float32))
    fr = fr * win
    frames = fr.shape[1]
    total = frames * hop + nfft
    idx = (np.arange(frames) * hop)[:, None] + np.arange(nfft)[None, :]
    out = jnp.zeros(fr.shape[:1] + (total,), fr.dtype)
    out = out.at[:, idx.reshape(-1)].add(fr.reshape(fr.shape[0], -1))
    norm = np.zeros(total)
    np.add.at(norm, idx.reshape(-1), np.tile((np.hanning(nfft) ** 2), frames))
    out = out / jnp.asarray(np.where(norm > 1e-8, norm, 1.0), fr.dtype)
    pad = nfft // 2
    return out[:, pad:pad + T]


# --- weights / inference ---------------------------------------------------


def init_params(cfg: HTDemucsConfig | None = None, seed: int = 0):
    cfg = cfg or HTDemucsConfig()
    model = HTDemucs(cfg)
    x = jnp.zeros((1, cfg.audio_channels, cfg.hop * 16), jnp.float32)
    return model, model.init(jax.random.PRNGKey(seed), x)


def load_params(path: str, cfg: HTDemucsConfig | None = None):
    """Restore converted weights from an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    cfg = cfg or HTDemucsConfig()
    model = HTDemucs(cfg)
    ckpt = ocp.StandardCheckpointer()
    params = ckpt.restore(path)
    return model, params


def separate(model: HTDemucs, params, mix: np.ndarray,
             segment: int | None = None) -> np.ndarray:
    """[C, T] -> stems [S, C, T], processed in overlapping segments."""
    cfg = model.cfg
    seg = segment or cfg.segment_samples
    C, T = mix.shape
    hop = seg // 2
    out = np.zeros((len(cfg.sources), C, T), np.float32)
    weight = np.zeros(T, np.float32)
    apply = jax.jit(lambda p, x: model.apply(p, x))
    win = np.hanning(seg).astype(np.float32) + 1e-3
    for start in range(0, max(T - 1, 1), hop):
        end = min(start + seg, T)
        chunk = np.zeros((1, C, seg), np.float32)
        chunk[0, :, : end - start] = mix[:, start:end]
        stems = np.asarray(apply(params, chunk))[0]
        out[:, :, start:end] += stems[:, :, : end - start] * win[: end - start]
        weight[start:end] += win[: end - start]
        if end == T:
            break
    return out / np.maximum(weight, 1e-6)
