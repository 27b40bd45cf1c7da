"""Hybrid-transformer Demucs (htdemucs) — TPU-native JAX inference.

The reference shells out to PyTorch Demucs ``htdemucs`` for vocal isolation
(reference: services/vocal_isolation.py:13-63).  Here the SAME architecture
(dual waveform/spectrogram U-Net with a cross-domain transformer bottleneck)
runs as a pure functional JAX forward over a parameter dict whose keys are
the upstream torch state-dict names — so upstream pretrained checkpoints
convert weight-for-weight (scripts/convert_htdemucs.py) and the output is
parity-tested sample-for-sample against the torch oracle
(:mod:`amw_tpu.models.htdemucs_torch`, tests/test_htdemucs_parity.py).

Design notes (TPU-first):
- one jitted graph per segment shape; segments batch/vmap cleanly, convs and
  attention land on the MXU;
- parameters are a flat dict of arrays in the torch layouts (OIHW convs,
  [in, out, k] transposed convs, [out, in] linears) — XLA re-lays them out
  internally, so no conversion transposes are needed or wanted;
- STFT/iSTFT replicate torch.stft/istft (center=True, reflect padding,
  ``normalized=True``) plus demucs' extra padding/cropping (_spec/_ispec).
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

SOURCES = ("drums", "bass", "other", "vocals")

# Inference compute dtype.  "bf16" halves the HBM traffic of the U-Net
# activations and weights (the convs/attention already run bf16 MXU passes
# at the default dot precision); norms, softmax, the STFT boundary and the
# final de-normalization stay float32.  Neural separation tolerates the
# ~1e-2 relative activation rounding (gated by
# tests/test_htdemucs_parity.py::test_bf16_mode_close_to_f32).  Default
# "auto": bf16 on TPU backends, f32 elsewhere — gated on hardware by
# scripts/bench_htdemucs_bf16ab.py (v5e: min stem SNR 30.5 dB vs f32,
# released-shape batch-4 forward 102.8x -> 131.6x realtime).  Override
# with AMW_HTDEMUCS_DTYPE={f32,bf16}.
_DTYPE = os.environ.get("AMW_HTDEMUCS_DTYPE", "auto")
if _DTYPE not in ("auto", "f32", "bf16"):
    import warnings

    warnings.warn(f"AMW_HTDEMUCS_DTYPE={_DTYPE!r} is not a valid mode "
                  "(valid: auto | f32 | bf16); falling back to 'auto'")
    _DTYPE = "auto"


def _resolve_dtype() -> str:
    """Late-bound mode: 'auto' picks bf16 iff the default backend is a TPU.
    Resolved (and cached) at first trace, never at import — backend init is
    expensive through the relay and must stay owned by the caller."""
    global _DTYPE
    if _DTYPE == "auto":
        try:
            _DTYPE = ("bf16" if jax.default_backend() in ("tpu", "axon")
                      else "f32")
        except Exception:  # backend not ready: don't cache a failure
            return "f32"
    return _DTYPE


def _act_dtype():
    return jnp.bfloat16 if _resolve_dtype() == "bf16" else jnp.float32


def inference_params(params: dict) -> dict:
    """Cast the float32 leaves to the inference dtype ONCE (keep a single
    device-resident copy) — casting inside the jitted forward would re-read
    the full f32 parameter set from HBM on every call."""
    if _act_dtype() == jnp.float32:
        return params
    return {k: (v.astype(jnp.bfloat16)
                if hasattr(v, "dtype") and v.dtype == jnp.float32 else v)
            for k, v in params.items()}


# --- primitive ops matching torch semantics ---------------------------------


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _glu(x, axis):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def conv1d(x, w, b, stride=1, padding=0, dilation=1):
    """x: [B, C, T]; w: torch [O, I, K]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + b[None, :, None]


def conv2d(x, w, b, stride=(1, 1), padding=(0, 0)):
    """x: [B, C, H, W]; w: torch [O, I, Kh, Kw]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def conv_transpose1d(x, w, b, stride):
    """torch ConvTranspose1d, padding=0.  w: torch [I, O, K] — declared
    'OIH' because transpose_kernel=True swaps the channel axes (the torch
    layout is the forward conv's)."""
    y = jax.lax.conv_transpose(
        x, w, strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), transpose_kernel=True)
    return y + b[None, :, None]


def conv_transpose2d(x, w, b, stride):
    """torch ConvTranspose2d, padding=0.  w: torch [I, O, Kh, Kw] ('OIHW'
    with transpose_kernel=True, see conv_transpose1d)."""
    y = jax.lax.conv_transpose(
        x, w, strides=stride, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)
    return y + b[None, :, None, None]


def group_norm1(x, w, b, eps=1e-5):
    """GroupNorm(num_groups=1) over channel-first [B, C, *spatial].
    Statistics in float32 regardless of the activation dtype (bf16 mean/var
    over ~1e5 elements loses ~2 digits)."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mu = x32.mean(axis=axes, keepdims=True)
    var = x32.var(axis=axes, keepdims=True)
    xn = (x32 - mu) / jnp.sqrt(var + eps)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (xn * w.astype(jnp.float32).reshape(shape)
            + b.astype(jnp.float32).reshape(shape)).astype(dt)


def layer_norm(x, w, b, eps=1e-5):
    """LayerNorm over the last axis (channel-last); f32 statistics."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mu) / jnp.sqrt(var + eps) * w.astype(jnp.float32) \
        + b.astype(jnp.float32)
    return y.astype(dt)


def group_norm_tokens(x, w, b, eps=1e-5):
    """demucs MyGroupNorm(1, C): GroupNorm over channel-first applied to
    channel-last tokens [B, T, C] (normalizes over C AND T jointly); f32
    statistics."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=(1, 2), keepdims=True)
    var = x32.var(axis=(1, 2), keepdims=True)
    y = (x32 - mu) / jnp.sqrt(var + eps) * w.astype(jnp.float32) \
        + b.astype(jnp.float32)
    return y.astype(dt)


def mha(q_in, kv_in, p, prefix, heads):
    """torch nn.MultiheadAttention (batch_first).  q_in: [B, Tq, D]."""
    w = p[prefix + ".in_proj_weight"]      # [3D, D]
    bias = p[prefix + ".in_proj_bias"]     # [3D]
    D = q_in.shape[-1]
    wq, wk, wv = w[:D], w[D:2 * D], w[2 * D:]
    bq, bk, bv = bias[:D], bias[D:2 * D], bias[2 * D:]
    q = q_in @ wq.T + bq
    k = kv_in @ wk.T + bk
    v = kv_in @ wv.T + bv
    B, Tq, _ = q.shape
    Tk = k.shape[1]
    hd = D // heads
    q = q.reshape(B, Tq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Tk, heads, hd).transpose(0, 2, 1, 3)
    scores = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32) / math.sqrt(hd)
    att = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = (att @ v).transpose(0, 2, 1, 3).reshape(B, Tq, D)
    return out @ p[prefix + ".out_proj.weight"].T + p[prefix + ".out_proj.bias"]


# --- STFT / iSTFT (torch.stft/istft + demucs _spec/_ispec) -------------------


def _hann(n):
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(
        np.float32)


def _frame(xp, nfft, hop, frames):
    """Overlapping frames [..., frames, nfft] of xp[..., L].

    When ``hop`` divides ``nfft`` (demucs: nfft/hop = 4) the frame matrix
    is assembled from R = nfft//hop shifted views of the hop-strided
    reshape — pure slicing, no gather (a [frames, nfft] advanced-index
    gather materializes 4x the signal through TPU gather lanes; the
    reshape path is a relayout XLA fuses away)."""
    lead = xp.shape[:-1]
    if nfft % hop == 0:
        R = nfft // hop
        need = (frames + R - 1) * hop
        L = xp.shape[-1]
        if L < need:
            xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(0, need - L)])
        xr = xp[..., :need].reshape(lead + (frames + R - 1, hop))
        return jnp.stack(
            [xr[..., k:k + frames, :] for k in range(R)], axis=-2
        ).reshape(lead + (frames, nfft))
    idx = (np.arange(frames) * hop)[:, None] + np.arange(nfft)[None, :]
    return xp[..., idx]


def torch_stft(x, nfft, hop):
    """torch.stft(center=True, pad_mode='reflect', normalized=True,
    onesided).  x: [..., T] -> (re, im) each [..., F, frames]."""
    pad = nfft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = (xp.shape[-1] - nfft) // hop + 1
    fr = _frame(xp, nfft, hop, frames) * jnp.asarray(_hann(nfft))
    Z = jnp.fft.rfft(fr, axis=-1) * (nfft ** -0.5)
    return (jnp.swapaxes(Z.real, -1, -2).astype(jnp.float32),
            jnp.swapaxes(Z.imag, -1, -2).astype(jnp.float32))


def torch_istft(re, im, nfft, hop, length):
    """torch.istft(center=True, normalized=True, length=length).
    re/im: [..., F, frames] -> [..., length]."""
    Z = jax.lax.complex(jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2))
    fr = jnp.fft.irfft(Z, n=nfft, axis=-1) * (nfft ** 0.5)
    win = jnp.asarray(_hann(nfft))
    fr = fr * win
    frames = fr.shape[-2]
    total = (frames - 1) * hop + nfft
    lead = fr.shape[:-2]
    if nfft % hop == 0:
        # Overlap-add as R = nfft//hop shifted adds over the hop-strided
        # reshape — no scatter.  The scatter-add path (duplicate indices)
        # serializes on TPU and dominated the forward (ispec ~153 ms of a
        # 231 ms batch-4 step on v5e before this rewrite).
        R = nfft // hop
        frv = fr.reshape(lead + (frames, R, hop))
        acc = jnp.zeros(lead + (frames + R - 1, hop), fr.dtype)
        for k in range(R):
            acc = acc.at[..., k:k + frames, :].add(frv[..., :, k, :])
        out = acc.reshape(lead + ((frames + R - 1) * hop,))
    else:
        idx = (np.arange(frames) * hop)[:, None] + np.arange(nfft)[None, :]
        out = jnp.zeros(lead + (total,), fr.dtype)
        out = out.at[..., idx.reshape(-1)].add(fr.reshape(lead + (-1,)))
    norm = np.zeros(total, np.float64)
    w2 = (_hann(nfft).astype(np.float64)) ** 2
    for f in range(frames):
        norm[f * hop:f * hop + nfft] += w2
    out = out / jnp.asarray(np.where(norm > 1e-11, norm, 1.0), fr.dtype)
    pad = nfft // 2
    return out[..., pad:pad + length]


def _spec(x, nfft, hop):
    """demucs HDemucs._spec: extra reflect pad + frame crop; drops Nyquist."""
    le = int(math.ceil(x.shape[-1] / hop))
    pad = hop // 2 * 3
    extra = pad + le * hop - x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, extra)], mode="reflect")
    re, im = torch_stft(xp, nfft, hop)
    return re[..., :-1, 2:2 + le], im[..., :-1, 2:2 + le]


def _ispec(re, im, hop, length):
    """demucs HDemucs._ispec (restores Nyquist row + 2 frames)."""
    zpad = [(0, 0)] * (re.ndim - 2) + [(0, 1), (2, 2)]
    re = jnp.pad(re, zpad)
    im = jnp.pad(im, zpad)
    nfft = 2 * (re.shape[-2] - 1)
    pad = hop // 2 * 3
    le = hop * int(math.ceil(length / hop)) + 2 * pad
    x = torch_istft(re, im, nfft, hop, le)
    return x[..., pad:pad + length]


# --- model blocks ------------------------------------------------------------


def _dconv(x, p, prefix, depth):
    """DConv residual branch on [B, C, T]."""
    for d in range(depth):
        dilation = 2 ** d
        pre = f"{prefix}.layers.{d}"
        y = conv1d(x, p[f"{pre}.0.weight"], p[f"{pre}.0.bias"],
                   dilation=dilation, padding=dilation)
        y = group_norm1(y, p[f"{pre}.1.weight"], p[f"{pre}.1.bias"])
        y = _gelu(y)
        y = conv1d(y, p[f"{pre}.3.weight"], p[f"{pre}.3.bias"])
        y = group_norm1(y, p[f"{pre}.4.weight"], p[f"{pre}.4.bias"])
        y = _glu(y, axis=1)
        y = y * p[f"{pre}.6.scale"][None, :, None]
        x = x + y
    return x


def _henc(x, p, prefix, freq, dconv_depth, kernel=8, stride=4):
    pad = kernel // 4
    if freq:
        y = conv2d(x, p[prefix + ".conv.weight"], p[prefix + ".conv.bias"],
                   stride=(stride, 1), padding=(pad, 0))
        y = _gelu(y)
        B, C, Fr, T = y.shape
        y2 = y.transpose(0, 2, 1, 3).reshape(B * Fr, C, T)
        y2 = _dconv(y2, p, prefix + ".dconv", dconv_depth)
        y = y2.reshape(B, Fr, C, T).transpose(0, 2, 1, 3)
        y = conv2d(y, p[prefix + ".rewrite.weight"],
                   p[prefix + ".rewrite.bias"])
        return _glu(y, axis=1)
    le = x.shape[-1]
    if le % stride != 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, stride - le % stride)])
    y = conv1d(x, p[prefix + ".conv.weight"], p[prefix + ".conv.bias"],
               stride=stride, padding=pad)
    y = _gelu(y)
    y = _dconv(y, p, prefix + ".dconv", dconv_depth)
    y = conv1d(y, p[prefix + ".rewrite.weight"], p[prefix + ".rewrite.bias"])
    return _glu(y, axis=1)


def _hdec(x, skip, p, prefix, freq, last, length, kernel=8, stride=4):
    pad = kernel // 4
    x = x + skip
    if freq:
        y = conv2d(x, p[prefix + ".rewrite.weight"],
                   p[prefix + ".rewrite.bias"], padding=(1, 1))
        y = _glu(y, axis=1)
        z = conv_transpose2d(y, p[prefix + ".conv_tr.weight"],
                             p[prefix + ".conv_tr.bias"], (stride, 1))
        z = z[..., pad:-pad, :]
    else:
        y = conv1d(x, p[prefix + ".rewrite.weight"],
                   p[prefix + ".rewrite.bias"], padding=1)
        y = _glu(y, axis=1)
        z = conv_transpose1d(y, p[prefix + ".conv_tr.weight"],
                             p[prefix + ".conv_tr.bias"], stride)
        z = z[..., pad:pad + length]
    if not last:
        z = _gelu(z)
    return z


def _sin_embedding_1d(length, dim, max_period=10000.0):
    pos = np.arange(length)[:, None].astype(np.float64)
    adim = np.arange(dim // 2)[None, :].astype(np.float64)
    phase = pos / (max_period ** (adim / (dim // 2 - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)],
                          axis=-1).astype(np.float32)  # [T, C]


def _sin_embedding_2d(d_model, height, width, max_period=10000.0):
    pe = np.zeros((d_model, height, width), np.float64)
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2)
                      * -(math.log(max_period) / half))
    pos_w = np.arange(0.0, width)[:, None]
    pos_h = np.arange(0.0, height)[:, None]
    sw = np.sin(pos_w * div_term).T[:, None, :]       # [half/2, 1, W]
    cw = np.cos(pos_w * div_term).T[:, None, :]
    sh = np.sin(pos_h * div_term).T[:, :, None]       # [half/2, H, 1]
    ch = np.cos(pos_h * div_term).T[:, :, None]
    pe[0:half:2] = np.repeat(sw, height, axis=1)
    pe[1:half:2] = np.repeat(cw, height, axis=1)
    pe[half::2] = np.repeat(sh, width, axis=2)
    pe[half + 1::2] = np.repeat(ch, width, axis=2)
    return pe.astype(np.float32)  # [C, H, W]


def _t_layer(x, p, prefix, heads, cross_kv=None):
    """One transformer layer (self when cross_kv is None, else cross)."""
    if cross_kv is None:
        h = layer_norm(x, p[prefix + ".norm1.weight"],
                       p[prefix + ".norm1.bias"])
        h = mha(h, h, p, prefix + ".self_attn", heads)
        x = x + h * p[prefix + ".gamma_1.scale"]
        h = layer_norm(x, p[prefix + ".norm2.weight"],
                       p[prefix + ".norm2.bias"])
    else:
        q = layer_norm(x, p[prefix + ".norm1.weight"],
                       p[prefix + ".norm1.bias"])
        kv = layer_norm(cross_kv, p[prefix + ".norm2.weight"],
                        p[prefix + ".norm2.bias"])
        h = mha(q, kv, p, prefix + ".cross_attn", heads)
        x = x + h * p[prefix + ".gamma_1.scale"]
        h = layer_norm(x, p[prefix + ".norm3.weight"],
                       p[prefix + ".norm3.bias"])
    h = h @ p[prefix + ".linear1.weight"].T + p[prefix + ".linear1.bias"]
    h = _gelu(h)
    h = h @ p[prefix + ".linear2.weight"].T + p[prefix + ".linear2.bias"]
    x = x + h * p[prefix + ".gamma_2.scale"]
    return group_norm_tokens(x, p[prefix + ".norm_out.weight"],
                             p[prefix + ".norm_out.bias"])


# --- config + forward --------------------------------------------------------


class HTConfig:
    """Architecture hyperparameters of the released ``htdemucs`` model
    (shared spec for the JAX forward and the torch oracle)."""

    def __init__(self, sources=SOURCES, audio_channels=2, channels=48,
                 growth=2, depth=4, nfft=4096, bottom_channels=512,
                 t_layers=5, t_heads=8, t_hidden_scale=4.0,
                 dconv_depth=2, dconv_comp=8, dconv_init=1e-3,
                 freq_emb_scale=0.2, emb_scale=10.0, emb_smooth=True,
                 segment=7.8, samplerate=44100):
        self.sources = tuple(sources)
        self.audio_channels = audio_channels
        self.channels = channels
        self.growth = growth
        self.depth = depth
        self.nfft = nfft
        self.hop = nfft // 4
        self.bottom_channels = bottom_channels
        self.t_layers = t_layers
        self.t_heads = t_heads
        self.t_hidden_scale = t_hidden_scale
        self.dconv_depth = dconv_depth
        self.dconv_comp = dconv_comp
        self.dconv_init = dconv_init
        self.freq_emb_scale = freq_emb_scale
        self.emb_scale = emb_scale
        self.emb_smooth = emb_smooth
        self.segment = segment
        self.samplerate = samplerate

    @property
    def segment_samples(self):
        return int(self.segment * self.samplerate)


def tiny_config(**kw):
    """Small config for parity tests (same topology, ~1000x fewer FLOPs)."""
    base = dict(channels=8, nfft=1024, bottom_channels=24, t_layers=3,
                t_heads=2, depth=4, segment=1.0, samplerate=8000)
    base.update(kw)
    return HTConfig(**base)


def forward(params, mix, cfg: HTConfig):
    """[B, C, T] mix -> [B, S, C, T] stems.  Pure function of (params, mix);
    jit it (and vmap/shard the batch axis) at the call site."""
    p = params
    S = len(cfg.sources)
    B, C, length = mix.shape
    nfft, hop = cfg.nfft, cfg.hop

    re, im = _spec(mix, nfft, hop)                      # [B, C, F, T]
    Fq, T = re.shape[-2], re.shape[-1]
    x = jnp.stack([re, im], axis=2).reshape(B, 2 * C, Fq, T)  # CaC
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    std = x.std(axis=(1, 2, 3), keepdims=True, ddof=1)
    x = (x - mean) / (1e-5 + std)

    xt = mix
    meant = xt.mean(axis=(1, 2), keepdims=True)
    stdt = xt.std(axis=(1, 2), keepdims=True, ddof=1)
    xt = (xt - meant) / (1e-5 + stdt)

    # Normalized inputs enter the U-Net at the inference dtype; the stats
    # above and the de-normalization/iSTFT below stay float32 (promotion at
    # the `* std + mean` step restores f32 automatically).
    act = _act_dtype()
    w0 = p.get("encoder.0.conv.weight")
    if act == jnp.bfloat16 and w0 is not None and w0.dtype != act:
        raise TypeError(
            "htdemucs inference dtype is bf16 (auto on TPU) but the params "
            "are float32 — pass them through inference_params(params) once "
            "before forward(), or set AMW_HTDEMUCS_DTYPE=f32.")
    x = x.astype(act)
    xt = xt.astype(act)

    saved, saved_t, lengths, lengths_t = [], [], [], []
    for idx in range(cfg.depth):
        lengths.append(x.shape[-1])
        lengths_t.append(xt.shape[-1])
        xt = _henc(xt, p, f"tencoder.{idx}", freq=False,
                   dconv_depth=cfg.dconv_depth)
        saved_t.append(xt)
        x = _henc(x, p, f"encoder.{idx}", freq=True,
                  dconv_depth=cfg.dconv_depth)
        if idx == 0:
            emb = (p["freq_emb.embedding.weight"] * cfg.emb_scale).T
            x = x + cfg.freq_emb_scale * emb[None, :, :, None]
        saved.append(x)

    b, c, f, t = x.shape
    x = conv1d(x.reshape(b, c, f * t), p["channel_upsampler.weight"],
               p["channel_upsampler.bias"])
    bc = x.shape[1]
    x = x.reshape(b, bc, f, t)
    xt = conv1d(xt, p["channel_upsampler_t.weight"],
                p["channel_upsampler_t.bias"])

    # cross-domain transformer
    pe2 = _sin_embedding_2d(bc, f, t)                   # [C, F, T]
    xtok = x.transpose(0, 3, 2, 1).reshape(b, t * f, bc)
    pe2 = jnp.asarray(pe2).transpose(2, 1, 0).reshape(1, t * f, bc)
    pe2 = pe2.astype(x.dtype)  # keep bf16 tokens bf16 (f32 would promote)
    xtok = layer_norm(xtok, p["crosstransformer.norm_in.weight"],
                      p["crosstransformer.norm_in.bias"]) + pe2
    t2 = xt.shape[-1]
    pe1 = jnp.asarray(_sin_embedding_1d(t2, bc))[None].astype(x.dtype)
    ttok = xt.transpose(0, 2, 1)
    ttok = layer_norm(ttok, p["crosstransformer.norm_in_t.weight"],
                      p["crosstransformer.norm_in_t.bias"]) + pe1
    for i in range(cfg.t_layers):
        if i % 2 == 0:
            xtok = _t_layer(xtok, p, f"crosstransformer.layers.{i}",
                            cfg.t_heads)
            ttok = _t_layer(ttok, p, f"crosstransformer.layers_t.{i}",
                            cfg.t_heads)
        else:
            old = xtok
            xtok = _t_layer(xtok, p, f"crosstransformer.layers.{i}",
                            cfg.t_heads, cross_kv=ttok)
            ttok = _t_layer(ttok, p, f"crosstransformer.layers_t.{i}",
                            cfg.t_heads, cross_kv=old)
    x = xtok.reshape(b, t, f, bc).transpose(0, 3, 2, 1)
    xt = ttok.transpose(0, 2, 1)

    x = conv1d(x.reshape(b, bc, f * t), p["channel_downsampler.weight"],
               p["channel_downsampler.bias"]).reshape(b, c, f, t)
    xt = conv1d(xt, p["channel_downsampler_t.weight"],
                p["channel_downsampler_t.bias"])

    for idx in range(cfg.depth):
        last = idx == cfg.depth - 1
        x = _hdec(x, saved.pop(-1), p, f"decoder.{idx}", freq=True,
                  last=last, length=lengths.pop(-1))
        xt = _hdec(xt, saved_t.pop(-1), p, f"tdecoder.{idx}", freq=False,
                   last=last, length=lengths_t.pop(-1))

    Fq2, T2 = x.shape[-2], x.shape[-1]
    x = x.reshape(B, S, 2 * C, Fq2, T2)
    x = x * std[:, None] + mean[:, None]
    x = x.reshape(B, S, C, 2, Fq2, T2)
    xf = _ispec(x[:, :, :, 0], x[:, :, :, 1], hop, length)

    xt = xt.reshape(B, S, C, length)
    xt = xt * stdt[:, None] + meant[:, None]
    return xt + xf


# --- weights / inference ------------------------------------------------------


def params_from_torch_state(state) -> dict:
    """torch state dict -> flat numpy dict (layouts preserved; see module
    docstring).  Remaps the oracle's private ``_LayerScale1d`` name and
    ignores buffers that have no inference role."""
    out = {}
    for k, v in state.items():
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                         else v, np.float32)
        out[k] = arr
    return out


_CONFIG_KEY = "__config__"
_CONFIG_FIELDS = ("channels", "nfft", "bottom_channels", "t_layers",
                  "t_heads", "depth", "samplerate")
_CONFIG_FLOAT_FIELDS = ("segment",)  # float64 vec holds ints + floats
# v2 layout appends sources/audio_channels after the floats (older vecs are
# shorter and keep the 4-stem stereo defaults).  6-stem variants get generic
# names beyond the canonical four; stem selection by name still works for
# checkpoints converted with explicit kwargs (see ``config_from_kwargs``).
_CONFIG_V2_FIELDS = ("n_sources", "audio_channels")


def _config_vec(cfg: "HTConfig") -> np.ndarray:
    vals = [getattr(cfg, f) for f in _CONFIG_FIELDS]
    vals += [getattr(cfg, f) for f in _CONFIG_FLOAT_FIELDS]
    vals += [len(cfg.sources), cfg.audio_channels]
    return np.asarray(vals, np.float64)


def _default_source_names(n: int) -> tuple:
    if n <= len(SOURCES):
        return SOURCES[:n]
    return SOURCES + tuple(f"stem{i}" for i in range(len(SOURCES), n))


def _config_from_vec(v) -> "HTConfig":
    v = np.asarray(v)
    vals = dict(zip(_CONFIG_FIELDS, (int(x) for x in v)))
    # Older checkpoints stored fewer fields; keep their defaults.
    base = len(_CONFIG_FIELDS)
    for i, f in enumerate(_CONFIG_FLOAT_FIELDS):
        if base + i < v.shape[0]:
            vals[f] = float(v[base + i])
    base += len(_CONFIG_FLOAT_FIELDS)
    if base + 1 < v.shape[0]:
        vals["sources"] = _default_source_names(int(v[base]))
        vals["audio_channels"] = int(v[base + 1])
    return HTConfig(**vals)


def config_from_kwargs(kwargs: dict) -> "HTConfig":
    """HTConfig from the demucs package format's embedded model ``kwargs``
    ({'klass','args','kwargs','state'}) so converting a non-default variant
    (e.g. 6-stem ``htdemucs_6s``) stamps the checkpoint with its true shape
    instead of the released 4-stem default."""
    accepted = {
        "sources", "audio_channels", "channels", "growth", "depth", "nfft",
        "bottom_channels", "t_layers", "t_heads", "t_hidden_scale",
        "dconv_depth", "dconv_comp", "dconv_init", "freq_emb_scale",
        "emb_scale", "emb_smooth", "segment", "samplerate",
    }
    # demucs names a few fields differently from our constructor.
    renames = {"t_hidden": "t_hidden_scale", "freq_emb": "freq_emb_scale",
               "emb_smooth": "emb_smooth"}
    kw = {}
    for k, val in dict(kwargs or {}).items():
        k = renames.get(k, k)
        if k in accepted and val is not None:
            kw[k] = tuple(val) if k == "sources" else val
    return HTConfig(**kw)


def check_params_shape(params: dict, cfg: "HTConfig") -> None:
    """Assert the tensors match the config's input/output shapes (catches a
    checkpoint stamped with the wrong variant at convert time, before it
    fails later inside ``forward`` with an opaque reshape error)."""
    w = params.get("encoder.0.conv.weight")
    if w is not None:
        # Frequency-branch entry conv consumes CaC input: 2*audio_channels.
        want_in, want_out = 2 * cfg.audio_channels, cfg.channels
        got_out, got_in = int(w.shape[0]), int(w.shape[1])
        if (got_in, got_out) != (want_in, want_out):
            raise ValueError(
                f"encoder.0.conv.weight is [{got_out}, {got_in}, ...] but the "
                f"config implies [{want_out}, {want_in}, ...] "
                f"(audio_channels={cfg.audio_channels}, channels={cfg.channels})")
    w = params.get(f"decoder.{cfg.depth - 1}.conv_tr.weight")
    if w is not None:
        want_out = len(cfg.sources) * cfg.audio_channels * 2  # CaC stems
        if int(w.shape[1]) != want_out:
            raise ValueError(
                f"final decoder emits {int(w.shape[1])} channels but the "
                f"config implies {want_out} "
                f"({len(cfg.sources)} sources x {cfg.audio_channels} ch x CaC)")


def load_params(path: str):
    """Restore converted weights from an orbax checkpoint directory.
    Returns ``(cfg, params)`` — the architecture config is embedded in the
    checkpoint (``__config__``), defaulting to the released htdemucs shape."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    params = dict(ckpt.restore(path))
    cfg = HTConfig()
    if _CONFIG_KEY in params:
        cfg = _config_from_vec(params.pop(_CONFIG_KEY))
    return cfg, params


def save_params(params: dict, path: str, cfg: "HTConfig | None" = None):
    import orbax.checkpoint as ocp

    blob = {k: np.asarray(v) for k, v in params.items()}
    blob[_CONFIG_KEY] = _config_vec(cfg or HTConfig())
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, blob)
    ckpt.wait_until_finished()


_JIT_CACHE: dict = {}


def _cfg_key(cfg: HTConfig):
    return (cfg.channels, cfg.nfft, cfg.bottom_channels, cfg.t_layers,
            cfg.t_heads, cfg.depth, cfg.samplerate, cfg.sources,
            cfg.audio_channels, cfg.growth, cfg.t_hidden_scale,
            cfg.dconv_depth, cfg.dconv_comp, cfg.dconv_init,
            cfg.freq_emb_scale, cfg.emb_scale, cfg.emb_smooth,
            _resolve_dtype())  # tests flip the dtype; keep executables apart


def _jitted_forward(cfg: HTConfig):
    """One jitted forward per architecture config — a fresh ``jax.jit``
    closure per call would recompile on EVERY request (~47 s for the
    released shape at batch 4 on the relay)."""
    key = _cfg_key(cfg)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda pp, xx: forward(pp, xx, cfg))
        _JIT_CACHE[key] = fn
    return fn


def oa_plan(cfg: HTConfig, T: int, segment: int | None = None,
            overlap: float = 0.25, batch: int = 4):
    """Overlap-add geometry for a T-sample track: (seg, stride, starts,
    nb_b, t_ext, span).  ``nb_b`` is the power-of-two window-count bucket
    the whole-track scan executable keys on — shared by :func:`separate`
    and warmup so both agree on which executable a track will use."""
    seg = segment or cfg.segment_samples
    stride = max(1, int(seg * (1 - overlap)))
    starts = list(range(0, max(T - seg, 0) + stride, stride))
    nb = (len(starts) + batch - 1) // batch
    nb_b = 1 << max(nb - 1, 0).bit_length()
    span = (batch - 1) * stride + seg
    t_ext = (nb_b - 1) * batch * stride + span
    return seg, stride, starts, nb_b, t_ext, span


_SCAN_CACHE: dict = {}


def _group_contrib(pp, mix_win, valid, idx, w, cfg, batch, stride, seg,
                   n_sel):
    """One window group: [C, span] mix slab -> (weighted stem contribution
    [n_sel, C, span], weight sum [span]).  ``valid`` [batch] zeroes padded
    windows.  Shared by the whole-track scan, the streaming path, and the
    mesh path so all three run the identical math."""
    if mix_win.dtype == jnp.int16:  # lossless transfer compression
        mix_win = mix_win.astype(jnp.float32) / 32768.0
    C = mix_win.shape[0]
    chunk = jnp.stack([
        jax.lax.slice_in_dim(mix_win, j * stride, j * stride + seg, axis=1)
        for j in range(batch)])                 # [B, C, seg]
    st = forward(pp, chunk, cfg)                # [B, S, C, seg]
    st = jnp.take(st, idx, axis=1)              # [B, n_sel, C, seg]
    wv = w[None, :] * valid[:, None]            # [B, seg]
    span = (batch - 1) * stride + seg
    contrib = jnp.zeros((n_sel, C, span), jnp.float32)
    wc = jnp.zeros((span,), jnp.float32)
    for j in range(batch):                      # static offsets
        contrib = contrib.at[:, :, j * stride:j * stride + seg].add(
            st[j] * wv[j])
        wc = wc.at[j * stride:j * stride + seg].add(wv[j])
    return contrib, wc


def _jitted_oa_scan(cfg: HTConfig, seg: int, stride: int, batch: int,
                    n_sel: int, nb: int, t_ext: int):
    """Whole-track device-resident overlap-add as ONE executable: a
    ``lax.scan`` over the ``nb`` windows with the gather / forward /
    triangle-weighted window OA / scatter-add fused in.  One host dispatch
    per track instead of ~3·nb — on relay-attached TPUs every dispatch
    pays a host↔device round trip (~30 ms), which dominated the
    isolate→master e2e time.  Executables key on (nb, t_ext); the caller
    buckets nb to a power of two (padding windows carry valid=0) so the
    executable count stays bounded."""
    key = _cfg_key(cfg) + (seg, stride, batch, n_sel, nb, t_ext)
    fn = _SCAN_CACHE.get(key)
    if fn is None:
        span = (batch - 1) * stride + seg

        def run(pp, mix_pad, valids, idx, w):
            if mix_pad.dtype == jnp.int16:  # lossless transfer compression
                mix_pad = mix_pad.astype(jnp.float32) / 32768.0
            C = mix_pad.shape[0]

            def body(carry, iv):
                i, valid = iv
                w0 = i * (batch * stride)

                def do(carry):
                    out_acc, w_acc = carry
                    mix_win = jax.lax.dynamic_slice(mix_pad, (0, w0),
                                                    (C, span))
                    contrib, wc = _group_contrib(
                        pp, mix_win, valid, idx, w, cfg, batch, stride,
                        seg, n_sel)
                    cur = jax.lax.dynamic_slice(out_acc, (0, 0, w0),
                                                (n_sel, C, span))
                    out_acc = jax.lax.dynamic_update_slice(
                        out_acc, cur + contrib, (0, 0, w0))
                    curw = jax.lax.dynamic_slice(w_acc, (w0,), (span,))
                    w_acc = jax.lax.dynamic_update_slice(w_acc, curw + wc,
                                                         (w0,))
                    return out_acc, w_acc

                # Power-of-two bucketing pads with all-invalid windows;
                # skip their forwards entirely (identical carry shapes on
                # both branches, so the cond is free).
                return jax.lax.cond(jnp.any(valid > 0), do,
                                    lambda carry: carry, carry), None

            init = (jnp.zeros((n_sel, C, t_ext), jnp.float32),
                    jnp.zeros((t_ext,), jnp.float32))
            (out_acc, w_acc), _ = jax.lax.scan(
                body, init,
                (jnp.arange(nb, dtype=jnp.int32), valids))
            return out_acc / jnp.maximum(w_acc, 1e-8)

        fn = jax.jit(run)
        _SCAN_CACHE[key] = fn
    return fn


def _jitted_group(cfg: HTConfig, seg: int, stride: int, batch: int,
                  n_sel: int, dtype):
    """Per-window-group executable for the streaming path: [C, span] slab ->
    (contribution, weights).  Keys only on the group geometry — ONE compile
    serves every track length (the whole-track scan compiles per window-
    count bucket)."""
    key = ("grp",) + _cfg_key(cfg) + (seg, stride, batch, n_sel,
                                      np.dtype(dtype).name)
    fn = _SCAN_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda pp, mix_win, valid, idx, w: _group_contrib(
            pp, mix_win, valid, idx, w, cfg, batch, stride, seg, n_sel))
        _SCAN_CACHE[key] = fn
    return fn


def _jitted_stream_combine(cfg: HTConfig, nb: int, span: int, adv: int,
                           n_sel: int, C: int):
    """Streaming-path epilogue: scatter-add ``nb`` stacked group
    contributions (each advanced by ``adv`` samples) into the full track and
    normalize.  Cheap graph — no model weights — so its per-length compile
    is negligible next to the forward's."""
    key = ("comb", nb, span, adv, n_sel, C)
    fn = _SCAN_CACHE.get(key)
    if fn is None:
        t_ext = (nb - 1) * adv + span

        def run(contribs, wcs):
            out = jnp.zeros((n_sel, C, t_ext), jnp.float32)
            w_acc = jnp.zeros((t_ext,), jnp.float32)
            for i in range(nb):  # static offsets — fused adds, no gather
                out = out.at[:, :, i * adv:i * adv + span].add(contribs[i])
                w_acc = w_acc.at[i * adv:i * adv + span].add(wcs[i])
            return out / jnp.maximum(w_acc, 1e-8)

        fn = jax.jit(run)
        _SCAN_CACHE[key] = fn
    return fn


def _pack_mix(mix: np.ndarray, t_ext: int) -> np.ndarray:
    """Host-side transfer packing: most uploads decode from 16-bit PCM,
    whose float samples are exactly i/32768.  When that round-trips
    losslessly, ship int16 over the host→device link (half the bytes — the
    mix upload dominates isolate-vocal time on relay-attached TPUs,
    docs/TPU_NOTES.md) and dequantize in-graph; anything else (24-bit,
    float sources) keeps the f32 path.  Bit-exact by construction, so both
    paths produce identical stems."""
    mixf = np.ascontiguousarray(mix, dtype=np.float32)
    T = mixf.shape[-1]
    xi = np.round(mixf * 32768.0)
    if (np.abs(xi).max(initial=0.0) <= 32767.0
            and np.array_equal(xi.astype(np.float32) / np.float32(32768.0),
                               mixf)):
        return np.pad(xi.astype(np.int16), ((0, 0), (0, t_ext - T)))
    return np.pad(mixf, ((0, 0), (0, t_ext - T)))


def separate(params, mix: np.ndarray, cfg: HTConfig | None = None,
             segment: int | None = None, overlap: float = 0.25,
             batch: int = 4, stems: tuple | None = None,
             host_oa: bool = False, device_out: bool = False,
             stream: bool | None = None):
    """[C, T] -> stems [S, C, T]: overlapping fixed-size segments through one
    jitted forward, triangular cross-fade weighting (the shape demucs'
    apply_model uses with transition_power=1).

    Segments run ``batch`` at a time through one vmapped graph — on TPU the
    model is launch/HBM-bound at batch 1 (126 ms/segment on v5e), so
    batching segments raises track throughput ~linearly up to memory.

    ``stems``: subset of source names to return (e.g. ``("vocals",)``) —
    the others are dropped ON DEVICE before the host fetch, which matters
    on relay-attached TPUs where device→host bandwidth dominates.  Pass
    device-resident ``params`` (``jax.device_put`` once, reuse) to avoid
    re-uploading ~170 MB of weights per call.

    Default path is fully device-resident AND single-dispatch: the mix is
    uploaded once and the whole segment loop (gather / forward /
    triangle-weighted overlap-add) runs as one ``lax.scan`` executable
    (:func:`_jitted_oa_scan`), so a track costs one host→device dispatch
    regardless of length — per-batch chunk uploads, stem fetches, and the
    ~3·nb per-window dispatch round trips over the relay all disappear.
    ``host_oa=True`` restores the host-side
    accumulation loop (reference semantics oracle; parity-tested against
    the device path).  ``device_out=True`` (device path only) skips the
    final fetch and returns the stems as a device array so a downstream
    jitted graph (e.g. isolate→master) can consume them without a host
    round trip.

    ``stream=True`` switches to the double-buffered streaming path: the mix
    uploads per window group (span-sized slabs, ~8 % halo overhead) with
    each group's forward enqueued right behind its slab, so the relay can
    overlap the next slab's host→device transfer with the current group's
    compute.  Side benefit: the group executable keys only on the group
    geometry, so ONE compile serves every track length (the whole-track
    scan compiles per window-count bucket).  Default (None) resolves from
    ``AMW_HTDEMUCS_STREAM`` (unset → scan path)."""
    cfg = cfg or HTConfig()
    C, T = mix.shape
    seg, stride, starts, nb_b, t_ext, span = oa_plan(
        cfg, T, segment=segment, overlap=overlap, batch=batch)
    src_idx = (list(range(len(cfg.sources))) if stems is None
               else [cfg.sources.index(s) for s in stems])
    w = np.concatenate([np.arange(1, seg // 2 + 1),
                        np.arange(seg - seg // 2, 0, -1)]).astype(np.float32)
    w = w / w.max()
    dev_params = jax.device_put(params)
    idx_dev = jnp.asarray(np.asarray(src_idx, np.int32))
    if host_oa:
        apply = _jitted_forward(cfg)
        out = np.zeros((len(src_idx), C, T), np.float32)
        weight_acc = np.zeros(T, np.float32)
        # Fixed batch size => one compiled graph; the tail batch is padded
        # with zero chunks (outputs dropped on device before the fetch).
        for i in range(0, len(starts), batch):
            group = starts[i:i + batch]
            chunk = np.zeros((batch, C, seg), np.float32)
            for j, start in enumerate(group):
                end = min(start + seg, T)
                chunk[j, :, :end - start] = mix[:, start:end]
            stems_dev = apply(dev_params, chunk)
            stems_b = np.asarray(stems_dev[: len(group), idx_dev])
            for j, start in enumerate(group):
                end = min(start + seg, T)
                out[:, :, start:end] += stems_b[j][:, :, :end - start] \
                    * w[:end - start]
                weight_acc[start:end] += w[:end - start]
        return out / np.maximum(weight_acc, 1e-8)
    nb = (len(starts) + batch - 1) // batch
    n_seg = len(starts)
    w_dev = jnp.asarray(w)
    if stream is None:
        stream = os.environ.get("AMW_HTDEMUCS_STREAM", "0") == "1"
    if stream:
        # Streaming path: per-group slab uploads interleaved with per-group
        # forwards (all enqueued asynchronously), then one combine dispatch.
        adv = batch * stride
        t_ext_s = (nb - 1) * adv + span
        mix_host = _pack_mix(mix, t_ext_s)
        grp = _jitted_group(cfg, seg, stride, batch, len(src_idx),
                            mix_host.dtype)
        contribs, wcs = [], []
        for i in range(nb):
            valid_i = np.zeros(batch, np.float32)
            valid_i[: min(batch, n_seg - i * batch)] = 1.0
            slab = jax.device_put(
                np.ascontiguousarray(mix_host[:, i * adv:i * adv + span]))
            ci, wi = grp(dev_params, slab, jnp.asarray(valid_i), idx_dev,
                         w_dev)
            contribs.append(ci)
            wcs.append(wi)
        comb = _jitted_stream_combine(cfg, nb, span, adv, len(src_idx), C)
        out = comb(jnp.stack(contribs), jnp.stack(wcs))[:, :, :T]
        return out if device_out else np.asarray(out)
    # nb_b (from oa_plan) buckets the window count to a power of two so
    # the fused whole-track executable count stays bounded; padding
    # windows carry valid=0 and contribute nothing.
    mix_dev = jax.device_put(_pack_mix(mix, t_ext))
    valids = np.zeros((nb_b, batch), np.float32)
    for i in range(nb):
        valids[i, : min(batch, n_seg - i * batch)] = 1.0
    run = _jitted_oa_scan(cfg, seg, stride, batch, len(src_idx), nb_b, t_ext)
    out = run(dev_params, mix_dev, jnp.asarray(valids), idx_dev,
              w_dev)[:, :, :T]
    return out if device_out else np.asarray(out)


def separate_mesh(params, mix: np.ndarray, mesh, cfg: HTConfig | None = None,
                  axis: str = "dp", segment: int | None = None,
                  overlap: float = 0.25, batch: int = 4,
                  stems: tuple | None = None, device_out: bool = False):
    """Mesh-sharded separation: the overlap-add window groups are
    embarrassingly parallel, so they shard across the ``axis`` rows of a
    device mesh via ``shard_map`` — each device scans its slice of the
    window-group axis over a replicated mix and the partial stem/weight
    accumulators ``psum`` at the end (the one collective; rides ICI).

    The reference runs Demucs as a single-GPU subprocess
    (services/vocal_isolation.py:13-50); this is the TPU-first equivalent:
    a D-device mesh cuts a track's separation wall-clock ~D× with no
    change in output (bit-identical math to :func:`separate`, which remains
    the single-device path).  Mirrors the mastering engine's dp serving
    (runtime/engine.py)."""
    cfg = cfg or HTConfig()
    C, T = mix.shape
    D = int(mesh.shape[axis])
    seg, stride, starts, nb_b, t_ext, span = oa_plan(
        cfg, T, segment=segment, overlap=overlap, batch=batch)
    # The window-group axis must split evenly over D: round the bucket up
    # to a multiple of D (extra groups are all-invalid -> skipped).
    nb_b2 = ((max(nb_b, D) + D - 1) // D) * D
    t_ext2 = (nb_b2 - 1) * batch * stride + span
    src_idx = (list(range(len(cfg.sources))) if stems is None
               else [cfg.sources.index(s) for s in stems])
    n_sel = len(src_idx)
    w = np.concatenate([np.arange(1, seg // 2 + 1),
                        np.arange(seg - seg // 2, 0, -1)]).astype(np.float32)
    w = w / w.max()
    nb = (len(starts) + batch - 1) // batch
    valids = np.zeros((nb_b2, batch), np.float32)
    for i in range(nb):
        valids[i, : min(batch, len(starts) - i * batch)] = 1.0

    mix_host = _pack_mix(mix, t_ext2)
    key = ("mesh", axis, D, tuple(d.id for d in mesh.devices.flat),
           np.dtype(mix_host.dtype).name) + _cfg_key(cfg) + (
        seg, stride, batch, n_sel, nb_b2, t_ext2)
    run = _SCAN_CACHE.get(key)
    if run is None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        local_nb = nb_b2 // D

        def local_run(pp, mix_pad, steps_l, valids_l, idx, w_d):
            if mix_pad.dtype == jnp.int16:
                mix_pad = mix_pad.astype(jnp.float32) / 32768.0

            def body(carry, iv):
                i, valid = iv          # i: GLOBAL window-group index
                w0 = i * (batch * stride)

                def do(carry):
                    out_acc, w_acc = carry
                    mix_win = jax.lax.dynamic_slice(mix_pad, (0, w0),
                                                    (C, span))
                    contrib, wc = _group_contrib(
                        pp, mix_win, valid, idx, w_d, cfg, batch, stride,
                        seg, n_sel)
                    cur = jax.lax.dynamic_slice(out_acc, (0, 0, w0),
                                                (n_sel, C, span))
                    out_acc = jax.lax.dynamic_update_slice(
                        out_acc, cur + contrib, (0, 0, w0))
                    curw = jax.lax.dynamic_slice(w_acc, (w0,), (span,))
                    w_acc = jax.lax.dynamic_update_slice(
                        w_acc, curw + wc, (w0,))
                    return out_acc, w_acc

                return jax.lax.cond(jnp.any(valid > 0), do,
                                    lambda carry: carry, carry), None

            init = (jnp.zeros((n_sel, C, t_ext2), jnp.float32),
                    jnp.zeros((t_ext2,), jnp.float32))
            (out_acc, w_acc), _ = jax.lax.scan(body, init,
                                               (steps_l, valids_l))
            out_acc = jax.lax.psum(out_acc, axis)
            w_acc = jax.lax.psum(w_acc, axis)
            return out_acc / jnp.maximum(w_acc, 1e-8)

        # Any extra mesh axes (e.g. the 2-D dp×sp serving mesh) stay
        # replicated: the window grid shards over ``axis`` only.
        run = jax.jit(shard_map(
            local_run, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(), P()),
            out_specs=P(),
            check_vma=False))
        assert local_nb * D == nb_b2
        _SCAN_CACHE[key] = run
    steps = np.arange(nb_b2, dtype=np.int32)
    out = run(params, mix_host, steps, valids,
              jnp.asarray(np.asarray(src_idx, np.int32)),
              jnp.asarray(w))[:, :, :T]
    return out if device_out else np.asarray(out)


def init_params(cfg: HTConfig | None = None, seed: int = 0) -> dict:
    """Random-initialized parameter dict via the torch oracle (tests /
    development only — production uses converted upstream weights)."""
    import torch

    from .htdemucs_torch import HTDemucsTorch

    torch.manual_seed(seed)
    model = HTDemucsTorch(cfg or HTConfig())
    return params_from_torch_state(model.state_dict())
