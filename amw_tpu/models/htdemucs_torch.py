"""PyTorch oracle for the hybrid-transformer Demucs (htdemucs) architecture.

The reference isolates vocals by shelling out to the ``demucs`` package's
pretrained ``htdemucs`` model (reference: services/vocal_isolation.py:13-63).
This module reimplements that architecture in plain PyTorch with the SAME
module tree / state-dict key names as upstream ``demucs.htdemucs.HTDemucs``
(encoder.N.conv.*, tencoder.N.dconv.layers.D.*, crosstransformer.layers.N.*,
…), so that:

- upstream pretrained checkpoints load directly into it
  (``load_state_dict``), and
- it serves as the CPU conversion oracle for the TPU inference path in
  :mod:`amw_tpu.models.htdemucs_jax` — the parity test initializes this model
  randomly, exports its state dict, and asserts the JAX forward matches the
  torch forward sample-for-sample.

Only the configuration used by the released ``htdemucs`` weights is
implemented (cac=True, depth=4, no norm in enc/dec [norm_starts=4], dconv in
encoders only [dconv_mode=1], bottom_channels=512, 5 transformer layers with
sin embeddings); exotic options (wiener iters, sparse attention, LSTM/attn
dconv) are intentionally out of scope.

Torch is an optional dependency of the framework (CPU oracle + converter
only) — nothing on the TPU serving path imports this module.
"""

from __future__ import annotations

import math
import torch
import torch.nn as nn
import torch.nn.functional as F

SOURCES = ("drums", "bass", "other", "vocals")


from .htdemucs_jax import HTConfig, tiny_config  # torch-free spec


# --- building blocks (names match demucs.demucs / demucs.hdemucs) ----------


class LayerScale(nn.Module):
    def __init__(self, channels, init=0.0):
        super().__init__()
        self.scale = nn.Parameter(torch.full((channels,), float(init)))

    def forward(self, x):  # channel-last
        return self.scale * x


class DConv(nn.Module):
    """Residual dilated-conv branch (demucs.demucs.DConv, gelu, norm=True,
    no attn/lstm)."""

    def __init__(self, channels, compress=8, depth=2, init=1e-3, kernel=3):
        super().__init__()
        hidden = channels // compress
        self.layers = nn.ModuleList()
        for d in range(depth):
            dilation = 2 ** d
            padding = dilation * (kernel // 2)
            mods = [
                nn.Conv1d(channels, hidden, kernel, dilation=dilation,
                          padding=padding),
                nn.GroupNorm(1, hidden),
                nn.GELU(),
                nn.Conv1d(hidden, 2 * channels, 1),
                nn.GroupNorm(1, 2 * channels),
                nn.GLU(1),
                _LayerScale1d(channels, init),
            ]
            self.layers.append(nn.Sequential(*mods))

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class _LayerScale1d(nn.Module):
    """LayerScale over channel-first [B, C, T] (demucs LayerScale with
    channel_last=False); parameter name matches upstream ('scale')."""

    def __init__(self, channels, init=0.0):
        super().__init__()
        self.scale = nn.Parameter(torch.full((channels,), float(init)))

    def forward(self, x):
        return self.scale[:, None] * x


class HEncLayer(nn.Module):
    """demucs.hdemucs.HEncLayer with norm=False (htdemucs norm_starts=4),
    context=0 (1x1 rewrite), dconv=True."""

    def __init__(self, chin, chout, kernel_size=8, stride=4, freq=True,
                 dconv_kw=None):
        super().__init__()
        self.freq = freq
        self.stride = stride
        self.kernel_size = kernel_size
        pad = kernel_size // 4
        self.pad = pad
        if freq:
            self.conv = nn.Conv2d(chin, chout, (kernel_size, 1), (stride, 1),
                                  (pad, 0))
            self.rewrite = nn.Conv2d(chout, 2 * chout, 1, 1, 0)
        else:
            self.conv = nn.Conv1d(chin, chout, kernel_size, stride, pad)
            self.rewrite = nn.Conv1d(chout, 2 * chout, 1, 1, 0)
        self.dconv = DConv(chout, **(dconv_kw or {}))

    def forward(self, x):
        if not self.freq:
            le = x.shape[-1]
            if le % self.stride != 0:
                x = F.pad(x, (0, self.stride - (le % self.stride)))
        y = self.conv(x)
        y = F.gelu(y)
        if self.freq:
            B, C, Fr, T = y.shape
            y = y.permute(0, 2, 1, 3).reshape(-1, C, T)
            y = self.dconv(y)
            y = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        else:
            y = self.dconv(y)
        z = F.glu(self.rewrite(y), dim=1)
        return z


class HDecLayer(nn.Module):
    """demucs.hdemucs.HDecLayer with norm=False, context=1 (3x3 / k3
    rewrite), dconv=False (htdemucs dconv_mode=1)."""

    def __init__(self, chin, chout, last=False, kernel_size=8, stride=4,
                 freq=True):
        super().__init__()
        self.freq = freq
        self.last = last
        self.stride = stride
        self.chin = chin
        pad = kernel_size // 4
        self.pad = pad
        if freq:
            self.conv_tr = nn.ConvTranspose2d(chin, chout, (kernel_size, 1),
                                              (stride, 1))
            self.rewrite = nn.Conv2d(chin, 2 * chin, 3, 1, 1)
        else:
            self.conv_tr = nn.ConvTranspose1d(chin, chout, kernel_size,
                                              stride)
            self.rewrite = nn.Conv1d(chin, 2 * chin, 3, 1, 1)

    def forward(self, x, skip, length):
        x = x + skip
        y = F.glu(self.rewrite(x), dim=1)
        z = self.conv_tr(y)
        if self.freq:
            z = z[..., self.pad:-self.pad, :]
        else:
            z = z[..., self.pad:self.pad + length]
        if not self.last:
            z = F.gelu(z)
        return z


class ScaledEmbedding(nn.Module):
    """demucs.hdemucs.ScaledEmbedding (smooth cumsum init, /scale storage)."""

    def __init__(self, num_embeddings, embedding_dim, scale=10.0,
                 smooth=True):
        super().__init__()
        self.embedding = nn.Embedding(num_embeddings, embedding_dim)
        if smooth:
            weight = torch.cumsum(self.embedding.weight.data, dim=0)
            weight = weight / torch.arange(
                1, num_embeddings + 1).to(weight).sqrt()[:, None]
            self.embedding.weight.data[:] = weight
        self.embedding.weight.data /= scale
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


# --- transformer (names match demucs.transformer) ---------------------------


def create_sin_embedding(length, dim, max_period=10000.0):
    pos = torch.arange(length).view(-1, 1, 1).float()
    half_dim = dim // 2
    adim = torch.arange(half_dim).view(1, 1, -1).float()
    phase = pos / (max_period ** (adim / (half_dim - 1)))
    return torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)  # [T,1,C]


def create_2d_sin_embedding(d_model, height, width, max_period=10000.0):
    if d_model % 4 != 0:
        raise ValueError("2d sin embedding needs d_model % 4 == 0")
    pe = torch.zeros(d_model, height, width)
    d_model = d_model // 2
    div_term = torch.exp(torch.arange(0.0, d_model, 2)
                         * -(math.log(max_period) / d_model))
    pos_w = torch.arange(0.0, width).unsqueeze(1)
    pos_h = torch.arange(0.0, height).unsqueeze(1)
    pe[0:d_model:2, :, :] = (torch.sin(pos_w * div_term).transpose(0, 1)
                             .unsqueeze(1).repeat(1, height, 1))
    pe[1:d_model:2, :, :] = (torch.cos(pos_w * div_term).transpose(0, 1)
                             .unsqueeze(1).repeat(1, height, 1))
    pe[d_model::2, :, :] = (torch.sin(pos_h * div_term).transpose(0, 1)
                            .unsqueeze(2).repeat(1, 1, width))
    pe[d_model + 1::2, :, :] = (torch.cos(pos_h * div_term).transpose(0, 1)
                                .unsqueeze(2).repeat(1, 1, width))
    return pe[None]


class MyGroupNorm(nn.GroupNorm):
    """GroupNorm applied to channel-last [B, T, C] (demucs MyGroupNorm)."""

    def forward(self, x):
        x = x.transpose(1, 2)
        x = super().forward(x)
        return x.transpose(1, 2)


class MyTransformerEncoderLayer(nn.Module):
    """Pre-norm self-attention layer with LayerScale and a GroupNorm output
    (t_layer_scale=True, t_norm_out=True, gelu)."""

    def __init__(self, d_model, nhead, dim_feedforward, layer_scale_init=1e-4):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, nhead,
                                               batch_first=True)
        self.linear1 = nn.Linear(d_model, dim_feedforward)
        self.linear2 = nn.Linear(dim_feedforward, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.norm_out = MyGroupNorm(1, d_model)
        self.gamma_1 = LayerScale(d_model, layer_scale_init)
        self.gamma_2 = LayerScale(d_model, layer_scale_init)

    def forward(self, x):
        h, _ = self.self_attn(self.norm1(x), self.norm1(x), self.norm1(x),
                              need_weights=False)
        x = x + self.gamma_1(h)
        h = self.linear2(F.gelu(self.linear1(self.norm2(x))))
        x = x + self.gamma_2(h)
        return self.norm_out(x)


class CrossTransformerEncoderLayer(nn.Module):
    """Pre-norm cross-attention layer (q attends to the other domain)."""

    def __init__(self, d_model, nhead, dim_feedforward, layer_scale_init=1e-4):
        super().__init__()
        self.cross_attn = nn.MultiheadAttention(d_model, nhead,
                                                batch_first=True)
        self.linear1 = nn.Linear(d_model, dim_feedforward)
        self.linear2 = nn.Linear(dim_feedforward, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.norm3 = nn.LayerNorm(d_model)
        self.norm_out = MyGroupNorm(1, d_model)
        self.gamma_1 = LayerScale(d_model, layer_scale_init)
        self.gamma_2 = LayerScale(d_model, layer_scale_init)

    def forward(self, q, k):
        h, _ = self.cross_attn(self.norm1(q), self.norm2(k), self.norm2(k),
                               need_weights=False)
        x = q + self.gamma_1(h)
        h = self.linear2(F.gelu(self.linear1(self.norm3(x))))
        x = x + self.gamma_2(h)
        return self.norm_out(x)


class CrossTransformerEncoder(nn.Module):
    """Alternating self/cross layers over the two domains (cross_first=False:
    even layers self, odd layers cross)."""

    def __init__(self, dim, heads, num_layers, hidden_scale=4.0,
                 max_period=10000.0, weight_pos_embed=1.0):
        super().__init__()
        self.num_layers = num_layers
        self.max_period = max_period
        self.weight_pos_embed = weight_pos_embed
        hidden = int(dim * hidden_scale)
        self.norm_in = nn.LayerNorm(dim)
        self.norm_in_t = nn.LayerNorm(dim)
        self.layers = nn.ModuleList()
        self.layers_t = nn.ModuleList()
        for i in range(num_layers):
            if i % 2 == 0:
                self.layers.append(
                    MyTransformerEncoderLayer(dim, heads, hidden))
                self.layers_t.append(
                    MyTransformerEncoderLayer(dim, heads, hidden))
            else:
                self.layers.append(
                    CrossTransformerEncoderLayer(dim, heads, hidden))
                self.layers_t.append(
                    CrossTransformerEncoderLayer(dim, heads, hidden))

    def forward(self, x, xt):
        B, C, Fr, T1 = x.shape
        pos_emb_2d = create_2d_sin_embedding(C, Fr, T1, self.max_period)
        pos_emb_2d = pos_emb_2d.permute(0, 3, 2, 1).reshape(1, T1 * Fr, C)
        x = x.permute(0, 3, 2, 1).reshape(B, T1 * Fr, C)
        x = self.norm_in(x) + self.weight_pos_embed * pos_emb_2d.to(x)

        B, C, T2 = xt.shape
        pos_emb = create_sin_embedding(T2, C, self.max_period)  # [T,1,C]
        xt = xt.permute(0, 2, 1)
        xt = self.norm_in_t(xt) + (
            self.weight_pos_embed * pos_emb.permute(1, 0, 2).to(xt))

        for i in range(self.num_layers):
            if i % 2 == 0:
                x = self.layers[i](x)
                xt = self.layers_t[i](xt)
            else:
                old_x = x
                x = self.layers[i](x, xt)
                xt = self.layers_t[i](xt, old_x)

        x = x.reshape(B, T1, Fr, C).permute(0, 3, 2, 1)
        xt = xt.permute(0, 2, 1)
        return x, xt


# --- spectrogram helpers (demucs.spec + HDemucs._spec/_ispec) ---------------


def spectro(x, nfft, hop):
    *other, length = x.shape
    x = x.reshape(-1, length)
    z = torch.stft(x, nfft, hop, window=torch.hann_window(nfft).to(x),
                   win_length=nfft, normalized=True, center=True,
                   return_complex=True, pad_mode="reflect")
    _, freqs, frames = z.shape
    return z.view(*other, freqs, frames)


def ispectro(z, hop, length):
    *other, freqs, frames = z.shape
    nfft = 2 * freqs - 2
    z = z.view(-1, freqs, frames)
    x = torch.istft(z, nfft, hop, window=torch.hann_window(nfft).to(z.real),
                    win_length=nfft, normalized=True, length=length,
                    center=True)
    return x.view(*other, length)


def _spec(x, nfft, hop):
    le = int(math.ceil(x.shape[-1] / hop))
    pad = hop // 2 * 3
    x = F.pad(x, (pad, pad + le * hop - x.shape[-1]), mode="reflect")
    z = spectro(x, nfft, hop)[..., :-1, :]
    return z[..., 2:2 + le]


def _ispec(z, hop, length):
    z = F.pad(z, (0, 0, 0, 1))       # restore Nyquist row
    z = F.pad(z, (2, 2))             # restore the two cropped frames
    pad = hop // 2 * 3
    le = hop * int(math.ceil(length / hop)) + 2 * pad
    x = ispectro(z, hop, length=le)
    return x[..., pad:pad + length]


# --- the model ---------------------------------------------------------------


class HTDemucsTorch(nn.Module):
    def __init__(self, cfg: HTConfig | None = None):
        super().__init__()
        cfg = cfg or HTConfig()
        self.cfg = cfg
        S = len(cfg.sources)
        C = cfg.audio_channels
        dconv_kw = dict(compress=cfg.dconv_comp, depth=cfg.dconv_depth,
                        init=cfg.dconv_init)

        self.encoder = nn.ModuleList()
        self.tencoder = nn.ModuleList()
        self.decoder = nn.ModuleList()
        self.tdecoder = nn.ModuleList()
        chin, chin_z, chout = C, 2 * C, cfg.channels
        for index in range(cfg.depth):
            self.encoder.append(
                HEncLayer(chin_z, chout, freq=True, dconv_kw=dconv_kw))
            self.tencoder.append(
                HEncLayer(chin, chout, freq=False, dconv_kw=dconv_kw))
            self.decoder.insert(0, HDecLayer(
                chout, chin_z if index else S * 2 * C, last=index == 0,
                freq=True))
            self.tdecoder.insert(0, HDecLayer(
                chout, chin if index else S * C, last=index == 0, freq=False))
            chin, chin_z = chout, chout
            chout *= cfg.growth

        freqs_after_first = (cfg.nfft // 2) // 4
        self.freq_emb = ScaledEmbedding(freqs_after_first, cfg.channels,
                                        scale=cfg.emb_scale,
                                        smooth=cfg.emb_smooth)
        self.freq_emb_scale = cfg.freq_emb_scale

        bottom = chin  # channels at the bottleneck
        bc = cfg.bottom_channels
        self.channel_upsampler = nn.Conv1d(bottom, bc, 1)
        self.channel_downsampler = nn.Conv1d(bc, bottom, 1)
        self.channel_upsampler_t = nn.Conv1d(bottom, bc, 1)
        self.channel_downsampler_t = nn.Conv1d(bc, bottom, 1)
        self.crosstransformer = CrossTransformerEncoder(
            bc, cfg.t_heads, cfg.t_layers, cfg.t_hidden_scale)

    def forward(self, mix):
        cfg = self.cfg
        S = len(cfg.sources)
        B, C, length = mix.shape

        z = _spec(mix, cfg.nfft, cfg.hop)
        x = torch.view_as_real(z).permute(0, 1, 4, 2, 3)
        x = x.reshape(B, C * 2, z.shape[-2], z.shape[-1])  # CaC
        mean = x.mean(dim=(1, 2, 3), keepdim=True)
        std = x.std(dim=(1, 2, 3), keepdim=True)
        x = (x - mean) / (1e-5 + std)

        xt = mix
        meant = xt.mean(dim=(1, 2), keepdim=True)
        stdt = xt.std(dim=(1, 2), keepdim=True)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, encode in enumerate(self.encoder):
            lengths.append(x.shape[-1])
            lengths_t.append(xt.shape[-1])
            xt = self.tencoder[idx](xt)
            saved_t.append(xt)
            x = encode(x)
            if idx == 0:
                frs = torch.arange(x.shape[-2])
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + self.freq_emb_scale * emb
            saved.append(x)

        b, c, f, t = x.shape
        x = self.channel_upsampler(x.reshape(b, c, f * t))
        x = x.reshape(b, -1, f, t)
        xt = self.channel_upsampler_t(xt)
        x, xt = self.crosstransformer(x, xt)
        x = self.channel_downsampler(x.reshape(b, -1, f * t))
        x = x.reshape(b, c, f, t)
        xt = self.channel_downsampler_t(xt)

        for idx, decode in enumerate(self.decoder):
            skip = saved.pop(-1)
            x = decode(x, skip, lengths.pop(-1))
            skip_t = saved_t.pop(-1)
            xt = self.tdecoder[idx](xt, skip_t, lengths_t.pop(-1))

        Fq, T = x.shape[-2], x.shape[-1]
        # Channel layout matches upstream _mask: S x C x (re, im).
        x = x.view(B, S, C * 2, Fq, T)
        x = x * std[:, None] + mean[:, None]
        out = x.view(B, S, C, 2, Fq, T).permute(0, 1, 2, 4, 5, 3)
        zout = torch.view_as_complex(out.contiguous())  # [B,S,C,Fq,T]
        xf = _ispec(zout, cfg.hop, length)

        xt = xt.view(B, S, C, length)
        xt = xt * stdt[:, None] + meant[:, None]
        return xt + xf  # [B, S, C, length]


def load_state(path):
    """Load an upstream demucs checkpoint (.th): either a raw state dict or
    the demucs package format {'klass', 'args', 'kwargs', 'state'}."""
    pkg = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(pkg, dict) and "state" in pkg:
        return pkg["state"]
    return pkg
