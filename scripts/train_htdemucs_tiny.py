#!/usr/bin/env python
"""Train the tiny htdemucs variant on synthetic stems and commit a REAL
(genuinely-trained, not random) checkpoint for the end-to-end neural
vocal-isolation path.

The reference serves pretrained ``htdemucs`` via the demucs CLI
(services/vocal_isolation.py:13-63).  Its released weights are not
available in this environment (zero egress), so this script produces the
next-best artifact: a small model of the SAME architecture actually
trained (torch, CPU) on a synthetic four-stem corpus until it separates
held-out mixtures far better than the mixture-as-estimate baseline.  The
checkpoint is saved in the demucs package format ({'klass','args',
'kwargs','state'}) and converted with scripts/convert_htdemucs.py — i.e.
the exact pipeline an operator runs on the real released weights.

Usage:
  python scripts/train_htdemucs_tiny.py out.th [steps]
  python scripts/convert_htdemucs.py convert out.th amw_tpu/models/checkpoints/htdemucs_tiny
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def synth_batch(rng, batch, n, sr):
    """Four synthetic stems with distinct, learnable spectral signatures:
    vocals (harmonic stack with vibrato + formant AM, center-panned),
    drums (decaying noise bursts), bass (low sine), other (mid-band pad)."""
    t = np.arange(n) / sr
    stems = np.zeros((batch, 4, 2, n), np.float32)
    for b in range(batch):
        # drums: 4-8 noise hits with exponential decay
        d = np.zeros(n)
        for _ in range(rng.integers(4, 9)):
            p = rng.integers(0, n - 400)
            d[p:p + 400] += (rng.standard_normal(400)
                             * np.exp(-np.arange(400) / 60.0)
                             * rng.uniform(0.3, 0.8))
        stems[b, 0] = np.stack([d, d * rng.uniform(0.8, 1.0)])
        # bass: low sine with slow envelope
        f_b = rng.uniform(40, 120)
        bass = (np.sin(2 * np.pi * f_b * t + rng.uniform(0, 6))
                * rng.uniform(0.2, 0.5)
                * (0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.3, 2) * t)))
        stems[b, 1] = np.stack([bass, bass])
        # other: mid-band 3-note pad
        pad = np.zeros(n)
        for _ in range(3):
            f_o = rng.uniform(250, 900)
            pad += np.sin(2 * np.pi * f_o * t + rng.uniform(0, 6))
        pad *= rng.uniform(0.06, 0.15)
        pan = rng.uniform(0.4, 1.0)
        stems[b, 2] = np.stack([pad * pan, pad * (1.4 - pan)])
        # vocals: f0 with vibrato, 5 harmonics with formant-ish weights,
        # syllabic AM; strongly center-panned
        f0 = rng.uniform(150, 380)
        vib = f0 * 0.01 * np.sin(2 * np.pi * 5.5 * t)
        phase = 2 * np.pi * np.cumsum(f0 + vib) / sr
        v = np.zeros(n)
        for h, w in enumerate((1.0, 0.6, 0.45, 0.3, 0.2), start=1):
            v += w * np.sin(h * phase + rng.uniform(0, 6))
        syll = np.clip(np.sin(2 * np.pi * rng.uniform(2, 4) * t
                              + rng.uniform(0, 6)), 0, 1) ** 0.5
        v *= syll * rng.uniform(0.15, 0.35)
        stems[b, 3] = np.stack([v, v * rng.uniform(0.95, 1.0)])
    return np.clip(stems, -1, 1)


def main():
    import torch

    from amw_tpu.models import htdemucs_jax as hj
    from amw_tpu.models.htdemucs_torch import HTDemucsTorch

    out_path = sys.argv[1] if len(sys.argv) > 1 else "htdemucs_tiny.th"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    cfg = hj.tiny_config()
    sr, n = cfg.samplerate, cfg.segment_samples
    torch.manual_seed(0)
    model = HTDemucsTorch(cfg)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=steps)
    rng = np.random.default_rng(0)

    model.train()
    for step in range(steps):
        stems = synth_batch(rng, 8, n, sr)
        mix = torch.from_numpy(stems.sum(axis=1))
        target = torch.from_numpy(stems)
        pred = model(mix)
        loss = torch.nn.functional.l1_loss(pred, target)
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if step % 25 == 0 or step == steps - 1:
            print(f"step {step:4d}  l1 {loss.item():.5f}", flush=True)

    # Held-out eval: vocals SNR vs the mixture-as-estimate baseline.
    model.eval()
    ev = np.random.default_rng(1234)
    stems = synth_batch(ev, 16, n, sr)
    mix = stems.sum(axis=1)
    with torch.no_grad():
        pred = model(torch.from_numpy(mix)).numpy()
    voc_true, voc_pred = stems[:, 3], pred[:, 3]

    def snr(est):
        return 10 * np.log10(
            np.sum(voc_true ** 2) / max(np.sum((est - voc_true) ** 2), 1e-12))

    s_model, s_base = snr(voc_pred), snr(mix)
    print(f"held-out vocals SNR: model {s_model:.2f} dB vs "
          f"mixture-baseline {s_base:.2f} dB")
    assert s_model > s_base + 3.0, "model failed to learn separation"

    # demucs package format — the same container the released weights use,
    # so scripts/convert_htdemucs.py exercises its real parsing path.
    kwargs = dict(sources=list(cfg.sources), audio_channels=cfg.audio_channels,
                  channels=cfg.channels, nfft=cfg.nfft,
                  bottom_channels=cfg.bottom_channels, t_layers=cfg.t_layers,
                  t_heads=cfg.t_heads, depth=cfg.depth,
                  samplerate=cfg.samplerate, segment=cfg.segment)
    torch.save({"klass": "HTDemucs", "args": (), "kwargs": kwargs,
                "state": model.state_dict(),
                "metrics": {"vocals_snr_db": float(s_model),
                            "baseline_snr_db": float(s_base)}}, out_path)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
