#!/usr/bin/env python
"""Generate the landing-page A/B demo clips with the mastering chain itself.

The reference ships pre-rendered demo WAVs (frontend/demos/*.wav — missing
large blobs in this checkout); we synthesize two short deterministic clips
and master them with the real v2 default chain, writing
frontend/demos/{edm,ballad}_{original,mastered}.wav.  Deterministic
(seeded, no dither) → the blobs are reproducible and not committed; the
Docker build and the service's warmup hook regenerate them on demand.
"""

import sys
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np

SR = 44100
DUR = 8.0
SEED = 7


def _edm(g, t, n):
    x = np.zeros(n)
    # four-on-floor kick: 150->45 Hz pitch-sweep thump every 0.5 s
    kick_t = np.arange(int(0.25 * SR)) / SR
    kick = np.sin(2 * np.pi * (45 + 105 * np.exp(-kick_t * 28)) * kick_t)
    kick *= np.exp(-kick_t * 9)
    for p in np.arange(0, DUR - 0.3, 0.5):
        i = int(p * SR)
        x[i:i + len(kick)] += 0.8 * kick
    # offbeat hats
    hat = g.standard_normal(3000) * np.exp(-np.arange(3000) / 280.0)
    hat = np.diff(hat, prepend=0)  # HF-weight
    for p in np.arange(0.25, DUR - 0.2, 0.5):
        i = int(p * SR)
        x[i:i + len(hat)] += 0.25 * hat
    # saw bass (8 harmonics), sidechain-ducked against the kick
    f_b = 55.0
    bass = sum(np.sin(2 * np.pi * f_b * k * t) / k for k in range(1, 9))
    duck = 1.0 - 0.75 * np.exp(-np.mod(t, 0.5) * 14)
    x += 0.28 * bass * duck
    # chord stabs every bar
    for p in np.arange(0.25, DUR - 0.6, 2.0):
        i = int(p * SR)
        st = np.arange(int(0.4 * SR)) / SR
        stab = sum(np.sin(2 * np.pi * f * st) for f in (440, 554, 659))
        x[i:i + len(st)] += 0.14 * stab * np.exp(-st * 6)
    return x


def _ballad(g, t, n):
    x = np.zeros(n)
    # arpeggiated piano-ish plucks
    notes = [220.0, 277.2, 329.6, 440.0, 329.6, 277.2]
    for j, p in enumerate(np.arange(0, DUR - 0.4, 0.4)):
        f = notes[j % len(notes)]
        i = int(p * SR)
        st = np.arange(int(0.9 * SR)) / SR
        pluck = sum(np.sin(2 * np.pi * f * k * st) * (0.6 ** (k - 1))
                    for k in (1, 2, 3))
        seg = 0.18 * pluck * np.exp(-st * 3.2)
        x[i:i + len(st)][:n - i] += seg[:n - i]
    # vocal-like formant melody
    f0 = 230 + 40 * np.sin(2 * np.pi * 0.22 * t)
    phase = 2 * np.pi * np.cumsum(f0 + f0 * 0.012
                                  * np.sin(2 * np.pi * 5.2 * t)) / SR
    v = sum(w * np.sin(k * phase)
            for k, w in ((1, 1.0), (2, 0.55), (3, 0.4), (4, 0.22)))
    syll = np.clip(np.sin(2 * np.pi * 1.6 * t + 1.2), 0, 1) ** 0.6
    x += 0.16 * v * syll
    # soft pad
    x += 0.05 * (np.sin(2 * np.pi * 110 * t) + np.sin(2 * np.pi * 164.8 * t))
    return x


def _stereoize(x, g, depth=0.1):
    d = 14
    right = np.concatenate([np.zeros(d), x[:-d]])
    return np.stack([x * (1 + depth / 2), right * (1 - depth / 2)])


def main():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 — backend may already be fixed
        pass
    from amw_tpu.models.chain import compile_chain
    from amw_tpu.spec import GraphSpec
    from amw_tpu.utils import wav

    g = np.random.default_rng(SEED)
    n = int(DUR * SR)
    t = np.arange(n) / SR
    out_dir = Path(__file__).resolve().parent.parent / "frontend" / "demos"
    out_dir.mkdir(parents=True, exist_ok=True)

    spec = GraphSpec(sr=SR, n=n, channels=2)
    chain = compile_chain(spec, None, target_lufs=-14.0, style="standard")

    for name, synth in (("edm", _edm), ("ballad", _ballad)):
        mono = synth(g, t, n)
        x = _stereoize(mono, g)
        # a deliberately quiet, unmastered render (~-23 LUFS ballpark)
        x = np.clip(x / max(np.abs(x).max(), 1e-9) * 0.35, -1, 1)
        x = (x - x.mean(axis=-1, keepdims=True)).astype(np.float32)
        mastered = np.asarray(chain(x))
        for tag, buf in (("original", x), ("mastered", mastered)):
            q = np.round(np.clip(buf, -1, 1) * 32767.0).astype(np.int16)
            (out_dir / f"{name}_{tag}.wav").write_bytes(
                wav.write_wav_int16(q, SR))
        print(f"wrote {name}: peak orig {np.abs(x).max():.3f} -> "
              f"mastered {np.abs(mastered).max():.3f}")


if __name__ == "__main__":
    main()
