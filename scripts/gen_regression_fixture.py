#!/usr/bin/env python
"""Deterministic real-file regression fixture generator.

The reference's regression WAV is a missing large blob
(`/root/reference/.MISSING_LARGE_BLOBS`), so we generate our own
representative ~165 s stereo 44.1 kHz program (covering all three default
metric windows, doc: MASTERING_REGRESSION.md): a quiet tonal intro, a loud
dense "chorus" mid-section with percussive hits, and a bright late section
with deliberate HF content — the material most likely to expose HF blowup
or discontinuity regressions in the chain.

The WAV itself is reproducible from this script (seeded, no dither), so
only the script + thresholds (`expected_metrics.json`) are committed; the
test harness (tests/test_regression_windows.py) regenerates the WAV on
demand into tests/fixtures/mastering_regression/regression.wav.
"""

import sys
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np

SR = 44100
DUR = 165.0
SEED = 20260817


def render() -> np.ndarray:
    g = np.random.default_rng(SEED)
    n = int(DUR * SR)
    t = np.arange(n) / SR
    x = np.zeros(n)

    # Sustained chord bed with slow detune movement (whole track).
    for f0, amp in ((110.0, 0.10), (165.0, 0.07), (220.1, 0.06),
                    (330.4, 0.04)):
        x += amp * np.sin(2 * np.pi * (f0 + 0.2 * np.sin(2 * np.pi * 0.05 * t))
                          * t + g.uniform(0, 6))

    # Melody: stepwise sine with vibrato, present everywhere but quiet in
    # the intro.
    steps = g.integers(0, 8, size=int(DUR / 0.5) + 1)
    scale = 440.0 * 2 ** (np.array([0, 2, 3, 5, 7, 8, 10, 12]) / 12.0)
    f_mel = scale[steps][np.minimum((t / 0.5).astype(int), len(steps) - 1)]
    mel = 0.12 * np.sin(2 * np.pi * np.cumsum(f_mel) / SR
                        + 0.1 * np.sin(2 * np.pi * 5.0 * t))
    x += mel

    # Percussive hits every 0.5 s from t=60 s (the loud mid/late sections).
    hit = (g.standard_normal(2000) * np.exp(-np.arange(2000) / 250.0))
    for p in np.arange(60.0, DUR - 0.1, 0.5):
        i = int(p * SR)
        x[i:i + 2000] += 0.35 * hit * g.uniform(0.6, 1.0)

    # Bright late section: filtered noise shimmer + 9-11 kHz arps.
    late = t >= 140.0
    shimmer = g.standard_normal(n) * 0.035
    # crude high-pass via first difference (HF-weighted noise)
    shimmer = np.diff(shimmer, prepend=0.0)
    x += np.where(late, shimmer, 0.0)
    x += np.where(late, 0.05 * np.sin(2 * np.pi * 9800.0 * t), 0.0)

    # Section loudness envelope: quiet intro, ramp at 30-60 s, loud after.
    env = np.interp(t, [0, 10, 30, 60, 140, DUR], [0.25, 0.3, 0.5, 1.0, 1.0, 0.9])
    x *= env

    # Stereo: slight delay + gain tilt on the right channel.
    d = 12
    right = np.concatenate([np.zeros(d), x[:-d]]) * 0.92 + 0.08 * x
    out = np.stack([x, right])
    peak = np.abs(out).max()
    return (out / peak * 0.70).astype(np.float32)


def main():
    from amw_tpu.utils import wav

    out_dir = Path("tests/fixtures/mastering_regression")
    out_dir.mkdir(parents=True, exist_ok=True)
    audio = render()
    q = np.round(np.clip(audio, -1, 1) * 32767.0).astype(np.int16)  # no dither: deterministic
    (out_dir / "regression.wav").write_bytes(wav.write_wav_int16(q, SR))
    print(f"wrote {out_dir / 'regression.wav'} "
          f"({audio.shape[-1] / SR:.0f}s stereo {SR} Hz)")


if __name__ == "__main__":
    main()
