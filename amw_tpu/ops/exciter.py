"""Harmonic exciter: HF band saturation with optional FFT oversampling.

Reference: backend/app/pipeline.py:1267-1326 (``apply_harmonic_exciter``) and
:1179-1197 (waveshaper curves).
"""

from __future__ import annotations

from ..spec import GraphSpec
from . import design
from .basic import exciter_saturate
from .fdfilter import resample_fft, resample_plan
from .zphase import make_zp


def build_harmonic_exciter(
    spec: GraphSpec,
    exciter_db: float = 0.0,
    mode: str = "warm",
    oversample: int = 1,
):
    if abs(exciter_db) < 0.05:
        return [], lambda x, params: x
    os_f = max(1, min(4, int(oversample)))
    work_sr = spec.sr * os_f
    work_n = spec.n * os_f
    work_spec = GraphSpec(sr=work_sr, n=work_n, channels=spec.channels,
                          exact=spec.exact)
    ba = design.butter_ba_norm(2, min(6000.0 / (work_sr / 2.0), 0.97), "high")
    zp = make_zp(work_spec, [ba])
    gain = 10.0 ** (exciter_db / 20.0) - 1.0
    sat_mode = mode if mode in ("warm", "tape", "tube", "transistor", "digital") else "warm"
    k = 2.5 if sat_mode == "warm" else 2.0
    exciter_mix = 0.25
    # Bluestein tables for non-native track lengths (fdfilter.resample_plan);
    # shipped as params so they never inline into the compiled program.
    up_plan = resample_plan(spec.n, work_n) if os_f > 1 else None
    down_plan = resample_plan(work_n, spec.n) if os_f > 1 else None
    params = [zp.params,
              list(up_plan.values()) if up_plan else [],
              list(down_plan.values()) if down_plan else []]
    up_keys = list(up_plan) if up_plan else []
    down_keys = list(down_plan) if down_plan else []

    def fn(x, params):
        up = dict(zip(up_keys, params[1])) or None
        down = dict(zip(down_keys, params[2])) or None
        work = resample_fft(x, work_n, up) if os_f > 1 else x
        hf = zp(work, params[0])
        excitation = (exciter_saturate(hf, sat_mode, k) - hf) * gain * exciter_mix
        out = work + excitation
        if os_f > 1:
            out = resample_fft(out, spec.n, down)
        return out

    return params, fn
