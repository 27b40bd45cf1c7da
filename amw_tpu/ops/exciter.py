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
        from . import validctx

        up = dict(zip(up_keys, params[1])) or None
        down = dict(zip(down_keys, params[2])) or None
        if os_f == 1:
            hf = zp(x, params[0])
            excitation = (exciter_saturate(hf, sat_mode, k) - hf) \
                * gain * exciter_mix
            return x + excitation
        # Oversampled section runs in work-rate samples: rescale the traced
        # valid length so the zero-phase filter anchors its edges at the
        # true track end, not at nv original-rate samples into the 2x/4x
        # buffer.  (FFT resampling of a zero-padded bucket is a periodic
        # interpolation, so padding invariance here is approximate at the
        # sinc-tail level rather than exact — the excitation is a low-level
        # additive HF component.)
        nv = validctx.n_valid()
        with validctx.valid_length(None if nv is None else nv * os_f):
            work = resample_fft(x, work_n, up)
            hf = zp(work, params[0])
            excitation = (exciter_saturate(hf, sat_mode, k) - hf) \
                * gain * exciter_mix
            out = work + excitation
        return resample_fft(out, spec.n, down)

    return params, fn
