"""Envelope-driven dynamics ops: de-esser, dynamic EQ, transient designer,
transient-aware maximizer.

Reference: backend/app/pipeline.py:1200-1264 (de-esser), :1628-1696 (dynamic
EQ), :1736-1768 (transient designer), :521-545 (transient-aware maximizer).
All envelope followers run as chunked-parallel scans (:mod:`amw_tpu.ops.scan`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import DYNAMIC_EQ_MASTERING_BANDS
from ..spec import GraphSpec
from . import design
from .basic import maximizer
# box smoothing now lives inside scan.deesser_gain_combine
from .scan import ar_coefs, envelope_follower
from .zphase import make_zp


def _db(x):
    return 10.0 ** (x / 20.0)


def build_deesser(
    spec: GraphSpec,
    threshold_db: float = -6.0,
    ratio: float = 3.0,
    freq_lo: float = 5000.0,
    freq_hi: float = 9000.0,
    attack_ms: float = 4.0,
    release_ms: float = 85.0,
):
    """Sibilance-band (5-9 kHz) compressor with smoothed gain curve."""
    lo_n = min(freq_lo / spec.nyq, 0.97)
    hi_n = min(freq_hi / spec.nyq, 0.97)
    if lo_n >= hi_n:
        return [], lambda x, params: x
    ba = design.butter_ba_norm(2, (lo_n, hi_n), "band")
    zp = make_zp(spec, [ba])
    att, rel = ar_coefs(spec.sr, attack_ms / 1000.0, release_ms / 1000.0)
    thresh = _db(threshold_db)
    k = max(3, int(spec.sr * 0.0015))
    if k % 2 == 0:
        k += 1
    params = [zp.params]

    def fn(x, params):
        from . import validctx
        from .scan import deesser_gain_combine

        sidechain = zp(x, params[0])
        # Envelope -> gain -> ~1.5 ms box smoothing -> combine, fused into
        # one Pallas pass on TPU (ops/scan.deesser_gain_combine; composed
        # from the individual ops elsewhere).  Box semantics: zeros beyond
        # the valid end, like the exact-length graph's box_smooth_same.
        return deesser_gain_combine(x, sidechain, att, rel, thresh, ratio,
                                    k, nv=validctx.n_valid())

    return params, fn


def build_dynamic_eq(spec: GraphSpec, bands=None):
    """8-band bell-filter dynamic EQ, bands processed sequentially.

    Deliberate divergence from the reference: pipeline.py:1660-1663 passes a
    computed *bandwidth* as scipy ``iirpeak``'s Q argument, which produces
    unstable bells (poles on/outside the unit circle) whose only observable
    behavior is overflow scrubbed to zeros by its NaN guards.  This build
    implements the evident intent — a stable bell of quality factor ``q`` —
    which is also the only semantics a frequency-domain (FIR-equivalent)
    kernel can represent.
    """
    if bands is None:
        bands = DYNAMIC_EQ_MASTERING_BANDS
    plans = []
    for band in bands:
        freq = float(band.get("freq", 1000))
        q = float(band.get("q", 1.4))
        if freq <= 0 or freq >= spec.nyq * 0.98:
            continue
        w0 = float(np.clip(freq / spec.nyq, 0.001, 0.98))
        try:
            ba = design.iirpeak_ba(w0, max(q, 0.1))
        except Exception:
            continue
        att, rel = ar_coefs(
            spec.sr,
            float(band.get("attack_ms", 5)) / 1000.0,
            float(band.get("release_ms", 80)) / 1000.0,
        )
        plans.append(dict(
            zp=make_zp(spec, [ba]),
            att=att, rel=rel,
            thresh=_db(float(band.get("threshold_db", -12))),
            ratio=float(band.get("ratio", 3.0)),
            max_cut=_db(float(band.get("max_cut_db", -6))),
        ))
    params = [p["zp"].params for p in plans]

    def fn(x, params):
        out = x
        orig = x
        for p, resp in zip(plans, params):
            band_sig = jnp.nan_to_num(p["zp"](out, resp), nan=0.0, posinf=0.0, neginf=0.0)
            env = jnp.nan_to_num(
                envelope_follower(jnp.abs(band_sig), p["att"], p["rel"]),
                nan=0.0, posinf=0.0, neginf=0.0)
            gain = jnp.where(
                env > p["thresh"],
                jnp.clip((p["thresh"] + (env - p["thresh"]) / p["ratio"]) / (env + 1e-12),
                         p["max_cut"], 1.0),
                1.0,
            )
            gain = jnp.clip(jnp.nan_to_num(gain, nan=1.0, posinf=1.0, neginf=1.0), 0.3, 1.0)
            out = out - band_sig + band_sig * gain
        bad = ~jnp.isfinite(out)
        out = jnp.where(bad, orig, out)
        return jnp.clip(out, -1.0, 1.0)

    return params, fn


def build_transient_designer(spec: GraphSpec, attack_gain: float = 1.0,
                             sustain_gain: float = 1.0):
    attack_gain = float(np.clip(attack_gain, 0.1, 3.0))
    sustain_gain = float(np.clip(sustain_gain, 0.1, 3.0))
    if abs(attack_gain - 1.0) < 0.02 and abs(sustain_gain - 1.0) < 0.02:
        return [], lambda x, params: x
    f_att, f_rel = ar_coefs(spec.sr, 0.0005, 0.005)
    s_att, s_rel = ar_coefs(spec.sr, 0.005, 0.1)

    def fn(x, params):
        abs_x = jnp.abs(x)
        fast = envelope_follower(abs_x, f_att, f_rel)
        slow = envelope_follower(abs_x, s_att, s_rel)
        transient = jnp.maximum(fast - slow, 0.0)
        gain = jnp.clip(
            (transient * attack_gain + slow * sustain_gain) / (fast + 1e-12), 0.0, 4.0
        )
        return jnp.clip(x * gain, -1.0, 1.0)

    return [], fn


def build_maximizer_transient_aware(spec: GraphSpec, sensitivity: float = 0.5):
    f_att, f_rel = ar_coefs(spec.sr, 0.0005, 0.002)
    s_att, s_rel = ar_coefs(spec.sr, 0.01, 0.04)

    def fn(x, params):
        limited = maximizer(x)
        mono = jnp.mean(jnp.abs(x), axis=-2)  # average over channel axis
        fast = envelope_follower(mono, f_att, f_rel)
        slow = envelope_follower(mono, s_att, s_rel)
        mask = jnp.clip(
            jnp.maximum(fast - slow, 0.0) / (slow + 1e-12) * float(sensitivity),
            0.0, 1.0,
        )[..., None, :]
        out = limited * (1.0 - mask) + x * mask
        return jnp.clip(out, -1.0, 1.0)

    return [], fn
