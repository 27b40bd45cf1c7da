"""Per-op parity: TPU graph ops vs the numpy/scipy oracle (exact mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amw_tpu import refimpl
from amw_tpu.spec import GraphSpec
from amw_tpu.ops import basic
from amw_tpu.ops.bands import build_dynamics, build_multiband_dynamics
from amw_tpu.ops.dynamics import (
    build_deesser,
    build_dynamic_eq,
    build_maximizer_transient_aware,
    build_transient_designer,
)
from amw_tpu.ops.eq import (
    build_final_spectral_balance,
    build_high_freq_trim,
    build_rumble_filter,
    build_style_eq,
    build_target_curve,
)
from amw_tpu.ops.exciter import build_harmonic_exciter
from amw_tpu.ops.reverb import build_reverb
from amw_tpu.ops.spectral import build_reference_match, build_spectral_denoise, spectral_envelope
from amw_tpu.ops.stereo import build_stereo_imager

SR = 44100


def run_op(build, x, *args, **kw):
    spec = GraphSpec(sr=SR, n=x.shape[-1], channels=x.shape[0])
    params, fn = build(spec, *args, **kw)
    import jax
    return np.asarray(fn(jnp.asarray(x), jax.device_put(params)))


def max_err(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


@pytest.fixture(scope="module")
def mix():
    """Music-like fixture: tones + noise + transients, stereo."""
    g = np.random.default_rng(7)
    n = 2 * SR
    t = np.arange(n) / SR
    x = (0.3 * np.sin(2 * np.pi * 110 * t)
         + 0.15 * np.sin(2 * np.pi * 997 * t)
         + 0.08 * np.sin(2 * np.pi * 7000 * t)
         + 0.05 * g.standard_normal(n))
    hits = np.zeros(n)
    hits[::SR // 4] = 1.0
    from scipy.signal import lfilter
    punch = lfilter([1.0], [1.0, -0.995], hits) * 0.4
    left = (x + punch).astype(np.float32)
    right = (0.8 * x + 0.9 * punch).astype(np.float32)
    return np.clip(np.stack([left, right]), -0.99, 0.99)


def test_target_curve(mix):
    got = run_op(build_target_curve, mix)
    want = refimpl.target_curve(mix, SR)
    assert max_err(got, want) < 3e-5


def test_target_curve_ms(mix):
    got = run_op(build_target_curve, mix, eq_ms=True)
    want = refimpl.target_curve(mix, SR, eq_ms=True)
    assert max_err(got, want) < 3e-5


def test_target_curve_linear_phase(mix):
    got = run_op(build_target_curve, mix, phase_mode="linear_phase")
    want = refimpl.target_curve(mix, SR, phase_mode="linear_phase")
    assert max_err(got, want) < 3e-5


def test_style_eq(mix):
    for style in ("edm", "lofi", "podcast"):
        got = run_op(build_style_eq, mix, style=style)
        want = refimpl.style_eq(mix, SR, style)
        assert max_err(got, want) < 5e-5, style


def test_final_spectral_balance(mix):
    got = run_op(build_final_spectral_balance, mix)
    want = refimpl.final_spectral_balance(mix, SR)
    assert max_err(got, want) < 3e-5


def test_rumble_filter(mix):
    got = run_op(build_rumble_filter, mix, cutoff_hz=80.0)
    want = refimpl.rumble_filter(mix, SR, 80.0)
    assert max_err(got, want) < 3e-5


def test_high_freq_trim(mix):
    got = run_op(build_high_freq_trim, mix)
    want = refimpl.high_freq_trim(mix, SR)
    assert max_err(got, want) < 3e-5


def test_multiband_dynamics(mix):
    got = run_op(build_multiband_dynamics, mix)
    want = refimpl.multiband_dynamics(mix, SR)
    assert max_err(got, want) < 1e-4


def test_dynamics_full(mix):
    got = run_op(build_dynamics, mix)
    want = refimpl.dynamics(mix, SR)
    assert max_err(got, want) < 1e-4


def test_deesser(mix):
    got = run_op(build_deesser, mix)
    want = refimpl.deesser(mix, SR)
    assert max_err(got, want) < 1e-4


def test_dynamic_eq(mix):
    got = run_op(build_dynamic_eq, mix)
    want = refimpl.dynamic_eq(mix, SR)
    assert max_err(got, want) < 3e-4


def test_transient_designer(mix):
    got = run_op(build_transient_designer, mix, 1.4, 0.8)
    want = refimpl.transient_designer(mix, SR, 1.4, 0.8)
    assert max_err(got, want) < 1e-4


def test_maximizer_transient_aware(mix):
    got = run_op(build_maximizer_transient_aware, mix, 0.5)
    want = refimpl.maximizer_transient_aware(mix, SR, 0.5)
    assert max_err(got, want) < 1e-4


def test_maximizer_lookahead(mix):
    got = np.asarray(basic.maximizer_lookahead(jnp.asarray(mix), SR))
    want = refimpl.maximizer_lookahead(mix, SR)
    assert max_err(got, want) < 1e-5


def test_exciter(mix):
    got = run_op(build_harmonic_exciter, mix, 0.6)
    want = refimpl.harmonic_exciter(mix, SR, 0.6)
    assert max_err(got, want) < 5e-5


def test_exciter_oversampled(mix):
    got = run_op(build_harmonic_exciter, mix, 0.6, "tape", 2)
    want = refimpl.harmonic_exciter(mix, SR, 0.6, "tape", 2)
    assert max_err(got, want) < 5e-5


def test_imager_width(mix):
    got = run_op(build_stereo_imager, mix, 1.3)
    want = refimpl.stereo_imager(mix, 1.3)
    assert max_err(got, want) < 1e-5


def test_imager_bands_haas(mix):
    got = run_op(build_stereo_imager, mix, 1.0, 5.0, 0.2, (1.0, 1.1, 1.25, 1.4), None)
    want = refimpl.stereo_imager(mix, 1.0, 5.0, 0.2, SR, (1.0, 1.1, 1.25, 1.4), None)
    assert max_err(got, want) < 5e-5


def test_spectral_denoise(mix):
    got = run_op(build_spectral_denoise, mix, 0.5, 15.0)
    want = refimpl.spectral_denoise(mix, SR, 0.5, 15.0)
    assert max_err(got, want) < 5e-4


def test_spectral_envelope(mix):
    got = np.asarray(spectral_envelope(jnp.asarray(mix)))
    want = refimpl.spectral_envelope(mix, SR)
    assert np.max(np.abs(got - want) / (np.abs(want) + 1e-3)) < 1e-2


def test_reference_match(mix):
    ref = np.roll(mix, 1000, axis=-1) * 0.8  # a 'reference' track
    ref_env = refimpl.spectral_envelope(ref, SR)
    got = run_op(build_reference_match, mix, ref_env, 0.8)
    want = refimpl.reference_match(mix, SR, ref, SR, strength=0.8)
    assert max_err(got, want) < 2e-3


@pytest.mark.parametrize("preset", ["plate", "hall"])
def test_reverb(mix, preset):
    got = run_op(build_reverb, mix, preset, 1.2, 0.2)
    want = refimpl.reverb(mix, SR, preset, 1.2, 0.2)
    assert max_err(got, want) < 1e-4


def test_reverb_ms(mix):
    got = run_op(build_reverb, mix, "room", 0.6, 0.15, 0.2, 0.1)
    want = refimpl.reverb(mix, SR, "room", 0.6, 0.15, 0.2, 0.1)
    assert max_err(got, want) < 1e-4


def test_fused_final_balance_style_matches_sequential():
    from amw_tpu.ops.eq import (build_final_balance_then_style,
                                build_final_spectral_balance, build_style_eq)
    from amw_tpu.spec import GraphSpec

    sr, n = 22050, 60000
    spec = GraphSpec(sr=sr, n=n, channels=2)
    g = np.random.default_rng(11)
    x = (0.2 * g.standard_normal((2, n))).astype(np.float32)

    fused = build_final_balance_then_style(spec, "edm")
    assert fused is not None
    pf, ff = fused
    got = np.asarray(ff(jnp.asarray(x), pf))

    p1, f1 = build_final_spectral_balance(spec)
    p2, f2 = build_style_eq(spec, "edm")
    want = np.asarray(f2(f1(jnp.asarray(x), p1), p2))
    err = np.max(np.abs(got - want))
    assert err < 10 ** (-90 / 20), f"fused vs sequential err {err}"


def test_chain_peephole_fuses_default_config():
    from amw_tpu.models.chain import build_chain_ops, default_chain_config
    from amw_tpu.spec import GraphSpec

    spec = GraphSpec(sr=22050, n=30000, channels=2)
    # with normalize_lufs disabled, the pair fusion triggers
    cfg = default_chain_config(style="edm")
    for m in cfg["modules"]:
        if m["id"] == "normalize_lufs":
            m["enabled"] = False
    ids, params, fns, bypassed = build_chain_ops(spec, cfg, style="edm")
    assert "final_spectral_balance+style_eq" in ids
    assert "style_eq" not in ids and "final_spectral_balance" not in ids
    # styles with no EQ bands keep the unfused final balance
    cfg2 = default_chain_config(style="standard")
    for m in cfg2["modules"]:
        if m["id"] == "normalize_lufs":
            m["enabled"] = False
    ids2, *_ = build_chain_ops(spec, cfg2, style="standard")
    assert "final_spectral_balance" in ids2


def test_fused_target_deesser_matches_sequential():
    from amw_tpu.ops.dynamics import build_deesser
    from amw_tpu.ops.eq import build_target_curve
    from amw_tpu.ops.fused import build_target_then_deesser
    from amw_tpu.spec import GraphSpec

    sr, n = 44100, 120000
    spec = GraphSpec(sr=sr, n=n, channels=2)
    g = np.random.default_rng(12)
    x = (0.2 * g.standard_normal((2, n))).astype(np.float32)

    fused = build_target_then_deesser(spec)
    assert fused is not None
    pf, ff = fused
    got = np.asarray(ff(jnp.asarray(x), pf))

    p1, f1 = build_target_curve(spec)
    p2, f2 = build_deesser(spec)
    want = np.asarray(f2(f1(jnp.asarray(x), p1), p2))
    err = np.max(np.abs(got - want))
    assert err < 10 ** (-90 / 20), f"fused target+deesser err {err}"


@pytest.mark.parametrize("style", ["standard", "edm"])
def test_fused_normalize_final_matches_sequential(style):
    from amw_tpu.ops.eq import build_final_spectral_balance, build_style_eq
    from amw_tpu.ops.fused import build_normalize_then_final
    from amw_tpu.ops.meters import build_normalize_lufs
    from amw_tpu.spec import GraphSpec

    sr, n = 22050, 80000
    spec = GraphSpec(sr=sr, n=n, channels=2)
    g = np.random.default_rng(13)
    x = (0.1 * g.standard_normal((2, n))).astype(np.float32)

    fused = build_normalize_then_final(spec, -14.0, style)
    assert fused is not None
    pf, ff, fid = fused
    got = np.asarray(ff(jnp.asarray(x), pf))

    p0, f0 = build_normalize_lufs(spec, -14.0)
    p1, f1 = build_final_spectral_balance(spec)
    y = f1(f0(jnp.asarray(x), p0), p1)
    if "style_eq" in fid:
        p2, f2 = build_style_eq(spec, style)
        y = f2(y, p2)
    want = np.asarray(y)
    err = np.max(np.abs(got - want))
    assert err < 10 ** (-90 / 20), f"fused normalize+final err {err}"


def test_block_energies_ignores_buffer_tail_past_plan_n():
    """block_energies must frame only the plan's signal: the fused
    normalize+final builder hands it the full nfft-length filter output,
    whose tail past plan.n is circular-convolution ringout.  For a
    non-hop-multiple n the uniform path's last (truncated) gating blocks
    must read zeros there, exactly like the exact-length meter."""
    from amw_tpu.ops.meters import block_energies, plan_blocks

    sr = 44100
    n = sr * 2 + 3500  # NOT a hop multiple; block count rounds UP past n
    plan = plan_blocks(sr, n)
    assert plan.uniform and plan.n_sub * plan.hop > n
    g = np.random.default_rng(21)
    y = (0.3 * g.standard_normal((2, n))).astype(np.float32)
    garbage = np.full((2, 8192), 0.7, np.float32)
    y_long = np.concatenate([y, garbage], axis=-1)

    want = np.asarray(block_energies(jnp.asarray(y), plan))
    got = np.asarray(block_energies(jnp.asarray(y_long), plan))
    assert np.allclose(got, want, rtol=1e-6, atol=1e-12)


def test_fused_normalize_final_pallas_exact_nonhop_length(monkeypatch):
    """Regression (round-5 advice): the Pallas route of
    build_normalize_then_final returns full nfft-length z; with nv=None and
    n not a hop multiple the gating frame must not ingest K-weighting
    ringout from [n, n_sub*hop) — the normalize gain would shift and break
    the -90 dBFS parity gate for exact-length graphs."""
    import functools

    from amw_tpu.ops import fft_pallas as fp
    from amw_tpu.ops.fused import build_normalize_then_final
    from amw_tpu.spec import GraphSpec

    sr = 44100
    n = (1 << 21) - 65536  # 46.07 s: n_sub*hop = 2033010 > n = 2031616
    spec = GraphSpec(sr=sr, n=n, channels=2)
    g = np.random.default_rng(17)
    x = (0.1 * g.standard_normal((2, n))).astype(np.float32)

    monkeypatch.setattr(fp, "enabled", lambda nfft: True)
    for name in ("roundtrip_multi",):
        orig = getattr(fp, name)
        monkeypatch.setattr(fp, name,
                            functools.partial(orig, interpret=True))
    fused_p = build_normalize_then_final(spec, -14.0, None)
    assert fused_p is not None
    pp, ffp, _ = fused_p
    got = np.asarray(ffp(jnp.asarray(x), pp))

    monkeypatch.setattr(fp, "enabled", lambda nfft: False)
    px, ffx, _ = build_normalize_then_final(spec, -14.0, None)
    want = np.asarray(ffx(jnp.asarray(x), px))

    scale = max(float(np.max(np.abs(want))), 1e-9)
    assert np.max(np.abs(got - want)) / scale < 2e-5


def test_chain_peephole_triple_fusion():
    from amw_tpu.models.chain import build_chain_ops, default_chain_config
    from amw_tpu.spec import GraphSpec

    spec = GraphSpec(sr=22050, n=60000, channels=2)
    ids, *_ = build_chain_ops(
        spec, default_chain_config(style="edm"), style="edm")
    assert "normalize_lufs+final_spectral_balance+style_eq" in ids
    ids2, *_ = build_chain_ops(
        spec, default_chain_config(style="standard"), style="standard")
    assert "normalize_lufs+final_spectral_balance" in ids2
    assert "style_eq" in ids2  # identity stage kept for no-band styles


def test_fused_target_dynamics_matches_sequential():
    from amw_tpu.ops.bands import build_dynamics
    from amw_tpu.ops.eq import build_target_curve
    from amw_tpu.ops.fused import build_target_then_dynamics
    from amw_tpu.spec import GraphSpec

    sr, n = 44100, 120000
    spec = GraphSpec(sr=sr, n=n, channels=2)
    g = np.random.default_rng(14)
    x = (0.2 * g.standard_normal((2, n))).astype(np.float32)

    pf, ff = build_target_then_dynamics(spec)
    got = np.asarray(ff(jnp.asarray(x), pf))

    p1, f1 = build_target_curve(spec)
    p2, f2 = build_dynamics(spec)
    want = np.asarray(f2(f1(jnp.asarray(x), p1), p2))
    err = np.max(np.abs(got - want))
    assert err < 10 ** (-90 / 20), f"fused target+dynamics err {err}"


def test_chain_peephole_target_dynamics():
    from amw_tpu.models.chain import build_chain_ops, default_chain_config
    from amw_tpu.spec import GraphSpec

    spec = GraphSpec(sr=22050, n=60000, channels=2)
    ids, *_ = build_chain_ops(
        spec, default_chain_config(style="standard"), style="standard")
    assert "target_curve+dynamics" in ids
    assert "dynamics" not in ids and "target_curve" not in ids


def test_fused_dc_peak_guard_matches_unfused_nonfinite():
    """The fused dc+peak-guard reduce (ops/basic.remove_dc_then_peak_guard)
    must match the unfused pair — including the reference's non-finite
    semantics (pipeline.py:134-149): an inf-poisoned channel maps to ∓1
    via nan_to_num after mean subtraction and dominates the global peak;
    a NaN/mixed-inf channel zeroes out entirely."""
    from amw_tpu.ops.basic import (remove_dc_offset,
                                   remove_dc_then_peak_guard,
                                   remove_intersample_peaks)

    g = np.random.default_rng(3)
    n = 4096
    clean = (0.4 * g.standard_normal((2, n)) + 0.1).astype(np.float32)

    cases = {"clean": clean}
    for name, val in (("posinf", np.inf), ("neginf", -np.inf),
                      ("nan", np.nan)):
        x = clean.copy()
        x[0, 100] = val
        cases[name] = x
    mixed = clean.copy()
    mixed[0, 100], mixed[0, 200] = np.inf, -np.inf
    cases["mixed_inf"] = mixed
    nan_and_inf = clean.copy()
    nan_and_inf[0, 100], nan_and_inf[0, 200] = np.inf, np.nan
    cases["nan_and_inf"] = nan_and_inf

    for name, x in cases.items():
        xd = jnp.asarray(x)
        want = np.asarray(remove_intersample_peaks(remove_dc_offset(xd)))
        got = np.asarray(remove_dc_then_peak_guard(xd))
        assert np.isfinite(got).all(), name
        err = np.max(np.abs(got - want))
        assert err < 1e-6, f"{name}: fused dc+peak err {err}"
