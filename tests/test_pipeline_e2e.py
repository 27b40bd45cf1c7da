"""End-to-end parity: fused v1 pipeline and v2 chain graphs vs the oracle."""

import numpy as np
import pytest
import jax

from amw_tpu import refimpl
from amw_tpu.refimpl.chain import chain_process
from amw_tpu.models import compile_chain, default_chain_config, master_v1
from amw_tpu.spec import GraphSpec

SR = 44100


@pytest.fixture(scope="module")
def mix():
    g = np.random.default_rng(11)
    n = 2 * SR
    t = np.arange(n) / SR
    x = (0.25 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 3000 * t)
         + 0.04 * g.standard_normal(n))
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 0.7 * t))
    left = (x * env).astype(np.float32)
    right = (0.85 * x * env).astype(np.float32)
    return np.clip(np.stack([left, right]), -0.99, 0.99)


def test_v1_pipeline_parity(mix):
    got = master_v1(mix, SR, target_lufs=-14.0, style="standard")
    want = refimpl.v1_pipeline(mix, SR, target_lufs=-14.0, style="standard")
    err = np.max(np.abs(got.astype(np.float64) - want))
    assert err < 1e-3, err  # ~ -60 dBFS; dominated by LUFS-gain rounding
    # loudness parity is the headline gate: <= 0.1 LU
    l_got = refimpl.integrated_lufs(got, SR)
    l_want = refimpl.integrated_lufs(want, SR)
    assert abs(l_got - l_want) < 0.02


def test_v1_pipeline_styles(mix):
    for style in ("edm", "dry_vocal"):
        got = master_v1(mix, SR, target_lufs=-10.0, style=style)
        want = refimpl.v1_pipeline(mix, SR, target_lufs=-10.0, style=style)
        err = np.max(np.abs(got.astype(np.float64) - want))
        assert err < 2e-3, (style, err)


def test_v1_reaches_target_lufs(mix):
    out = master_v1(mix, SR, target_lufs=-14.0)
    lufs = refimpl.integrated_lufs(out, SR)
    assert abs(lufs - (-14.0)) < 1.0, lufs
    # true-peak gate: <= -1.5 dBTP + 1 dB tolerance (reference self-diagnosis)
    tp = refimpl.true_peak_dbfs(out, SR)
    assert tp <= -0.5, tp
    assert np.all(np.isfinite(out))


def test_v2_default_chain_parity(mix):
    spec = GraphSpec(sr=SR, n=mix.shape[-1], channels=2)
    config = default_chain_config(target_lufs=-14.0, style="standard")
    chain = compile_chain(spec, config)
    got = chain(mix)
    want = chain_process(mix, SR, config)
    err = np.max(np.abs(got.astype(np.float64) - want))
    assert err < 1e-3, err


def test_v2_chain_amount_blend_and_reverb(mix):
    config = default_chain_config(-14.0, "standard")
    for m in config["modules"]:
        if m["id"] == "target_curve":
            m["amount"] = 0.5
        if m["id"] == "reverb":
            m["enabled"] = True
            m["mix"] = 0.2
    spec = GraphSpec(sr=SR, n=mix.shape[-1], channels=2)
    got = compile_chain(spec, config)(mix)
    want = chain_process(mix, SR, config)
    err = np.max(np.abs(got.astype(np.float64) - want))
    assert err < 1e-3, err


def test_chain_cache_hit(mix):
    spec = GraphSpec(sr=SR, n=mix.shape[-1], channels=2)
    c1 = compile_chain(spec, default_chain_config())
    c2 = compile_chain(spec, default_chain_config())
    assert c1 is c2


def test_v1_pipeline_with_extras(mix):
    got = master_v1(
        mix, SR, target_lufs=-14.0, style="standard",
        denoise_strength=0.3, transient_attack=1.3, transient_sustain=0.9,
    )
    want = refimpl.v1_pipeline(
        mix, SR, target_lufs=-14.0, style="standard",
        denoise_strength=0.3, transient_attack=1.3, transient_sustain=0.9,
    )
    err = np.max(np.abs(got.astype(np.float64) - want))
    assert err < 2e-3, err
