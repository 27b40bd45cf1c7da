"""Extra coverage: remaining styles, fully-loaded v2 chain, dither spectra."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amw_tpu import refimpl
from amw_tpu.models import compile_chain, default_chain_config
from amw_tpu.models.pipeline_v1 import master_v1
from amw_tpu.refimpl.chain import chain_process
from amw_tpu.spec import GraphSpec

SR = 22050


@pytest.fixture(scope="module")
def mix():
    g = np.random.default_rng(21)
    n = 2 * SR
    t = np.arange(n) / SR
    x = (0.3 * np.sin(2 * np.pi * 180 * t)
         + 0.08 * np.sin(2 * np.pi * 3200 * t)
         + 0.04 * g.standard_normal(n))
    return np.clip(np.stack([x, 0.8 * x]), -0.99, 0.99).astype(np.float32)


@pytest.mark.parametrize("style", ["hiphop", "lofi", "classical"])
def test_v1_styles_parity(mix, style):
    got = master_v1(mix, SR, target_lufs=-13.0, style=style)
    want = refimpl.v1_pipeline(mix, SR, target_lufs=-13.0, style=style)
    err = np.max(np.abs(got.astype(np.float64) - want))
    assert err < 2e-3, (style, err)


def test_v2_chain_all_modules(mix):
    config = default_chain_config(-14.0, "standard")
    for m in config["modules"]:
        if m["id"] in ("exciter",):
            m["enabled"] = True
            m["exciter_db"] = 0.5
        if m["id"] == "imager":
            m["enabled"] = True
            m["width"] = 1.2
        if m["id"] == "reverb":
            m["enabled"] = True
            m["mix"] = 0.12
        if m["id"] == "target_curve":
            m["eq_ms"] = True
    # insert the transient-aware maximizer module (present in the registry
    # but not in the default config)
    config["modules"].insert(5, {"id": "maximizer", "enabled": True,
                                 "sensitivity": 0.4, "amount": 1.0})
    spec = GraphSpec(sr=SR, n=mix.shape[-1], channels=2)
    got = compile_chain(spec, config)(mix)
    want = chain_process(mix, SR, config)
    err = np.max(np.abs(got.astype(np.float64) - want))
    assert err < 2e-3, err


def test_v2_chain_linear_phase(mix):
    config = default_chain_config(-14.0, "standard")
    for m in config["modules"]:
        if m["id"] == "target_curve":
            m["phase_mode"] = "linear_phase"
    spec = GraphSpec(sr=SR, n=mix.shape[-1], channels=2)
    got = compile_chain(spec, config)(mix)
    want = chain_process(mix, SR, config)
    assert np.max(np.abs(got.astype(np.float64) - want)) < 2e-3


@pytest.mark.parametrize("kind", ["ns_e", "ns_itu"])
def test_noise_shaped_dither_is_highpassed(kind):
    from amw_tpu.ops.dither import dither_noise

    key = jax.random.PRNGKey(7)
    noise = np.asarray(dither_noise(key, (2, 1 << 16), kind))
    spec = np.abs(np.fft.rfft(noise, axis=-1)) ** 2
    freqs = np.fft.rfftfreq(1 << 16, 1 / 44100)
    lo = spec[:, (freqs > 0) & (freqs < 30.0)].mean()  # near-DC suppressed
    hi = spec[:, freqs > 15000.0].mean()   # top octave carries the noise
    assert hi > 3 * lo, (lo, hi)
    # matches the oracle filter's spectral tilt
    rng = np.random.default_rng(0)
    ref = (refimpl.dither_ns_e((2, 1 << 16), rng) if kind == "ns_e"
           else refimpl.dither_ns_itu((2, 1 << 16), rng))
    rspec = np.abs(np.fft.rfft(ref, axis=-1)) ** 2
    r_ratio = (rspec[:, freqs > 15000.0].mean()
               / rspec[:, (freqs > 0) & (freqs < 30.0)].mean())
    assert 0.3 < (hi / lo) / r_ratio < 3.0


def test_tpdf_dither_range():
    from amw_tpu.ops.dither import dither_noise

    noise = np.asarray(dither_noise(jax.random.PRNGKey(1), (4, 50000), "tpdf"))
    assert np.max(np.abs(noise)) <= 1.0
    assert abs(noise.mean()) < 0.01
    # triangular PDF: std = 1/sqrt(6)
    assert abs(noise.std() - 1 / np.sqrt(6)) < 0.01


def test_anomaly_pct_thresholds(monkeypatch):
    """anomaly_ram/disk_threshold settings actually gate percentage usage
    (regression: the pct keys were computed but never consulted)."""
    from amw_tpu.runtime import anomaly

    monkeypatch.setattr(anomaly, "server_metrics", lambda: {
        "load_1m": 0.1, "load_5m": 0.1,
        "mem_total_mb": 100000, "mem_available_mb": 4000,   # 96% used
        "rss_mb": 100,
        "disk_free_mb": 5000, "disk_total_mb": 100000,      # 95% used
    })
    alerts = anomaly.check_anomalies()
    assert any("RAM usage" in a for a in alerts), alerts
    assert any("Disk usage" in a for a in alerts), alerts


def test_chain_compiler_random_configs():
    """Any module subset/order/amount the public v2 config surface can
    express must compile and produce finite output (build-time bypass on
    invalid parameter combinations, chain.py policy)."""
    import jax.numpy as jnp

    from amw_tpu.models.chain import MODULE_BUILDERS, compile_chain
    from amw_tpu.spec import GraphSpec

    rng = np.random.default_rng(11)
    sr = 22050
    spec = GraphSpec(sr=sr, n=sr, channels=2, exact=True)
    t = np.arange(sr) / sr
    x = np.stack([0.4 * np.sin(2 * np.pi * 330 * t),
                  0.3 * np.sin(2 * np.pi * 220 * t)]).astype(np.float32)
    ids = list(MODULE_BUILDERS)
    for trial in range(6):
        k = int(rng.integers(1, len(ids) + 1))
        chosen = list(rng.choice(ids, size=k, replace=True))
        modules = []
        for mid in chosen:
            m = {"id": mid, "enabled": bool(rng.random() < 0.9),
                 "amount": float(np.round(rng.uniform(0.0, 1.0), 2))}
            if mid == "normalize_lufs":
                m["target_lufs"] = float(rng.uniform(-24.0, -9.0))
            if mid == "dynamics":
                m["knee_db"] = float(rng.uniform(2.0, 10.0))
            if mid == "exciter":
                m["exciter_db"] = float(rng.uniform(0.0, 3.0))
                m["oversample"] = int(rng.choice([1, 2]))
            if mid == "reverb":
                m["mix"] = float(rng.uniform(0.0, 0.4))
                m["decay_sec"] = float(rng.uniform(0.3, 2.0))
            if mid == "imager":
                m["width"] = float(rng.uniform(0.5, 1.6))
            modules.append(m)
        chain = compile_chain(spec, {"modules": modules}, jit=True)
        y = np.asarray(chain.fn(jnp.asarray(x), chain.params))
        assert y.shape == x.shape, (trial, chosen)
        assert np.all(np.isfinite(y)), (trial, chosen)
        assert np.max(np.abs(y)) <= 1.0 + 1e-5, (trial, chosen)
