"""4x-oversampled true-peak limiter (ops/tplimit.py).

No reference counterpart exists (the reference only brickwalls SAMPLE
peaks, pipeline.py:89, and measures TP in the analyzer, tools.py:44-53),
so the oracle is scipy ``resample_poly`` TP measurement + hard invariants:
ceiling respected on adversarial inter-sample-peak signals, bit-exact
passthrough under the ceiling.
"""

import numpy as np
import jax
import pytest
from scipy.signal import resample_poly

from amw_tpu.ops.tplimit import build_true_peak_limiter
from amw_tpu.spec import GraphSpec

SR = 44100
N = 2 * SR


def _tp_db(sig):
    return 20 * np.log10(np.abs(resample_poly(sig, 4, 1, axis=-1)).max())


@pytest.fixture(scope="module")
def limiter():
    spec = GraphSpec(sr=SR, n=N, channels=2)
    params, fn = build_true_peak_limiter(spec, ceiling_db=-1.5)
    return jax.jit(lambda x, p: fn(x, p)), params


def test_intersample_peak_sine_limited(limiter):
    """fs/4 sine at 45 deg phase: samples sit at 0.707 of the true crest —
    the classic inter-sample-peak generator."""
    fn, params = limiter
    t = np.arange(N)
    x = np.stack([(0.95 * np.sin(2 * np.pi * 0.25 * t + np.pi / 4))
                  .astype(np.float32)] * 2)
    assert _tp_db(x) > -0.5  # genuinely over the ceiling going in
    y = np.asarray(fn(x, params))
    assert _tp_db(y) <= -1.5 + 0.05


def test_impulsive_bursts_limited(limiter):
    fn, params = limiter
    g = np.random.default_rng(0)
    z = np.zeros(N, np.float32)
    idx = g.integers(100, N - 100, 50)
    z[idx], z[idx + 1] = 0.99, -0.99
    z = np.stack([z, z])
    y = np.asarray(fn(z, params))
    assert _tp_db(y) <= -1.5 + 0.05


def test_peak_in_first_window_limited(limiter):
    """A peak inside the very first lookahead window (regression: causal
    smoothing padded with unity gain under-limited the track head)."""
    fn, params = limiter
    w = np.zeros(N, np.float32)
    w[5:9] = [0.9, -0.9, 0.9, -0.9]
    w = np.stack([w, w])
    y = np.asarray(fn(w, params))
    assert _tp_db(y) <= -1.5 + 0.05


def test_loud_noise_limited(limiter):
    fn, params = limiter
    g = np.random.default_rng(1)
    r = np.clip(0.8 * g.standard_normal((2, N)), -1, 1).astype(np.float32)
    y = np.asarray(fn(r, params))
    assert _tp_db(y) <= -1.5 + 0.05


def test_passthrough_bit_exact_under_ceiling(limiter):
    fn, params = limiter
    t = np.arange(N)
    q = np.stack([(0.3 * np.sin(2 * np.pi * 440 * t / SR))
                  .astype(np.float32)] * 2)
    q = np.stack([q[0], 0.8 * q[0]])
    assert np.array_equal(np.asarray(fn(q, params)), q)


def test_chain_module_and_pro_flag():
    """Wired both as a chain module (MODULE_BUILDERS) and as the v2 pro
    knob (true_peak_enabled)."""
    import jax.numpy as jnp

    from amw_tpu.models.chain import compile_chain
    from amw_tpu.models.v2_job import build_v2_job_graph

    sr, n = 22050, 22050 * 2
    t = np.arange(n)
    x = np.stack([(0.9 * np.sin(2 * np.pi * 0.25 * t + np.pi / 4))
                  .astype(np.float32)] * 2)
    spec = GraphSpec(sr=sr, n=n, channels=2)

    config = {"modules": [
        {"id": "dc_offset", "enabled": True, "amount": 1.0},
        {"id": "true_peak_limiter", "enabled": True, "ceiling_db": -2.0,
         "amount": 1.0},
    ]}
    chain = compile_chain(spec, config)
    y = np.asarray(chain(x))
    assert _tp_db(y) <= -2.0 + 0.05

    params, fn, names = build_v2_job_graph(
        spec, None, {"true_peak_enabled": True}, -14.0, "standard")
    assert "true_peak_limiter" in names
    res = fn(jnp.asarray(x), jax.device_put(params))
    out = np.asarray(res["out"])
    assert _tp_db(out) <= -1.5 + 0.05


def test_bucket_padding_matches_exact_length():
    """A track ending while limiting is active, padded into a longer
    bucket: the padded graph (with the traced n_valid installed) must
    reproduce the exact-length graph's tail gains and hold the ceiling —
    padding-derived unity gains must not dilute the edge smoothing
    (ops/validctx contract: edge-sensitive ops consult n_valid)."""
    from amw_tpu.ops import validctx

    nv = N - 1771                      # valid length, off any round number
    nb = N                             # bucket length
    t = np.arange(nv)
    loud = (0.95 * np.sin(2 * np.pi * 0.25 * t + np.pi / 4)).astype(np.float32)
    x_exact = np.stack([loud, loud])

    spec_e = GraphSpec(sr=SR, n=nv, channels=2)
    pe, fe = build_true_peak_limiter(spec_e, ceiling_db=-1.5)
    y_exact = np.asarray(fe(x_exact, pe))

    spec_b = GraphSpec(sr=SR, n=nb, channels=2)
    pb, fb = build_true_peak_limiter(spec_b, ceiling_db=-1.5)
    xp = np.pad(x_exact, ((0, 0), (0, nb - nv)))

    def padded(x, p):
        with validctx.valid_length(np.int32(nv)):
            return fb(x, p)

    y_pad = np.asarray(padded(xp, pb))[..., :nv]
    err = np.abs(y_pad - y_exact).max()
    assert err < 10 ** (-90 / 20), f"bucket parity {20*np.log10(max(err,1e-12)):.1f} dBFS"
    assert _tp_db(y_pad) <= -1.5 + 0.05
