"""BS.1770 metering: ITU coefficient parity, oracle parity, known levels."""

import numpy as np
import pytest
import jax.numpy as jnp

from amw_tpu.ops import design, meters
from amw_tpu import refimpl
from tests.conftest import make_sine

SR = 48000


def test_k_weighting_itu_48k():
    (b1, a1), (b2, a2) = design.k_weighting_ba(48000)
    # ITU-R BS.1770-4 Table 1 & 2 coefficients.
    np.testing.assert_allclose(
        b1, [1.53512485958697, -2.69169618940638, 1.19839281085285], atol=2e-6)
    np.testing.assert_allclose(
        a1, [1.0, -1.69065929318241, 0.73248077421585], atol=2e-6)
    np.testing.assert_allclose(a2, [1.0, -1.99004745483398, 0.99007225036621], atol=2e-5)


def _tpu_lufs(x, sr):
    n = x.shape[-1]
    settle = meters.k_weight_settle(sr)
    nfft = design.next_fft_size(n + settle)
    Hk = jnp.asarray(meters.k_weight_response(sr, nfft))
    plan = meters.plan_blocks(sr, n)
    return float(meters.integrated_lufs(jnp.asarray(x), Hk, nfft, plan))


def test_sine_997_reference_level():
    # 997 Hz 0 dBFS sine: integrated loudness must be ~ -3.01 LUFS (stereo sums
    # two channels: full-scale stereo-correlated sine -> ~0 LUFS).
    x = make_sine(sr=SR, dur=3.0, freq=997.0, amp=1.0, stereo=False)
    got = _tpu_lufs(x, SR)
    assert abs(got - (-3.01)) < 0.1, got


@pytest.mark.parametrize("sr", [44100, 48000])
def test_integrated_matches_oracle(sr):
    g = np.random.default_rng(3)
    x = (0.2 * g.standard_normal((2, int(2.5 * sr)))).astype(np.float32)
    # add level variation so gating matters
    env = np.ones(x.shape[-1], np.float32)
    env[: x.shape[-1] // 3] = 0.001
    x = x * env
    got = _tpu_lufs(x, sr)
    want = refimpl.integrated_lufs(x, sr)
    assert abs(got - want) < 1e-3, (got, want)


def test_normalize_gain_matches_oracle(noise_stereo):
    sr = 44100
    want = refimpl.normalize_lufs(noise_stereo, sr, -14.0)
    lufs = _tpu_lufs(noise_stereo, sr)
    gain = float(meters.normalize_lufs_gain(jnp.asarray(lufs), -14.0))
    got = noise_stereo * gain
    assert np.max(np.abs(got - want)) < 1e-4


def test_true_peak_matches_scipy(noise_stereo):
    got = float(meters.true_peak_dbfs(jnp.asarray(noise_stereo)))
    want = refimpl.true_peak_dbfs(noise_stereo, 44100)
    assert abs(got - want) < 1e-3


def test_timeline_matches_oracle(noise_stereo):
    sr = 44100
    n = noise_stereo.shape[-1]
    settle = meters.k_weight_settle(sr)
    nfft = design.next_fft_size(n + settle)
    Hk = jnp.asarray(meters.k_weight_response(sr, nfft))
    got = np.asarray(meters.timeline_lufs(jnp.asarray(noise_stereo), Hk, nfft, sr))
    want = refimpl.timeline_lufs(noise_stereo, sr)
    assert got.shape == want.shape
    valid = want > -1e8
    assert np.max(np.abs(got[valid] - want[valid])) < 1e-3


def test_stereo_correlation():
    x = make_sine()
    r = float(meters.stereo_correlation(jnp.asarray(x)))
    assert abs(r - 1.0) < 1e-4  # correlated channels
    x2 = np.stack([x[0], -x[0]])
    r2 = float(meters.stereo_correlation(jnp.asarray(x2)))
    assert abs(r2 + 1.0) < 1e-4
