"""Parity of the frequency-domain LTI engine against scipy."""

import numpy as np
import pytest
from scipy import signal as sg

import jax.numpy as jnp

from amw_tpu.ops import design, fdfilter


SR = 44100


def _butter(order, hz, btype, sr=SR):
    return sg.butter(order, hz / (sr / 2.0), btype=btype)


@pytest.mark.parametrize(
    "order,hz,btype",
    [(2, 40.0, "high"), (2, 18000.0, "low"), (2, 80.0, "high")],
)
def test_lfilter_fd_matches_scipy(noise_stereo, order, hz, btype):
    b, a = _butter(order, hz, btype)
    x = noise_stereo
    n = x.shape[-1]
    settle = design.settle_len((b, a))
    nfft = design.next_fft_size(n + settle)
    H = jnp.asarray(design.freqz(b, a, nfft).astype(np.complex64))
    got = np.asarray(fdfilter.lfilter_fd(jnp.asarray(x), H, nfft))
    want = sg.lfilter(b, a, x.astype(np.float64), axis=-1)
    assert np.max(np.abs(got - want)) < 3e-6


@pytest.mark.parametrize(
    "order,hz,btype",
    [(2, 40.0, "high"), (2, 18000.0, "low"), (1, (2100.0, 3900.0), "band"),
     (2, 214.0, "low"), (2, 10000.0, "high")],
)
def test_filtfilt_fd_exact_matches_scipy(noise_stereo, order, hz, btype):
    if isinstance(hz, tuple):
        b, a = sg.butter(order, [hz[0] / (SR / 2), hz[1] / (SR / 2)], btype=btype)
    else:
        b, a = _butter(order, hz, btype)
    x = noise_stereo
    n = x.shape[-1]
    padlen = 3 * max(len(a), len(b))
    settle = design.settle_len((b, a))
    nfft = design.next_fft_size(n + 2 * padlen + 3 * settle)
    H = jnp.asarray(design.freqz(b, a, nfft).astype(np.complex64))
    got = np.asarray(
        fdfilter.filtfilt_fd(jnp.asarray(x), H, nfft, padlen=padlen, settle=settle)
    )
    want = sg.filtfilt(b, a, x.astype(np.float64), axis=-1)
    err = np.max(np.abs(got - want))
    assert err < 1e-5, err  # < -100 dBFS


def test_filtfilt_fd_fast_matches_midtrack(noise_stereo):
    b, a = _butter(2, 40.0, "high")
    x = noise_stereo
    n = x.shape[-1]
    padlen = 3 * max(len(a), len(b))
    settle = design.settle_len((b, a))
    nfft = design.next_fft_size(n + 2 * padlen + 3 * settle)
    R = jnp.asarray(design.zero_phase_power([(b, a)], nfft).astype(np.float32))
    got = np.asarray(
        fdfilter.filtfilt_fd(jnp.asarray(x), R, nfft, padlen=padlen,
                             settle=settle, exact=False)
    )
    want = sg.filtfilt(b, a, x.astype(np.float64), axis=-1)
    mid = slice(settle, n - settle)
    assert np.max(np.abs(got[:, mid] - want[:, mid])) < 1e-5
    # Edges legitimately differ (scipy's zi-based edge transient vs zero-pad)
    # but must stay bounded and finite.
    assert np.all(np.isfinite(got))
    assert np.max(np.abs(got)) < 4.0


def test_fftconvolve_same(noise_stereo):
    h = sg.firwin(101, 0.3)
    x = noise_stereo
    nfft = design.next_fft_size(x.shape[-1] + len(h))
    got = np.asarray(
        fdfilter.fftconvolve_same_fd(jnp.asarray(x), jnp.asarray(h, jnp.float32), nfft)
    )
    want = np.stack([sg.fftconvolve(c, h, mode="same") for c in x.astype(np.float64)])
    assert np.max(np.abs(got - want)) < 3e-6


@pytest.mark.parametrize("n_in,n_out", [(1000, 4000), (1000, 2500), (4000, 1000),
                                        (1001, 2002), (1000, 777)])
def test_resample_fft_matches_scipy(n_in, n_out):
    g = np.random.default_rng(1)
    x = g.standard_normal((2, n_in))
    got = np.asarray(fdfilter.resample_fft(jnp.asarray(x, jnp.float32), n_out))
    want = np.stack([sg.resample(c, n_out) for c in x])
    assert np.max(np.abs(got - want)) < 2e-5


@pytest.mark.parametrize("n_in,n_out", [(1001, 2002), (1000, 777),
                                        (441 * 10, 480 * 10), (900, 1024)])
def test_resample_bluestein_matches_scipy(n_in, n_out):
    """The TPU route: non-native FFT lengths via the chirp-z plan (the bare
    jnp.fft path would lower to an n×n DFT matmul on TPU)."""
    g = np.random.default_rng(2)
    x = g.standard_normal((3, n_in))
    plan = fdfilter.resample_plan(n_in, n_out)
    assert plan is not None and (
        ("fwd" in plan) == (not fdfilter.fft_native_ok(n_in)))
    got = np.asarray(
        fdfilter.resample_fft(jnp.asarray(x, jnp.float32), n_out, plan))
    want = np.stack([sg.resample(c, n_out) for c in x])
    assert np.max(np.abs(got - want)) < 5e-5


def test_fft_native_ok():
    assert fdfilter.fft_native_ok(1 << 20)
    assert fdfilter.fft_native_ok(3 << 14)
    assert fdfilter.fft_native_ok(5 << 10)
    assert not fdfilter.fft_native_ok(44100 * 180)  # the 180 s bucket
    assert not fdfilter.fft_native_ok(7 << 12)


def test_odd_ext_matches_scipy(noise_stereo):
    from scipy.signal._arraytools import odd_ext

    x = noise_stereo
    got = np.asarray(fdfilter.odd_ext(jnp.asarray(x), 9))
    want = odd_ext(x, 9, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_box_smooth_same_matches_fftconvolve():
    from amw_tpu.ops import design
    from amw_tpu.ops.fdfilter import box_smooth_same, fftconvolve_same_fd

    g = np.random.default_rng(7)
    for n, k in [(1000, 67), (4096, 3), (12345, 131)]:
        x = g.standard_normal((2, n)).astype(np.float32)
        ker = jnp.asarray((np.ones(k) / k).astype(np.float32))
        nfft = design.next_fft_size(n + k)
        want = np.asarray(fftconvolve_same_fd(jnp.asarray(x), ker, nfft))
        got = np.asarray(box_smooth_same(jnp.asarray(x), k))
        assert np.max(np.abs(got - want)) < 2e-6


def test_box_smooth_width_one_identity():
    from amw_tpu.ops.fdfilter import box_smooth_same

    x = jnp.asarray(np.random.default_rng(8).standard_normal((3, 50)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(box_smooth_same(x, 1)), np.asarray(x))


def test_box_pallas_interpret_matches_xla():
    """The Pallas halo box kernel (interpret mode) must match the XLA
    shift-add decomposition, including under vmap."""
    import functools
    from unittest import mock

    import jax
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(3)
    k = 67
    n = 50000
    xb = rng.standard_normal((2, 8, n)).astype(np.float32)
    want = np.asarray(jax.vmap(lambda x: fdfilter.box_smooth_same(x, k))(
        jnp.asarray(xb)))
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        got = np.asarray(jax.vmap(
            lambda x: fdfilter._box_pallas(x, k))(jnp.asarray(xb)))
    np.testing.assert_allclose(got, want, atol=3e-5)
