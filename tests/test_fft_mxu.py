"""MXU-matmul FFT vs numpy reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from amw_tpu.ops.fft_mxu import cfft_mxu, irfft_mxu, rfft_mxu


@pytest.mark.parametrize("n", [128, 512, 4096, 1 << 16])
def test_cfft_matches_numpy(n):
    g = np.random.default_rng(0)
    re = g.standard_normal((3, n)).astype(np.float32)
    im = g.standard_normal((3, n)).astype(np.float32)
    yr, yi = cfft_mxu(jnp.asarray(re), jnp.asarray(im))
    want = np.fft.fft(re + 1j * im, axis=-1)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(np.asarray(yr) - want.real)) / scale < 2e-6
    assert np.max(np.abs(np.asarray(yi) - want.imag)) / scale < 2e-6


@pytest.mark.parametrize("n", [256, 4096, 1 << 17])
def test_cfft_inverse_roundtrip(n):
    g = np.random.default_rng(1)
    re = g.standard_normal((2, n)).astype(np.float32)
    im = g.standard_normal((2, n)).astype(np.float32)
    yr, yi = cfft_mxu(jnp.asarray(re), jnp.asarray(im))
    br, bi = cfft_mxu(yr, yi, inverse=True)
    assert np.max(np.abs(np.asarray(br) - re)) < 5e-5
    assert np.max(np.abs(np.asarray(bi) - im)) < 5e-5


@pytest.mark.parametrize("nfft", [256, 4096, 1 << 18])
def test_rfft_matches_numpy(nfft):
    g = np.random.default_rng(2)
    x = g.standard_normal((2, nfft)).astype(np.float32)
    xr, xi = rfft_mxu(jnp.asarray(x), nfft)
    want = np.fft.rfft(x, axis=-1)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(np.asarray(xr) - want.real)) / scale < 2e-6
    assert np.max(np.abs(np.asarray(xi) - want.imag)) / scale < 2e-6


@pytest.mark.parametrize("nfft", [512, 1 << 16])
def test_rfft_roundtrip_and_padding(nfft):
    g = np.random.default_rng(3)
    n = nfft - nfft // 4
    x = g.standard_normal((2, n)).astype(np.float32)
    xr, xi = rfft_mxu(jnp.asarray(x), nfft)
    back = np.asarray(irfft_mxu(xr, xi, nfft))
    assert np.max(np.abs(back[..., :n] - x)) < 5e-5
    assert np.max(np.abs(back[..., n:])) < 5e-5


def test_filter_roundtrip_matches_fd_path():
    """rfft_mxu -> multiply -> irfft_mxu equals the jnp.fft path."""
    from amw_tpu.ops import design

    g = np.random.default_rng(4)
    n = 100_000
    nfft = 1 << 17
    x = g.standard_normal((2, n)).astype(np.float32)
    from scipy import signal as sg

    b, a = sg.butter(2, 0.1, btype="high")
    H = design.freqz(b, a, nfft)
    xr, xi = rfft_mxu(jnp.asarray(x), nfft)
    yr = xr * H.real.astype(np.float32) - xi * H.imag.astype(np.float32)
    yi = xr * H.imag.astype(np.float32) + xi * H.real.astype(np.float32)
    got = np.asarray(irfft_mxu(yr, yi, nfft))[..., :n]
    want = np.fft.irfft(np.fft.rfft(x, n=nfft, axis=-1) * H, n=nfft,
                        axis=-1)[..., :n]
    assert np.max(np.abs(got - want)) < 5e-5
