"""Staged permuted-spectrum Pallas FFT vs numpy (interpret mode on CPU).

The kernels themselves run compiled only on TPU; interpret mode checks the
stage algebra (decimation, twiddles, adjoint inverse, response permutation)
at the smallest supported plan (2^21)."""

import numpy as np
import pytest
import jax.numpy as jnp

from amw_tpu.ops import fft_pallas as fp

NFFT = 1 << 21


@pytest.fixture(scope="module")
def spectrum():
    g = np.random.default_rng(0)
    x = g.standard_normal((1, NFFT)).astype(np.float32)
    xi = g.standard_normal((1, NFFT)).astype(np.float32)
    Xr, Xi = fp.fft_permuted(jnp.asarray(x), jnp.asarray(xi), NFFT,
                             interpret=True)
    return x, xi, Xr, Xi


def test_forward_matches_numpy_permuted(spectrum):
    x, xi, Xr, Xi = spectrum
    want = np.fft.fft(x + 1j * xi, axis=-1)[:, fp._perm(NFFT)]
    scale = np.max(np.abs(want))
    assert np.max(np.abs(np.asarray(Xr) - want.real)) / scale < 3e-6
    assert np.max(np.abs(np.asarray(Xi) - want.imag)) / scale < 3e-6


def test_inverse_roundtrip(spectrum):
    x, xi, Xr, Xi = spectrum
    br, bi = fp.ifft_permuted(Xr, Xi, NFFT, interpret=True)
    assert np.max(np.abs(np.asarray(br) - x)) < 2e-5
    assert np.max(np.abs(np.asarray(bi) - xi)) < 2e-5


def test_apply_response_matches_xla_path():
    from scipy import signal as sg

    g = np.random.default_rng(1)
    n = NFFT - 4096
    x = g.standard_normal((2, n)).astype(np.float32)
    b, a = sg.butter(2, 0.15)
    w = np.fft.rfftfreq(NFFT) * 2 * np.pi
    ze = np.exp(-1j * w)
    H = np.polyval(b[::-1], ze) / np.polyval(a[::-1], ze)
    resp = fp.permute_full_response(H, NFFT)
    got = np.asarray(fp.apply_response(
        jnp.asarray(x), jnp.asarray(resp), NFFT, n_out=n, interpret=True))
    want = np.fft.irfft(np.fft.rfft(x, n=NFFT, axis=-1) * H,
                        n=NFFT, axis=-1)[..., :n]
    assert np.max(np.abs(got - want)) < 1e-5


def test_inv_multi_matches_separate():
    g = np.random.default_rng(2)
    n = NFFT - 1024
    x = g.standard_normal((1, n)).astype(np.float32)
    R1 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    R2 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    resps = np.stack([fp.permute_full_response(R1, NFFT),
                      fp.permute_full_response(R2, NFFT)])
    Xr, Xi, lead = fp.fwd_real(jnp.asarray(x), NFFT, interpret=True)
    ys = np.asarray(fp.inv_multi(Xr, Xi, jnp.asarray(resps), NFFT, lead, n,
                                 interpret=True))
    X = np.fft.rfft(x, n=NFFT, axis=-1)
    for k, R in enumerate((R1, R2)):
        want = np.fft.irfft(X * R, n=NFFT, axis=-1)[..., :n]
        assert np.max(np.abs(ys[k] - want)) < 1e-5, k


def test_plan_gate():
    assert fp.plan_ok(1 << 21)
    assert fp.plan_ok(1 << 23)
    assert fp.plan_ok(1 << 20)         # C=64: direct C-point DFT plan
    assert fp.plan_ok(1 << 19)         # C=32
    assert not fp.plan_ok(1 << 18)     # C below 32
    assert not fp.plan_ok(3 << 21)     # C not a power of two
    assert not fp.plan_ok(1 << 25)     # C above 1024


def test_apply_response_composite_c_stage():
    """2^22 plan (C=256 → C2=2): exercises the in-kernel radix split."""
    nfft = 1 << 22
    g = np.random.default_rng(3)
    n = nfft - 2048
    x = g.standard_normal((1, n)).astype(np.float32)
    R = (np.random.rand(nfft // 2 + 1) + 0.25)
    resp = fp.permute_full_response(R, nfft)
    got = np.asarray(fp.apply_response(
        jnp.asarray(x), jnp.asarray(resp), nfft, n_out=n, interpret=True))
    want = np.fft.irfft(np.fft.rfft(x, n=nfft, axis=-1) * R,
                        n=nfft, axis=-1)[..., :n]
    assert np.max(np.abs(got - want)) < 2e-5


def test_inv_multi_reduce_matches_separate_maps():
    """inv_multi_reduce == inv_multi + per-band maps + sum (advisor r1):
    this is the production-default multiband-dynamics route when the
    Pallas FFT is enabled."""
    g = np.random.default_rng(4)
    n = NFFT - 1024
    x = g.standard_normal((1, n)).astype(np.float32)
    R1 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    R2 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    resps = np.stack([fp.permute_full_response(R1, NFFT),
                      fp.permute_full_response(R2, NFFT)])
    maps = (lambda y: jnp.tanh(1.7 * y) * 0.8,
            lambda y: y * 0.35 + 0.01 * y * y)
    Xr, Xi, lead = fp.fwd_real(jnp.asarray(x), NFFT, interpret=True)
    mixed = np.asarray(fp.inv_multi_reduce(
        Xr, Xi, jnp.asarray(resps), NFFT, lead, n, maps, interpret=True))
    ys = fp.inv_multi(Xr, Xi, jnp.asarray(resps), NFFT, lead, n,
                      interpret=True)
    want = np.asarray(sum(m(y) for m, y in zip(maps, ys)))
    scale = max(np.max(np.abs(want)), 1e-9)
    assert np.max(np.abs(mixed - want)) / scale < 1e-5


def test_roundtrip_multi_matches_numpy():
    """roundtrip_multi (fused fwd→resp→inv, spectrum never in HBM) vs the
    numpy reference, on both the packed (even row count: two real rows ride
    one complex row) and unpacked (R=1) paths."""
    g = np.random.default_rng(6)
    n = NFFT - 1024
    R1 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    R2 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    resps = jnp.asarray(np.stack([fp.permute_full_response(R1, NFFT),
                                  fp.permute_full_response(R2, NFFT)]))
    for rows in (1, 2):
        x = g.standard_normal((rows, n)).astype(np.float32)
        ys = np.asarray(fp.roundtrip_multi(jnp.asarray(x), resps, NFFT, n,
                                           interpret=True))
        X = np.fft.rfft(x, n=NFFT, axis=-1)
        for k, R in enumerate((R1, R2)):
            want = np.fft.irfft(X * R, n=NFFT, axis=-1)[..., :n]
            err = np.max(np.abs(ys[k] - want))
            assert err < 2e-5, (rows, k, err)


def test_roundtrip_multi_reduce_matches_composition():
    """roundtrip_multi_reduce == roundtrip_multi + maps + sum, packed and
    unpacked row counts."""
    g = np.random.default_rng(7)
    n = NFFT - 1024
    R1 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    R2 = (np.random.rand(NFFT // 2 + 1) + 0.25)
    resps = jnp.asarray(np.stack([fp.permute_full_response(R1, NFFT),
                                  fp.permute_full_response(R2, NFFT)]))
    maps = (lambda y: jnp.tanh(1.7 * y) * 0.8,
            lambda y: y * 0.35 + 0.01 * y * y)
    for rows in (1, 2):
        x = jnp.asarray(g.standard_normal((rows, n)).astype(np.float32))
        mixed = np.asarray(fp.roundtrip_multi_reduce(
            x, resps, NFFT, n, maps, interpret=True))
        ys = fp.roundtrip_multi(x, resps, NFFT, n, interpret=True)
        want = np.asarray(sum(m(y) for m, y in zip(maps, ys)))
        scale = max(np.max(np.abs(want)), 1e-9)
        assert np.max(np.abs(mixed - want)) / scale < 1e-5, rows


def test_band_split_plan_band_maps_pallas_parity(monkeypatch):
    """band_split_plan(band_maps=...) Pallas route (interpret-forced) vs
    the XLA route: same mixed output."""
    import functools

    from amw_tpu.ops import bands
    from amw_tpu.spec import GraphSpec

    monkeypatch.setattr(fp, "enabled", lambda nfft: True)
    for name in ("fwd_real", "inv_multi", "inv_multi_reduce",
                 "roundtrip_multi", "roundtrip_multi_reduce"):
        orig = getattr(fp, name)
        monkeypatch.setattr(fp, name,
                            functools.partial(orig, interpret=True))

    n = (1 << 21) - 65536
    g = np.random.default_rng(5)
    x = (0.3 * g.standard_normal((2, n))).astype(np.float32)
    maps = tuple((lambda gk: (lambda y: jnp.tanh(gk * y)))(1.0 + 0.2 * k)
                 for k in range(4))
    spec = GraphSpec(sr=44100, n=n, channels=2)

    params_p, split_p = bands.band_split_plan(spec, band_maps=maps)
    got = np.asarray(split_p(jnp.asarray(x), params_p))

    monkeypatch.setattr(fp, "enabled", lambda nfft: False)
    params_x, split_x = bands.band_split_plan(spec, band_maps=maps)
    want = np.asarray(split_x(jnp.asarray(x), params_x))

    scale = max(np.max(np.abs(want)), 1e-9)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) / scale < 2e-5


def test_apply_response_real_impulse_flag_unpacked_path():
    """``real_impulse=False`` must route even row counts through the
    unpacked pipeline and stay correct: the row-pair packing's split step
    assumes a conjugate-symmetric response, so a caller with an
    asymmetric H (e.g. a phase rotator) needs this flag.  Built here via
    the raw permuted storage since ``permute_full_response`` only emits
    symmetric spectra."""
    g = np.random.default_rng(7)
    n = NFFT - 4096
    x = g.standard_normal((2, n)).astype(np.float32)  # even rows: would pack
    # Asymmetric full-spectrum response: +90 deg rotation on positive
    # frequencies only (half-complex Hilbert-ish) — NOT conj-symmetric.
    full = np.ones(NFFT, np.complex128)
    full[1:NFFT // 2] = 1j
    fp_perm = full[fp._perm(NFFT)]
    resp = np.stack([fp_perm.real, fp_perm.imag]).astype(np.float32)
    got = np.asarray(fp.apply_response(
        jnp.asarray(x), jnp.asarray(resp), NFFT, n_out=n, interpret=True,
        real_impulse=False))
    spec = np.fft.fft(x, n=NFFT, axis=-1) * full
    want = np.fft.ifft(spec, axis=-1).real[..., :n]
    assert np.max(np.abs(got - want)) < 1e-4


@pytest.mark.parametrize("cplx", ["kara", "split4"])
def test_bf16x3_dot_mode_roundtrip_accuracy(monkeypatch, cplx):
    """The explicit 3-pass bf16 dot split (AMW_FFT_DOT_PREC=bf16x3) must
    hold a ~1e-5 relative round-trip error — the accuracy class of lax
    HIGH — so it stays far inside the -90 dBFS chain budget while halving
    the MXU passes vs HIGHEST, under BOTH complex-dot shapes (the default
    3-contraction Karatsuba form and the 4-contraction split4 form — see
    fft_pallas._cdot).  (Mode is read at trace time from the module
    global; the env var only seeds it at import.)"""
    monkeypatch.setattr(fp, "_MODE", "bf16x3")
    monkeypatch.setattr(fp, "_CPLX", cplx)
    g = np.random.default_rng(11)
    n = NFFT - 4096
    x = g.standard_normal((2, n)).astype(np.float32)
    f = np.fft.rfftfreq(NFFT, 1 / 44100.0)
    H = (1.0 + 0.5 * np.cos(f / 2000.0)) * np.exp(-f / 18000.0)
    resp = fp.permute_full_response(H, NFFT)
    got = np.asarray(fp.apply_response(
        jnp.asarray(x), jnp.asarray(resp), NFFT, n_out=n, interpret=True))
    want = np.fft.irfft(np.fft.rfft(x, n=NFFT, axis=-1) * H,
                        n=NFFT, axis=-1)[..., :n]
    err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-9)
    assert err < 3e-5, err


@pytest.mark.parametrize("nfft", [1 << 19, 1 << 20])
def test_small_plan_roundtrip_and_reduce(nfft):
    """C < 128 plans (nfft 2^19/2^20 — the 10-40 s track buckets, where the
    three dominant v1 stages previously fell back to XLA's FFT): the
    composite C stage degenerates to a direct C-point DFT (C2=1) and stage
    A tiles 128//C C-groups per block for lane legality.  Full parity of
    apply_response, roundtrip_multi, and the reduce path vs numpy."""
    assert fp.plan_ok(nfft)
    g = np.random.default_rng(7)
    n = nfft - 5000
    x = g.standard_normal((4, n)).astype(np.float32) * 0.3
    f = np.fft.rfftfreq(nfft, 1 / 44100.0)
    H = (1.0 + 0.4 * np.cos(f / 3000.0)) * np.exp(-f / 15000.0)
    gains = (1.0, 0.7, 0.5, 0.3)
    X = np.fft.rfft(x, n=nfft, axis=-1)

    resp = fp.permute_full_response(H, nfft)
    got = np.asarray(fp.apply_response(
        jnp.asarray(x), jnp.asarray(resp), nfft, n_out=n, interpret=True))
    want = np.fft.irfft(X * H, n=nfft, axis=-1)[..., :n]
    assert np.max(np.abs(got - want)) < 2e-5

    resps = np.stack([fp.permute_full_response(H * gk, nfft)
                      for gk in gains])
    ys = np.asarray(fp.roundtrip_multi(
        jnp.asarray(x), jnp.asarray(resps), nfft, nfft, interpret=True))
    for k, gk in enumerate(gains):
        want_k = np.fft.irfft(X * (H * gk), n=nfft, axis=-1)
        assert np.max(np.abs(ys[k] - want_k)) < 2e-5

    maps = [lambda v: v, lambda v: 0.5 * v, lambda v: v * 0.25,
            lambda v: -v]
    yr = np.asarray(fp.roundtrip_multi_reduce(
        jnp.asarray(x), jnp.asarray(resps), nfft, nfft, maps,
        interpret=True))
    want_r = sum(mp(np.fft.irfft(X * (H * gk), n=nfft, axis=-1))
                 for mp, gk in zip(maps, gains))
    assert np.max(np.abs(yr - want_r)) < 2e-5
