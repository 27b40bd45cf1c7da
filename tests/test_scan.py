"""Chunked-parallel envelope follower vs the sequential oracle."""

import numpy as np
import jax.numpy as jnp

from amw_tpu.ops import scan
from amw_tpu import refimpl

SR = 44100


def test_envelope_exact_short(noise_stereo):
    v = np.abs(noise_stereo[:, :5000])
    att, rel = scan.ar_coefs(SR, 0.004, 0.085)
    got = np.asarray(scan.envelope_follower(jnp.asarray(v), att, rel))
    want = refimpl.envelope_follower(v, SR, 0.004, 0.085)
    assert np.max(np.abs(got - want)) < 1e-5


def test_envelope_chunked_matches_sequential(noise_stereo):
    v = np.abs(noise_stereo)
    att, rel = scan.ar_coefs(SR, 0.0005, 0.002)  # fast ballistics -> small W
    got = np.asarray(
        scan.envelope_follower(jnp.asarray(v), att, rel, min_chunk=1024)
    )
    want = refimpl.envelope_follower(v, SR, 0.0005, 0.002)
    assert np.max(np.abs(got - want)) < 1e-5


def test_envelope_chunked_medium_ballistics(noise_stereo):
    v = np.abs(noise_stereo)
    att, rel = scan.ar_coefs(SR, 0.004, 0.02)
    got = np.asarray(
        scan.envelope_follower(jnp.asarray(v), att, rel, min_chunk=4096)
    )
    want = refimpl.envelope_follower(v, SR, 0.004, 0.02)
    assert np.max(np.abs(got - want)) < 1e-5


def test_warmup_len_sane():
    att, rel = scan.ar_coefs(SR, 0.010, 0.080)
    w = scan.warmup_len(att, rel)
    assert 10 * SR * 0.080 < w < 30 * SR * 0.080


def test_env_pallas_interpret_matches_scan():
    """The Pallas TPU kernel (interpret mode) must match the sequential
    recurrence exactly — guards kernel rewrites (e.g. inner-loop unrolling)."""
    import jax
    from jax.experimental import pallas as pl  # noqa: F401 (presence check)

    from amw_tpu.ops import scan as sc

    rng = np.random.default_rng(5)
    M, T = 128, 2048
    wm = jnp.asarray(np.abs(rng.standard_normal((M, T))).astype(np.float32))
    att, rel = 0.994, 0.9997

    # force interpret mode through the pallas_call by monkey-patching? The
    # kernel builder takes no flag — run it under the CPU interpreter.
    import functools
    from unittest import mock
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        got = np.asarray(sc._env_pallas(wm, att, rel))

    want = np.asarray(sc._env_blocks(wm[..., None, :], att, rel, 8)[..., 0, :])
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_env_pallas_skip_matches_full():
    """skip=k drops the k leading time blocks via output-index clamping."""
    import functools
    from unittest import mock

    import jax
    from jax.experimental import pallas as pl

    from amw_tpu.ops import scan as sc

    rng = np.random.default_rng(7)
    M, T, TB = 128, 4096, 512
    wm = jnp.asarray(np.abs(rng.standard_normal((M, T))).astype(np.float32))
    att, rel = 0.994, 0.9997
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        full = np.asarray(sc._env_pallas(wm, att, rel))
        trimmed = np.asarray(sc._env_pallas(wm, att, rel, skip=3))
    np.testing.assert_array_equal(trimmed, full[:, 3 * TB:])


def test_envelope_follower_pallas_path_matches_cpu():
    """Force the pallas (interpret) chunked path and compare to the plain
    sequential recurrence."""
    import functools
    from unittest import mock

    import jax
    from jax.experimental import pallas as pl

    from amw_tpu.ops import scan as sc

    rng = np.random.default_rng(8)
    n = 300000
    v = np.abs(rng.standard_normal((2, n))).astype(np.float32)
    att, rel = 0.994, 0.9997
    want = np.asarray(sc.envelope_follower(jnp.asarray(v), att, rel))
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)), \
         mock.patch.object(sc, "_use_pallas", lambda: True):
        got = np.asarray(sc.envelope_follower(jnp.asarray(v), att, rel,
                                              min_chunk=4096))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_env_pallas_grouped_matches_single():
    """S>1 interleaved lane groups (the v5e ILP layout) must be bit-equal
    to the single-group kernel: grouping only changes op scheduling."""
    import functools
    from unittest import mock

    from jax.experimental import pallas as pl

    from amw_tpu.ops import scan as sc

    rng = np.random.default_rng(11)
    M, T = 512, 2048
    wm = jnp.asarray(np.abs(rng.standard_normal((M, T))).astype(np.float32))
    att, rel = 0.994, 0.9997
    orig = pl.pallas_call
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(orig, interpret=True)):
        single = np.asarray(sc._env_pallas(wm, att, rel, groups=1))
        grouped = np.asarray(sc._env_pallas(wm, att, rel, groups=4))
        skipped = np.asarray(sc._env_pallas(wm, att, rel, skip=2, groups=4))
    np.testing.assert_array_equal(grouped, single)
    np.testing.assert_array_equal(skipped, single[:, 2 * 512:])


def test_deesser_gain_combine_grouped_kernel_parity():
    """Force the grouped (S=2) de-esser kernel layout via AMW_SCAN_GROUPS
    and a small min_chunk (many windows), against the unfused composition."""
    import os
    from unittest import mock

    from amw_tpu.ops.scan import ar_coefs, deesser_gain_combine

    rng = np.random.default_rng(3)
    sr = 44100
    att, rel = ar_coefs(sr, 0.001, 0.002)  # tiny warm-up -> many windows
    thresh = 10 ** (-6.0 / 20)
    k = 67
    n = 600000
    nv = 550000
    scs = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    y3 = (0.5 * rng.standard_normal((2, n))).astype(np.float32)

    # rows=2, W=C=2048 -> K=293 windows, M=586 -> S=4 (grouped layout)
    from amw_tpu.ops import scan as sc
    assert sc._pick_groups(2 * (-(-n // 2048)))[0] >= 4
    want = np.asarray(deesser_gain_combine(
        jnp.asarray(y3), jnp.asarray(scs), att, rel, thresh, 3.0, k,
        nv=nv, force_pallas=False))
    with mock.patch.dict(os.environ, {"AMW_SCAN_GROUPS": "8"}):
        got = np.asarray(deesser_gain_combine(
            jnp.asarray(y3), jnp.asarray(scs), att, rel, thresh, 3.0, k,
            nv=nv, min_chunk=1024, force_pallas=True, interpret=True))
    err = np.max(np.abs(got[..., :nv] - want[..., :nv]))
    assert err < 1e-5, f"grouped fused deesser err {err}"


def test_deesser_gain_combine_fused_kernel_parity():
    """The fully fused de-esser tail (env -> gain -> box -> combine in one
    Pallas kernel, ops/scan.deesser_gain_combine) matches the composition
    of the individual ops, with and without a valid-length mask."""
    from amw_tpu.ops.scan import ar_coefs, deesser_gain_combine

    rng = np.random.default_rng(0)
    sr = 44100
    # Short release keeps the warm-up window small enough for interpret.
    att, rel = ar_coefs(sr, 0.004, 0.0085)
    thresh = 10 ** (-6.0 / 20)
    ratio, k = 3.0, 67
    n = 40000
    scs = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    y3 = (0.5 * rng.standard_normal((2, n))).astype(np.float32)

    for nv in (None, 31000):
        want = np.asarray(deesser_gain_combine(
            jnp.asarray(y3), jnp.asarray(scs), att, rel, thresh, ratio, k,
            nv=nv, force_pallas=False))
        got = np.asarray(deesser_gain_combine(
            jnp.asarray(y3), jnp.asarray(scs), att, rel, thresh, ratio, k,
            nv=nv, force_pallas=True, interpret=True))
        lim = n if nv is None else nv
        err = np.max(np.abs(got[..., :lim] - want[..., :lim]))
        assert err < 1e-5, f"nv={nv}: fused deesser tail err {err}"


def test_deesser_gain_combine_vmap_and_traced_nv():
    """The fused de-esser kernel under vmap with per-track traced n_valid
    (the micro-batcher's masked-batch shape) matches per-track unfused
    results; also exercises a 96 kHz box width (k=145 > 2*HB tail rows)."""
    import jax

    from amw_tpu.ops.scan import ar_coefs, deesser_gain_combine

    rng = np.random.default_rng(1)
    sr = 96000
    att, rel = ar_coefs(sr, 0.004, 0.004)
    thresh = 10 ** (-6.0 / 20)
    k = max(3, int(sr * 0.0015))
    k += k % 2 == 0
    n, B = 42000, 3
    scb = (0.3 * rng.standard_normal((B, 2, n))).astype(np.float32)
    y3b = (0.5 * rng.standard_normal((B, 2, n))).astype(np.float32)
    nvs = [n, 33000, 39000]

    fv = jax.vmap(lambda a, b, nv: deesser_gain_combine(
        a, b, att, rel, thresh, 3.0, k, nv=nv,
        force_pallas=True, interpret=True))
    got = np.asarray(fv(jnp.asarray(y3b), jnp.asarray(scb),
                        jnp.asarray(nvs)))
    for i, nv in enumerate(nvs):
        want = np.asarray(deesser_gain_combine(
            jnp.asarray(y3b[i]), jnp.asarray(scb[i]), att, rel, thresh,
            3.0, k, nv=jnp.asarray(nv), force_pallas=False))
        err = np.max(np.abs(got[i, ..., :nv] - want[..., :nv]))
        assert err < 1e-5, f"track {i} (nv={nv}): err {err}"
