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
