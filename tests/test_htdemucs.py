"""HTDemucs-class separator: shapes, jit, segmented inference (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amw_tpu.models.htdemucs_jax import (HTDemucs, HTDemucsConfig,
                                         init_params, separate)

TINY = HTDemucsConfig(depth=2, base_channels=8, nfft=256, hop=64,
                      t_layers=1, t_dim=32, t_heads=2,
                      segment_samples=1024)


def test_forward_shapes():
    model = HTDemucs(TINY)
    x = jnp.zeros((1, 2, 1024), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 2, 1024)  # [B, stems, C, T]
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_jits_and_responds_to_input():
    model = HTDemucs(TINY)
    g = np.random.default_rng(0)
    x = jnp.asarray(0.1 * g.standard_normal((1, 2, 1024)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    f = jax.jit(lambda p, a: model.apply(p, a))
    o1 = np.asarray(f(params, x))
    o2 = np.asarray(f(params, 2.0 * x))
    assert np.all(np.isfinite(o1)) and np.all(np.isfinite(o2))
    assert np.max(np.abs(o1 - o2)) > 1e-7  # not constant


def test_segmented_separation():
    model = HTDemucs(TINY)
    g = np.random.default_rng(1)
    mix = (0.2 * g.standard_normal((2, 3000))).astype(np.float32)
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 2, TINY.segment_samples)))
    stems = separate(model, params, mix)
    assert stems.shape == (4, 2, 3000)
    assert np.all(np.isfinite(stems))
