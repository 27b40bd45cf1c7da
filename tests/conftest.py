"""Test harness config: force an 8-device virtual CPU mesh before JAX loads.

Tests never touch the real TPU; multi-chip sharding is validated on the
virtual CPU mesh exactly as the driver's ``dryrun_multichip`` does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests are CPU-only
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize imports jax (registering the TPU plugin)
# before this file runs, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_sine(sr=44100, dur=2.0, freq=440.0, amp=0.5, stereo=True):
    t = np.arange(int(sr * dur)) / sr
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    if stereo:
        return np.stack([x, 0.8 * x])
    return x[None, :]


@pytest.fixture(scope="session")
def sine_stereo():
    return make_sine()


@pytest.fixture(scope="session")
def noise_stereo():
    g = np.random.default_rng(42)
    return (0.3 * g.standard_normal((2, 2 * 44100))).astype(np.float32).clip(-1, 1)
