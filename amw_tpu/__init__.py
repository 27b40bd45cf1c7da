"""amw_tpu — TPU-native audio mastering framework (JAX / XLA / Pallas).

A ground-up rebuild of the capabilities of the `audio-mastering-web` service
("Magic Master") for TPU: the ~17-stage mastering DSP chain compiles into a
single jitted XLA graph (frequency-domain LTI ops, chunked-parallel envelope
scans, fused BS.1770 metering), vmapped over track batches and sharded over a
device mesh with `jax.sharding`.

Package layout:
- ``amw_tpu.ops``      — jittable DSP kernels (the reference's pipeline.py L0).
- ``amw_tpu.models``   — chain runtime, presets, fixed v1 pipeline (L1/L2).
- ``amw_tpu.parallel`` — batching, mesh/sharding utilities.
- ``amw_tpu.utils``    — host-side I/O (WAV codec, export), tracing.
- ``amw_tpu.refimpl``  — numpy/scipy CPU oracle (test baseline & CPU fallback).
- ``amw_tpu.runtime``  — job scheduler & HTTP service shell (L3/L4).
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
