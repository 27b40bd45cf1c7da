"""CPU oracle: numpy/scipy reimplementation of the reference DSP semantics.

This package is the framework's *behavioral specification executable*: every
TPU op is validated against these functions, and the benchmark's "CPU
baseline" timing comes from here.  Semantics follow
``/root/reference/backend/app/pipeline.py`` (cited per function) but the code
is written fresh, vectorized, and channel-major ``[C, N]`` like the TPU path.
"""

from .pipeline import *  # noqa: F401,F403
