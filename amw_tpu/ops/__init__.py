"""Jittable DSP kernels (channel-major ``f32[..., N]``, time on last axis)."""

from . import basic, design, fdfilter, meters, scan  # noqa: F401
