"""Batching, device mesh, and sharding utilities (SURVEY §2.4 equivalents)."""

from .batch import batch_master, make_batch_fn, pad_to_bucket  # noqa: F401
from .mesh import make_mesh, shard_batch  # noqa: F401
