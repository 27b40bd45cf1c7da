"""Chain runtime and fixed pipelines (the reference's L1/L2 layers)."""

from .chain import (  # noqa: F401
    MODULE_BUILDERS,
    CompiledChain,
    compile_chain,
    default_chain_config,
)
from .pipeline_v1 import build_v1_pipeline, master_v1  # noqa: F401
