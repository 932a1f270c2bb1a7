"""Core infrastructure: config pytrees, RNG, mesh/sharding, checkpointing."""

from danet_densepose2smpl_tpu.core.config import (  # noqa: F401
    Config,
    DaNetConfig,
    RefinementConfig,
    SolverConfig,
    TrainConfig,
    default_config,
    load_config,
)
