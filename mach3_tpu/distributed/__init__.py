from .mesh import (
    CHAIN_AXIS,
    EVENT_AXIS,
    chain_state_sharding,
    make_mesh,
    shard_fit_model,
)

__all__ = [
    "CHAIN_AXIS",
    "EVENT_AXIS",
    "chain_state_sharding",
    "make_mesh",
    "shard_fit_model",
]
