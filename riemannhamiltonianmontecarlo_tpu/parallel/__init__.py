"""Execution layer: chain runner, device mesh, collectives, adaptation."""

from riemannhamiltonianmontecarlo_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_chains,
)
from riemannhamiltonianmontecarlo_tpu.parallel.runner import RunResult, run

__all__ = [
    "CHAIN_AXIS",
    "make_mesh",
    "chain_sharding",
    "replicated",
    "shard_chains",
    "initialize_distributed",
    "run",
    "RunResult",
]
