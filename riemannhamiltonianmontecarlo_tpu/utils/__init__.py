"""Utilities: configuration presets, checkpointing, timing."""

from riemannhamiltonianmontecarlo_tpu.utils.config import (
    ExperimentConfig,
    reference_preset,
)
from riemannhamiltonianmontecarlo_tpu.utils.checkpoint import load_state, save_state
from riemannhamiltonianmontecarlo_tpu.utils.init import (
    default_init,
    jittered_init,
    map_estimate,
)

__all__ = [
    "ExperimentConfig",
    "reference_preset",
    "default_init",
    "jittered_init",
    "map_estimate",
    "save_state",
    "load_state",
]
