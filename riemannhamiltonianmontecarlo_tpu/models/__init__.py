"""Model zoo: log-posteriors with gradients and Fisher-metric geometry."""

from riemannhamiltonianmontecarlo_tpu.models import datasets
from riemannhamiltonianmontecarlo_tpu.models.base import (
    FunctionModel,
    ManifoldModel,
    Model,
    autodiff_manifold,
)
from riemannhamiltonianmontecarlo_tpu.models.datasets import (
    Dataset,
    load_dataset,
    synthetic_logreg,
)
from riemannhamiltonianmontecarlo_tpu.models.logreg import LogisticRegression, ManifoldState

__all__ = [
    "datasets",
    "Dataset",
    "load_dataset",
    "synthetic_logreg",
    "LogisticRegression",
    "ManifoldState",
    "Model",
    "ManifoldModel",
    "FunctionModel",
    "autodiff_manifold",
]
