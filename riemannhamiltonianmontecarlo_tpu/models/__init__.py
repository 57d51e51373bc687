"""Model zoo: log-posteriors with gradients and Fisher-metric geometry."""

from riemannhamiltonianmontecarlo_tpu.models import datasets, fhn, lgc, stochvol
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

from riemannhamiltonianmontecarlo_tpu.models.fhn import FHNModel
from riemannhamiltonianmontecarlo_tpu.models.lgc import LGCJointModel, LGCModel
from riemannhamiltonianmontecarlo_tpu.models.stochvol import StochVolModel

__all__ = [
    "datasets",
    "fhn",
    "lgc",
    "stochvol",
    "FHNModel",
    "LGCModel",
    "LGCJointModel",
    "StochVolModel",
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
