"""TPU-native Riemann-manifold MCMC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``emilemathieu/RiemannHamiltonianMonteCarlo`` (Girolami & Calderhead 2011,
"Riemann manifold Langevin and Hamiltonian Monte Carlo methods", JRSS-B):
Bayesian logistic regression, stochastic volatility, log-Gaussian Cox and
FitzHugh-Nagumo ODE models sampled by adaptive Metropolis, HMC, MALA,
(simplified) mMALA, IWLS, auxiliary-variable Gibbs and (Student-t) RMHMC.

Design (see SURVEY.md section 7): the reference fuses model math into each
sampler file; here the decomposition is orthogonal:

* :mod:`~riemannhamiltonianmontecarlo_tpu.models` -- log-posteriors with
  closed-form gradients / Fisher metrics / metric-derivative contractions.
* :mod:`~riemannhamiltonianmontecarlo_tpu.samplers` -- batched transition
  kernels operating on a leading chain axis (thousands of chains per chip).
* :mod:`~riemannhamiltonianmontecarlo_tpu.parallel` -- `lax.scan` chain
  runner, `shard_map` over a device mesh, cross-host collectives.
* :mod:`~riemannhamiltonianmontecarlo_tpu.diagnostics` -- ESS (Geyer
  initial-monotone estimator, semantics-compatible with the reference),
  split R-hat, summaries.
* :mod:`~riemannhamiltonianmontecarlo_tpu.ops` -- batched small-matrix
  linear algebra (chain-vectorized Cholesky / triangular solves), Pallas
  TPU kernels for the hot ops.

Import alias convention: ``import riemannhamiltonianmontecarlo_tpu as rhmc``.
"""

__version__ = "0.1.0"

from riemannhamiltonianmontecarlo_tpu import diagnostics, models, ops, parallel, samplers, utils

__all__ = [
    "models",
    "samplers",
    "ops",
    "parallel",
    "diagnostics",
    "utils",
    "__version__",
]
