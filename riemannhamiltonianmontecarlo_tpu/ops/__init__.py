"""Batched numerical ops: chain-vectorized linalg, samplers, Pallas TPU kernels."""

from riemannhamiltonianmontecarlo_tpu.ops.gig import sample_gig_half
from riemannhamiltonianmontecarlo_tpu.ops.truncnorm import truncated_normal_onesided
from riemannhamiltonianmontecarlo_tpu.ops.linalg import (
    cho_solve,
    cholesky,
    inv_psd,
    inv_psd_from_chol,
    logdet_from_chol,
    mvn_sample,
    solve_lower_triangular,
    solve_psd,
    solve_upper_from_lower,
)

__all__ = [
    "cholesky",
    "cho_solve",
    "solve_lower_triangular",
    "solve_upper_from_lower",
    "solve_psd",
    "inv_psd",
    "inv_psd_from_chol",
    "logdet_from_chol",
    "mvn_sample",
    "sample_gig_half",
    "truncated_normal_onesided",
]
