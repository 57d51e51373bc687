"""Chain-batched small-matrix linear algebra.

RMHMC / mMALA / IWLS on the reference workloads need Cholesky
factorizations, triangular solves, PD inverses and log-determinants of
*tiny* (D = 7..25) matrices, but batched over thousands of chains
(reference does one D x D LAPACK call per step, ``code/rmhmc.py:58-60``).

MXU tiles are 128x128, so per-matrix LAPACK-style kernels waste the
hardware at these sizes.  The right TPU mapping is to keep the chain axis
vectorized and *unroll* the factorization over the static dimension D:
each of the D outer-product elimination steps is a fused elementwise op
over the whole (chains, D, D) batch, executed on the VPU with no dynamic
control flow.  XLA fuses the unrolled steps into a handful of kernels.

``method="xla"`` falls back to the built-in batched primitives
(``jnp.linalg.cholesky`` / ``jax.lax.linalg.triangular_solve``) for large
D (LGC's 4096-dim covariance factorization uses those directly).

All functions accept arbitrary leading batch axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Full f32 multiply precision: these factors feed MH log-density ratios.
PRECISION = jax.lax.Precision.HIGHEST

# Above this dimension the unrolled elimination emits too many HLO ops and
# the blocked XLA primitives win; below it the unrolled form is pure VPU.
UNROLL_MAX_DIM = 48


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _auto_pallas(a: Array, method: str | None) -> bool:
    """Auto-select the chains-last pallas kernel on TPU for 3-D batches.

    Measured end-to-end on the RMHMC step (v5e): 8-15% faster than the
    unrolled-XLA path at 2048-8192 chains, identical results."""
    if method == "pallas":
        return a.ndim == 3
    return (
        method is None
        and a.ndim == 3
        and a.shape[-1] <= UNROLL_MAX_DIM
        and a.shape[0] >= 256
        and _on_tpu()
    )


def _use_unrolled(d: int, method: str | None) -> bool:
    if method == "unrolled":
        return True
    if method == "xla":
        return False
    return d <= UNROLL_MAX_DIM


def cholesky(a: Array, *, method: str | None = None) -> Array:
    """Lower Cholesky factor of PD matrices.  (..., D, D) -> (..., D, D).

    method: None (auto), "unrolled", "xla", or "pallas" (chains-last TPU
    kernel, requires a 3-D (C, D, D) batch -- see ops/pallas_linalg.py).
    """
    d = a.shape[-1]
    if _auto_pallas(a, method):
        from riemannhamiltonianmontecarlo_tpu.ops import pallas_linalg

        return pallas_linalg.cholesky(a)
    if not _use_unrolled(d, method):
        return jnp.linalg.cholesky(a)
    idx = jnp.arange(d)
    rem = a
    cols = []
    for j in range(d):
        diag = jnp.sqrt(rem[..., j, j])
        col = rem[..., :, j] / diag[..., None]
        col = jnp.where(idx >= j, col, jnp.zeros_like(col))
        cols.append(col)
        rem = rem - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def solve_lower_triangular(l: Array, b: Array, *, method: str | None = None) -> Array:
    """Solve L y = b with L lower triangular.  b: (..., D) or (..., D, K)."""
    d = l.shape[-1]
    vector = b.ndim == l.ndim - 1
    if vector:
        b = b[..., None]
    if not _use_unrolled(d, method):
        y = jax.lax.linalg.triangular_solve(l, b, left_side=True, lower=True)
    else:
        rows = []
        for i in range(d):
            s = b[..., i, :]
            for k in range(i):
                s = s - l[..., i, k, None] * rows[k]
            rows.append(s / l[..., i, i, None])
        y = jnp.stack(rows, axis=-2)
    return y[..., 0] if vector else y


def solve_upper_from_lower(l: Array, b: Array, *, method: str | None = None) -> Array:
    """Solve L^T y = b (back substitution on the transpose of lower L)."""
    d = l.shape[-1]
    vector = b.ndim == l.ndim - 1
    if vector:
        b = b[..., None]
    if not _use_unrolled(d, method):
        y = jax.lax.linalg.triangular_solve(
            l, b, left_side=True, lower=True, transpose_a=True
        )
    else:
        rows: list = [None] * d
        for i in reversed(range(d)):
            s = b[..., i, :]
            for k in range(i + 1, d):
                s = s - l[..., k, i, None] * rows[k]
            rows[i] = s / l[..., i, i, None]
        y = jnp.stack(rows, axis=-2)
    return y[..., 0] if vector else y


def cho_solve(l: Array, b: Array, *, method: str | None = None) -> Array:
    """Solve A x = b given the lower Cholesky factor L of A."""
    return solve_upper_from_lower(l, solve_lower_triangular(l, b, method=method), method=method)


def solve_psd(a: Array, b: Array, *, method: str | None = None) -> Array:
    """Solve A x = b for symmetric PD A via Cholesky."""
    if b.ndim == 2 and _auto_pallas(a, method):
        from riemannhamiltonianmontecarlo_tpu.ops import pallas_linalg

        x, _ = pallas_linalg.chol_solve_logdet(a, b)
        return x
    return cho_solve(cholesky(a, method=method), b, method=method)


def inv_psd(a: Array, *, method: str | None = None) -> Array:
    """Inverse of symmetric PD matrices via Cholesky."""
    l = cholesky(a, method=method)
    return inv_psd_from_chol(l, method=method)


def inv_psd_from_chol(l: Array, *, method: str | None = None) -> Array:
    """A^{-1} = L^{-T} L^{-1} from the lower Cholesky factor."""
    d = l.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=l.dtype), l.shape)
    linv = solve_lower_triangular(l, eye, method=method)
    return jnp.matmul(jnp.swapaxes(linv, -1, -2), linv, precision=PRECISION)


def logdet_from_chol(l: Array) -> Array:
    """log|A| = 2 sum log diag L.  (..., D, D) -> (...,)."""
    diag = jnp.diagonal(l, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def mvn_sample(key: Array, chol_l: Array, shape: tuple[int, ...] = ()) -> Array:
    """Sample z ~ N(0, L L^T) as L @ eps.

    NOTE the reference Python draws ``randn(1,D) @ np.linalg.cholesky(G)``
    (``code/rmhmc.py:80``) whose covariance is L^T L != G -- a port bug;
    the MATLAB oracle uses upper-triangular ``chol`` so its draw *is*
    N(0, G) (``BLR_RMHMC.m``).  This framework follows the correct MATLAB
    contract: momentum ~ N(0, G).
    """
    d = chol_l.shape[-1]
    eps = jax.random.normal(key, (*shape, *chol_l.shape[:-2], d), dtype=chol_l.dtype)
    return jnp.einsum("...ab,...b->...a", chol_l, eps, precision=PRECISION)
