"""Log-Gaussian Cox point process on an N x N grid (paper sec. 10).

Model (``Log_Gaussian_Cox/RMHMC/LGC_RMHMC_LV.m``):

* hyperparameters s = 1.91, b = 1/33, mu = log(126) - s/2, m = 1/N^2
  (``:21-25``);
* GP prior covariance over unit-square grid coordinates
  ``Sigma_ij = s exp(-dist_ij / (b N))``  (``:58-79``);
* Poisson-count log joint ``y^T x - sum m e^x - (x-mu)^T Sigma^{-1}
  (x-mu)/2``  (``:86``);
* **constant-metric approximation**: G = Sigma^{-1} + diag(m exp(mu +
  diag Sigma)) -- the Fisher metric evaluated at the prior mean
  (``:95-101``) -- making the RMHMC leapfrog exact/explicit with a fixed
  dense preconditioner (the log-det and trace terms drop, ``:154-196``).

D = N^2 = 4096 is the framework's "long-context" workload (SURVEY.md
section 5): one-time O(D^3) dense factorizations (XLA batched Cholesky on
the MXU), O(C D^2) matvecs per leapfrog step batched over chains.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

REFERENCE_MAT = Path(
    "/root/reference/code/authors_code/Log_Gaussian_Cox/RMHMC/TestData64.mat"
)
_PREC = jax.lax.Precision.HIGHEST


def grid_covariance(n: int, s: float, b: float) -> np.ndarray:
    """Sigma_ij = s exp(-||coord_i - coord_j|| / (b n)) on the unit square
    (``LGC_RMHMC_LV.m:58-79``; meshgrid order => row-major over (y, x))."""
    r = np.linspace(0.0, 1.0, n)
    xs, ys = np.meshgrid(r, r)
    coords = np.stack([xs.ravel(), ys.ravel()], axis=1)  # (n^2, 2)
    diff = coords[:, None, :] - coords[None, :, :]
    dist = np.sqrt((diff**2).sum(-1))
    return s * np.exp(-dist / (b * n))


def generate_data(
    seed: int = 0, n: int = 64, s: float = 1.91, b: float = 1.0 / 33.0
) -> tuple[np.ndarray, np.ndarray]:
    """Simulate (y counts, x_true) from the model (known-truth pattern)."""
    rng = np.random.default_rng(seed)
    mu = np.log(126.0) - s / 2.0
    m = 1.0 / n**2
    sigma = grid_covariance(n, s, b)
    chol = np.linalg.cholesky(sigma + 1e-10 * np.eye(n * n))
    x = mu + chol @ rng.normal(size=n * n)
    y = rng.poisson(m * np.exp(x)).astype(np.float64)
    return y, x


def load_data(path: str | Path | None = None, n: int = 64):
    """The authors' TestData64.mat (fields Y counts, X latents) if present."""
    p = Path(path) if path is not None else REFERENCE_MAT
    if not p.exists():
        return generate_data(n=n)
    from scipy.io import loadmat

    data = loadmat(p)
    return data["Y"].reshape(-1), data["X"].reshape(-1)


@dataclasses.dataclass(frozen=True)
class LGCModel:
    """Latent-field posterior with precomputed dense GP algebra.

    All per-position methods are batched over leading chain axes.
    """

    y: Array  # (D,)
    n: int = 64
    s: float = 1.91
    b: float = 1.0 / 33.0

    def __post_init__(self):
        object.__setattr__(self, "y", jnp.asarray(self.y, jnp.float32))
        n, s = self.n, self.s
        mu = float(np.log(126.0) - s / 2.0)
        m = 1.0 / n**2
        sigma_np = grid_covariance(n, s, self.b)
        # One-time dense algebra in float64 on host (the reference uses
        # lightspeed chol2inv, ``:81``); results cast to f32 for the chip.
        sigma_inv_np = np.linalg.inv(sigma_np)
        g_np = sigma_inv_np + np.diag(m * np.exp(mu + np.diag(sigma_np)))
        chol_g_np = np.linalg.cholesky(g_np)
        inv_g_np = np.linalg.inv(g_np)
        object.__setattr__(self, "mu", mu)
        object.__setattr__(self, "m", m)
        object.__setattr__(self, "sigma_diag", jnp.asarray(np.diag(sigma_np), jnp.float32))
        object.__setattr__(self, "sigma_inv", jnp.asarray(sigma_inv_np, jnp.float32))
        object.__setattr__(self, "metric_chol", jnp.asarray(chol_g_np, jnp.float32))
        object.__setattr__(self, "metric_inv", jnp.asarray(inv_g_np, jnp.float32))

    @property
    def dim(self) -> int:
        return self.n * self.n

    def logp(self, x: Array) -> Array:
        """y^T x - sum m e^x - (x-mu)^T Sigma^{-1} (x-mu)/2 (``:86``)."""
        centered = x - self.mu
        quad = jnp.einsum(
            "...a,ab,...b->...", centered, self.sigma_inv, centered, precision=_PREC
        )
        return (
            jnp.sum(x * self.y, axis=-1)
            - self.m * jnp.sum(jnp.exp(x), axis=-1)
            - 0.5 * quad
        )

    def grad(self, x: Array) -> Array:
        """y - m e^x - Sigma^{-1}(x - mu) (``:127``)."""
        centered = x - self.mu
        return (
            self.y
            - self.m * jnp.exp(x)
            - jnp.matmul(centered, self.sigma_inv, precision=_PREC)
        )

    def logp_and_grad(self, x: Array) -> tuple[Array, Array]:
        centered = x - self.mu
        sx = jnp.matmul(centered, self.sigma_inv, precision=_PREC)
        expx = jnp.exp(x)
        logp = (
            jnp.sum(x * self.y, axis=-1)
            - self.m * jnp.sum(expx, axis=-1)
            - 0.5 * jnp.sum(centered * sx, axis=-1)
        )
        return logp, self.y - self.m * expx - sx

    def prior_mean(self) -> Array:
        return jnp.full((self.dim,), self.mu, jnp.float32)
