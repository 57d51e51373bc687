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

    # -- position-dependent manifold interface (mMALA, ``LGC_mMALA_LV.m``) --
    #
    # The exact Fisher metric is G(x) = Sigma^{-1} + diag(m e^x), so
    # dG_d = m e^{x_d} E_dd is rank-one *diagonal*: every contraction a
    # manifold sampler needs is elementwise or one matvec -- no (D, D, D)
    # tensor even at D = 4096.

    def metric(self, x: Array) -> Array:
        """G(x) = Sigma^{-1} + diag(m e^x).  (..., D) -> (..., D, D).

        NOTE: materializes a dense (D, D) per chain; at D = 4096 use few
        chains (the reference runs one, ``LGC_mMALA_LV.m``)."""
        diag = self.m * jnp.exp(x)
        eye = jnp.eye(self.dim, dtype=x.dtype)
        return self.sigma_inv + diag[..., None] * eye

    def dg_cache(self, x: Array) -> Array:
        """(..., D) diagonal weights m e^x;  dG_d = m e^{x_d} E_dd."""
        return self.m * jnp.exp(x)

    def dg_bilinear(self, x: Array, u: Array, v: Array, *, cache: Array | None = None) -> Array:
        c = self.dg_cache(x) if cache is None else cache
        return c * u * v

    def dg_trace(self, x: Array, mmat: Array, *, cache: Array | None = None) -> Array:
        c = self.dg_cache(x) if cache is None else cache
        return c * jnp.diagonal(mmat, axis1=-2, axis2=-1)

    def dg_dotted(self, x: Array, mmat: Array, *, cache: Array | None = None) -> Array:
        """[sum_e (M dG_e M)[:, e]] = M @ (c * diag M)."""
        c = self.dg_cache(x) if cache is None else cache
        weights = c * jnp.diagonal(mmat, axis1=-2, axis2=-1)
        return jnp.einsum("...ie,...e->...i", mmat, weights, precision=_PREC)

    def manifold_state(self, x: Array):
        from riemannhamiltonianmontecarlo_tpu.models.logreg import ManifoldState

        logp, grad = self.logp_and_grad(x)
        return ManifoldState(logp, grad, self.metric(x), self.dg_cache(x))

    # -- whitened view (MALA w/ transformation, ``LGC_MALA_Transient.m``) ---

    def whitened(self):
        """Model over gamma with x = mu + L gamma, L = chol(Sigma).

        The reference's "MALA with transformation" samples in this
        whitened parametrization (``LGC_MALA_Transient.m:32-37``); the
        Jacobian is constant so log densities differ by a constant.
        """
        sigma_np = grid_covariance(self.n, self.s, self.b)
        chol = jnp.asarray(
            np.linalg.cholesky(sigma_np + 1e-10 * np.eye(self.dim)), jnp.float32
        )
        model = self

        class _Whitened:
            dim = model.dim

            def to_x(self, gamma):
                return model.mu + jnp.matmul(gamma, chol.T, precision=_PREC)

            def logp(self, gamma):
                return model.logp(self.to_x(gamma))

            def grad(self, gamma):
                gx = model.grad(self.to_x(gamma))
                return jnp.matmul(gx, chol, precision=_PREC)

            def logp_and_grad(self, gamma):
                lp, gx = model.logp_and_grad(self.to_x(gamma))
                return lp, jnp.matmul(gx, chol, precision=_PREC)

        return _Whitened()
