"""Log-Gaussian Cox model + constant-metric preconditioned HMC.

Small grid (16x16 => D=256) for CPU test speed; the math is
grid-size-independent.  Known-truth check: posterior mean field must
correlate strongly with the generating latent field.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riemannhamiltonianmontecarlo_tpu.models import lgc
from riemannhamiltonianmontecarlo_tpu.parallel import run
from riemannhamiltonianmontecarlo_tpu.samplers import phmc


@pytest.fixture(scope="module")
def small_model():
    y, x_true = lgc.generate_data(seed=5, n=16)
    return lgc.LGCModel(y, n=16), x_true


def test_covariance_structure():
    sigma = lgc.grid_covariance(8, 1.91, 1 / 33)
    assert sigma.shape == (64, 64)
    np.testing.assert_allclose(np.diag(sigma), 1.91)
    # symmetric, decaying with distance, PD
    np.testing.assert_allclose(sigma, sigma.T)
    assert np.linalg.eigvalsh(sigma).min() > 0
    assert sigma[0, 1] > sigma[0, 7]


def test_grad_matches_autodiff(small_model):
    model, _ = small_model
    key = jax.random.key(0)
    x = model.mu + 0.5 * jax.random.normal(key, (3, model.dim))
    ad = jax.vmap(jax.grad(model.logp))(x)
    np.testing.assert_allclose(model.grad(x), ad, rtol=5e-3, atol=5e-3)
    lp, g = model.logp_and_grad(x)
    np.testing.assert_allclose(lp, model.logp(x), rtol=1e-5)
    np.testing.assert_allclose(g, model.grad(x), rtol=1e-5, atol=1e-5)


def test_constant_metric_matches_reference_formula(small_model):
    model, _ = small_model
    sigma = lgc.grid_covariance(16, model.s, model.b)
    g_ref = np.linalg.inv(sigma) + np.diag(
        model.m * np.exp(model.mu + np.diag(sigma))
    )
    rebuilt = np.asarray(model.metric_chol, np.float64)
    np.testing.assert_allclose(rebuilt @ rebuilt.T, g_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(model.metric_inv, np.float64) @ g_ref,
        np.eye(model.dim),
        atol=2e-3,
    )


def test_lgc_phmc_posterior_field(small_model):
    model, x_true = small_model
    kernel = phmc.build(
        model,
        model.metric_chol,
        model.metric_inv,
        phmc.PHMCConfig(step_size=0.1, num_leapfrog=15),
    )
    c = 8
    init = jnp.tile(model.prior_mean(), (c, 1))
    res = run(kernel, jax.random.key(1), init, num_samples=250, burn_in=150)
    assert float(res.accept_rate) > 0.5
    assert int(res.divergences) == 0
    mean_field = np.asarray(res.samples).reshape(-1, model.dim).mean(0)
    corr = np.corrcoef(mean_field, x_true)[0, 1]
    assert corr > 0.5, corr  # posterior mean tracks the generating field
