"""Stochastic volatility model + two-block sampler.

Known-truth verification (SURVEY.md section 4.5): data simulated at
(beta, sigma, phi) = (0.65, 0.15, 0.98) must yield a posterior
concentrated near the truth; gradients are cross-checked against
autodiff of the log densities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riemannhamiltonianmontecarlo_tpu.models import stochvol
from riemannhamiltonianmontecarlo_tpu.parallel import run
from riemannhamiltonianmontecarlo_tpu.samplers import stochvol as sv_kernel


@pytest.fixture(scope="module")
def model():
    y, _ = stochvol.generate_data(seed=3, num_obs=300)
    return stochvol.StochVolModel(jnp.asarray(y, jnp.float32))


def test_latent_grad_matches_autodiff(model):
    key = jax.random.key(0)
    x = 0.3 * jax.random.normal(key, (4, model.num_obs))
    theta = jnp.tile(model.unconstrain(jnp.float32(0.6), jnp.float32(0.2), jnp.float32(0.9)), (4, 1))
    got = model.latent_grad(x, theta)
    ad = jax.vmap(jax.grad(model.latent_logp), (0, 0))(x, theta)
    np.testing.assert_allclose(got, ad, rtol=2e-3, atol=2e-3)


def test_latent_metric_matches_quadratic_form(model):
    """x^T iC x must equal the AR(1) quadratic terms of the log density."""
    theta = model.unconstrain(jnp.float32(0.6), jnp.float32(0.2), jnp.float32(0.9))[None]
    diag, off = model.ar1_precision(theta)
    key = jax.random.key(1)
    x = jax.random.normal(key, (1, model.num_obs))
    from riemannhamiltonianmontecarlo_tpu.ops import tridiag

    quad = jnp.sum(x * tridiag.matvec(diag, off, x), axis=-1)
    sigma, phi = 0.2, 0.9
    xn = np.asarray(x[0], np.float64)
    expected = (
        xn[0] ** 2 * (1 - phi**2) / sigma**2
        + np.sum((xn[1:] - phi * xn[:-1]) ** 2) / sigma**2
    )
    np.testing.assert_allclose(float(quad[0]), expected, rtol=1e-3)


def test_hyper_metric_pd_and_grad_finite(model):
    theta = jnp.stack(
        [
            model.unconstrain(jnp.float32(0.5), jnp.float32(0.5), jnp.float32(0.5)),
            model.unconstrain(jnp.float32(0.65), jnp.float32(0.15), jnp.float32(0.98)),
        ]
    )
    g = model.hyper_metric(theta)
    eig = np.linalg.eigvalsh(np.asarray(g, np.float64))
    assert (eig > 0).all(), eig
    hm = model.hyper_manifold(jnp.zeros((2, model.num_obs)))
    grads = hm.grad(theta)
    assert np.isfinite(np.asarray(grads)).all()


def test_posterior_concentrates_near_truth(model):
    cfg = sv_kernel.StochVolConfig(latent_num_leapfrog=20, latent_step_size=0.15)
    kernel = sv_kernel.build(model, cfg)
    c = 16
    init = jnp.tile(jnp.asarray([0.5, 0.5, 0.5], jnp.float32), (c, 1))
    res = run(kernel, jax.random.key(2), init, num_samples=300, burn_in=200)
    samples = np.asarray(res.samples)  # (C, S, 3) constrained
    assert np.isfinite(samples).all()
    beta_m, sigma_m, phi_m = samples.reshape(-1, 3).mean(0)
    # T=300 posterior is wide; generous boxes around the truth.
    assert 0.4 < beta_m < 0.95, beta_m
    assert 0.03 < sigma_m < 0.45, sigma_m
    assert 0.55 < phi_m < 1.0, phi_m
    assert float(res.accept_rate) > 0.4


@pytest.mark.parametrize("method", ["hmc", "mala", "mmala"])
def test_comparator_methods_run(model, method):
    """HMC/MALA two-block variants (Tables 8-9) stay finite and accept."""
    cfg = sv_kernel.StochVolConfig(
        method=method,
        latent_num_leapfrog=10,
        latent_step_size={"hmc": 0.03, "mala": 0.02, "mmala": 0.07}[method],
        hyper_step_size={"hmc": 0.015, "mala": 0.005, "mmala": 1.0}[method],
        hyper_num_leapfrog=10,
    )
    kernel = sv_kernel.build(model, cfg)
    init = jnp.tile(jnp.asarray([0.5, 0.5, 0.5], jnp.float32), (8, 1))
    res = run(kernel, jax.random.key(7), init, num_samples=60, burn_in=40)
    samples = np.asarray(res.samples)
    assert np.isfinite(samples).all()
    assert float(res.accept_rate) > 0.05


def test_two_block_info_semantics(model):
    """Sweep-level Info (VERDICT round-4 item 7): with the latent step tiny
    (block accepts ~always) and the hyper step enormous (block rejects
    ~always), ``accepted`` must sit near 0.5 -- the mean over the two
    blocks -- not near 0 (the old hyper-only semantics)."""
    cfg = sv_kernel.StochVolConfig(
        method="mala", latent_step_size=1e-5, hyper_step_size=50.0)
    kernel = sv_kernel.build(model, cfg)
    init = jnp.tile(jnp.asarray([0.5, 0.5, 0.5], jnp.float32), (32, 1))
    state = kernel.init(init)
    accepted = []
    for i in range(20):
        state, info = jax.jit(kernel.step)(jax.random.key(i), state)
        assert info.accepted.shape == (32,)
        accepted.append(np.asarray(info.accepted))
    mean_acc = float(np.mean(accepted))
    assert 0.4 < mean_acc < 0.62, mean_acc  # latent ~1, hyper ~0 -> ~0.5
