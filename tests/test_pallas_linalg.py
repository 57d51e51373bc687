"""Pallas chains-last linalg kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riemannhamiltonianmontecarlo_tpu.ops import pallas_linalg as plin


@pytest.fixture(scope="module", params=[(5, 7), (200, 15), (130, 25)])
def batch(request):
    c, d = request.param
    rng = np.random.default_rng(c + d)
    a = rng.normal(size=(c, d, d))
    g = jnp.asarray(a @ np.swapaxes(a, -1, -2) + d * np.eye(d), jnp.float32)
    b = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    return g, b


def test_pallas_cholesky(batch):
    g, _ = batch
    l = np.asarray(plin.cholesky(g, interpret=True))
    expected = np.linalg.cholesky(np.asarray(g, np.float64))
    np.testing.assert_allclose(l, expected, rtol=2e-4, atol=2e-4)
    assert np.allclose(np.triu(l, 1), 0.0)


def test_pallas_fused_solve_logdet(batch):
    g, b = batch
    x, ld = plin.chol_solve_logdet(g, b, interpret=True)
    g64 = np.asarray(g, np.float64)
    xe = np.linalg.solve(g64, np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), xe, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(ld), np.linalg.slogdet(g64)[1], rtol=2e-4, atol=2e-3
    )


def test_linalg_dispatch_pallas():
    from riemannhamiltonianmontecarlo_tpu import ops

    rng = np.random.default_rng(3)
    a = rng.normal(size=(40, 6, 6))
    g = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 6 * np.eye(6), jnp.float32)
    b = jnp.asarray(rng.normal(size=(40, 6)), jnp.float32)
    np.testing.assert_allclose(
        ops.cholesky(g, method="pallas"), ops.cholesky(g, method="unrolled"),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        ops.solve_psd(g, b, method="pallas"), ops.solve_psd(g, b, method="unrolled"),
        rtol=2e-3, atol=2e-3,
    )
