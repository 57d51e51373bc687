"""Chain initialization helpers.

The reference initializes chains at w = 0 or 1e-3 (``code/hmc.py:27``,
``code/rmhmc.py:27``) and relies on a long burn-in to escape -- at the
reference HMC constants (eps = 0.14, L = 100) the origin is a rejection
trap (dH > 150 for *any* trajectory from w = 0 on the australian data),
escaped only by rare lucky momentum draws during the 1000-step burn-in.
With thousands of parallel chains and short warmups, the framework
instead starts chains at a cheap MAP estimate plus per-chain jitter.
Posterior correctness does not depend on the starting point; parity
presets can still pass ``zeros``/``1e-3`` explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def map_estimate(model, w0: Array | None = None, num_steps: int = 500, lr: float = 0.01) -> Array:
    """Cheap MAP estimate of the log joint.

    Models exposing a Fisher ``metric`` get Newton/IWLS ascent
    ``w += G(w)^{-1} grad(w)`` (for BLR, G is exactly the Hessian of the
    negative log joint, so this is standard IWLS and converges in a
    handful of steps regardless of the data scale).  The gradient-ascent
    fallback's fixed ``lr`` is NOT safe for arbitrary curvature: on
    german credit the loglik Hessian has eigenvalues ~3e2, so lr = 0.01
    exceeds the 2/L stability bound and the iteration diverges -- which
    is why the metric path exists.
    """
    w = jnp.zeros((model.dim,)) if w0 is None else w0

    if hasattr(model, "metric"):
        def newton(_, w):
            g = model.metric(w)
            return w + jnp.linalg.solve(g, model.grad(w))

        return jax.lax.fori_loop(0, min(num_steps, 25), newton, w)

    def body(_, w):
        return w + lr * model.grad(w)

    return jax.lax.fori_loop(0, num_steps, body, w)


def jittered_init(key: Array, center: Array, num_chains: int, scale: float = 0.1) -> Array:
    """(C, D) starting positions: center + scale * N(0, I) per chain."""
    noise = jax.random.normal(key, (num_chains, center.shape[-1]), center.dtype)
    return center[None, :] + scale * noise


def default_init(model, key: Array, num_chains: int, *, scale: float = 0.1) -> Array:
    """MAP + jitter in one call."""
    return jittered_init(key, map_estimate(model), num_chains, scale)
