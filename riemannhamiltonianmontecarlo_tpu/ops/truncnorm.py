"""Batched one-sided truncated-normal sampling.

The reference draws latent-variable truncated normals one scalar at a
time with ``scipy.stats.truncnorm.rvs`` (``code/gibbs_sampler.py:86-93,
117-125``) or MATLAB inverse-CDF code (``MCMC/rand_nort.m``).  On TPU the
whole (chains x data) batch is drawn at once by inverse-CDF through
``jax.random.truncated_normal`` (which uses ndtri internally and accepts
infinite bounds), in lockstep with no rejection loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def truncated_normal_onesided(
    key: Array,
    mean: Array,
    std: Array,
    positive: Array,
) -> Array:
    """Sample z ~ N(mean, std^2) truncated to z > 0 (positive) or z < 0.

    ``positive`` is a boolean array broadcastable against ``mean``;
    labels t = 1 truncate to the positive half-line, t = 0 to the
    negative (``code/gibbs_sampler.py:116-125``).
    """
    mean, std = jnp.broadcast_arrays(mean, std)
    dtype = mean.dtype
    # Standardized bound: z > 0  <=>  (z - m)/s > -m/s.
    bound = -mean / std
    inf = jnp.asarray(jnp.inf, dtype)
    lower = jnp.where(positive, bound, -inf)
    upper = jnp.where(positive, inf, bound)
    z_std = jax.random.truncated_normal(key, lower, upper, mean.shape, dtype)
    return mean + std * z_std
