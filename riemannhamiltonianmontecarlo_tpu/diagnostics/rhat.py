"""Split R-hat and cross-chain summaries.

The reference has no multi-chain diagnostics (it averages 10 serial runs,
``code/main.py:48-54``).  With thousands of parallel chains, potential-
scale-reduction is the natural convergence check; this is the net-new
TPU-side analog required by BASELINE.json ("cross-host R-hat").

`split_rhat_device` is pure ``jnp`` so it can run inside a jitted /
shard_map'ed program with chain statistics reduced by ``psum`` across the
mesh (see ``parallel/collectives.py``); `split_rhat` is the host NumPy
version for post-processing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_rhat(samples: np.ndarray) -> np.ndarray:
    """Gelman-Rubin split-R-hat.  samples: (C, N, P) -> (P,)."""
    x = np.asarray(samples, dtype=np.float64)
    c, n, p = x.shape
    half = n // 2
    halves = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)  # (2C, half, P)
    m, s = halves.shape[0], halves.shape[1]
    chain_mean = halves.mean(axis=1)  # (2C, P)
    chain_var = halves.var(axis=1, ddof=1)  # (2C, P)
    w = chain_var.mean(axis=0)
    b = s * chain_mean.var(axis=0, ddof=1)
    var_plus = (s - 1) / s * w + b / s
    return np.sqrt(var_plus / w)


def split_rhat_device(samples: jnp.ndarray) -> jnp.ndarray:
    """Device-side split-R-hat over local chains.  samples: (C, N, P) -> (P,)."""
    c, n, p = samples.shape
    half = n // 2
    halves = jnp.concatenate([samples[:, :half], samples[:, half : 2 * half]], axis=0)
    s = halves.shape[1]
    chain_mean = halves.mean(axis=1)
    chain_var = halves.var(axis=1, ddof=1)
    w = chain_var.mean(axis=0)
    b = s * chain_mean.var(axis=0, ddof=1)
    var_plus = (s - 1) / s * w + b / s
    return jnp.sqrt(var_plus / w)
