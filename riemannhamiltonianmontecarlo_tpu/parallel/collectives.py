"""Cross-chain reductions.

Under the GSPMD runner (jit + sharded chain axis) a plain ``jnp.mean``
over chains already lowers to the right collectives; inside an explicit
``shard_map`` region the mesh axis name must be supplied and the
reduction becomes a ``psum``.  Both spellings live here so adaptation /
diagnostics code is agnostic to the execution mode (SURVEY.md section 5,
distributed backend).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_chain_mean(x: Array, axis_name: str | None = None) -> Array:
    """Mean over the leading (chain) axis, globally across the mesh."""
    local = jnp.mean(x, axis=0)
    if axis_name is None:
        return local
    return jax.lax.pmean(local, axis_name)


def cross_chain_sum(x: Array, axis_name: str | None = None) -> Array:
    local = jnp.sum(x, axis=0)
    if axis_name is None:
        return local
    return jax.lax.psum(local, axis_name)
