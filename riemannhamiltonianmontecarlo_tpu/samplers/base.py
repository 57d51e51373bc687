"""Transition-kernel interface.

A sampler is a pair of pure functions operating on *batched* chain states
(leading chain axis C), so one jitted step advances every chain on the
chip in lockstep:

* ``init(position) -> State``          position: (C, D)
* ``step(key, state) -> (State, Info)``

``key`` is a single PRNG key per step; per-chain randomness comes from
shaped draws, and the mesh runner folds the device index into the key so
sharded chains decorrelate (``parallel/runner.py``).

The reference equivalents are the per-sampler Python functions returning
``(samples, time)`` (e.g. ``HMC`` at ``code/hmc.py:12``); here iteration,
collection, timing, and sharding are factored out into the runner.

Divergence policy: the reference aborts trajectories on NaN
(``code/hmc.py:56-57``) or crashes; batched chains instead mask -- a
non-finite proposal rejects that chain's move and sets ``Info.divergent``
without disturbing the rest of the batch (SURVEY.md section 5, failure
handling).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Info(NamedTuple):
    """Per-step, per-chain diagnostics emitted by every kernel.

    Multi-block kernels (two-block StochVol / joint-LGC sweeps,
    coordinate-sweep Metropolis/Gibbs) report every field at SWEEP level
    with one consistent rule: ``accept_prob`` and ``accepted`` are the
    mean over the sweep's proposals (so ``accepted`` is a float fraction,
    e.g. {0, 0.5, 1} for two blocks), and ``divergent`` is true if any
    proposal in the sweep diverged.  Single-proposal kernels degenerate
    to the usual semantics (``accepted`` in {0, 1}).
    """

    accept_prob: Array  # (C,) mean over the step's proposals of min(1, exp(ratio))
    accepted: Array  # (C,) fraction of the step's proposals taken ({0,1} single-proposal)
    divergent: Array  # (C,) bool: any proposal this step was masked to a rejection


class Kernel(NamedTuple):
    init: Callable[[Array], Any]
    step: Callable[[Array, Any], tuple[Any, Info]]


def metropolis_accept(
    key: Array, ratio: Array, divergent: Array | None = None
) -> tuple[Array, Array]:
    """Vectorized MH accept step.

    Matches the reference rule ``Ratio > 0 or Ratio > log(rand)``
    (``code/hmc.py:77``) which is equivalent to ``ratio > log U`` a.s.
    Non-finite ratios (divergent trajectories) always reject.
    """
    u = jax.random.uniform(key, ratio.shape, dtype=ratio.dtype)
    ok = jnp.isfinite(ratio)
    if divergent is not None:
        ok = ok & ~divergent
    accept = ok & (ratio > jnp.log(u))
    accept_prob = jnp.where(ok, jnp.exp(jnp.minimum(ratio, 0.0)), 0.0)
    return accept, accept_prob


def tree_where(cond: Array, tree_true, tree_false):
    """Select between two pytrees per chain (cond broadcast on leading axis)."""

    def sel(a, b):
        c = cond.reshape(cond.shape + (1,) * (a.ndim - cond.ndim))
        return jnp.where(c, a, b)

    return jax.tree.map(sel, tree_true, tree_false)
