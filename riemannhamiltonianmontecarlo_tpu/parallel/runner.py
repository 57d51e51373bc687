"""Chain runner: warmup + sampling scans over a (possibly sharded) batch.

Replaces the reference's per-sampler Python iteration loops
(``code/hmc.py:38``, ``code/rmhmc.py:37``, driver loop ``code/main.py:48``)
with a single jitted ``lax.scan`` advancing all chains per step.  The
burn-in / sampling split mirrors the reference convention of timing only
the post-burn-in phase (``code/hmc.py:92-96``) -- ``run`` compiles the two
phases into one program; ``bench.py`` times the sampling phase alone.

Sharding: pass a 1-D mesh and the initial position's chain axis is
sharded across devices.  All kernel math is chain-batched, so GSPMD
partitions the whole scan without communication (JAX's partitionable
threefry keeps shaped PRNG draws consistent across mesh sizes).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from riemannhamiltonianmontecarlo_tpu.parallel.mesh import chain_sharding, shard_chains
from riemannhamiltonianmontecarlo_tpu.samplers.base import Kernel

Array = jax.Array


@dataclasses.dataclass
class RunResult:
    samples: Array | None  # (C, S, D) post-burn-in positions (thinned)
    final_state: Any
    accept_rate: Array  # () mean accept probability over the sampling phase
    divergences: Array  # () total divergent transitions in the sampling phase
    warmup_accept_rate: Array  # () mean accept probability during warmup


def _position_of(state) -> Array:
    return state.position


@partial(jax.jit, static_argnames=("step", "num_steps", "collect", "collect_fn"))
def _scan_phase(step, key, state, num_steps: int, collect: bool, collect_fn=None):
    keys = jax.random.split(key, num_steps)

    def body(st, k):
        st, info = step(k, st)
        out = (collect_fn or _position_of)(st) if collect else None
        stats = (jnp.mean(info.accept_prob), jnp.sum(info.divergent))
        return st, (out, stats)

    state, (positions, stats) = jax.lax.scan(body, state, keys)
    accept = jnp.mean(stats[0])
    div = jnp.sum(stats[1])
    if collect:
        return state, positions, accept, div
    return state, accept, div


def run(
    kernel: Kernel,
    key: Array,
    init_position: Array,
    *,
    num_samples: int,
    burn_in: int = 0,
    thin: int = 1,
    mesh: Mesh | None = None,
    collect: bool = True,
    warmup_kernel: Kernel | None = None,
    init_state=None,
    collect_fn=None,
) -> RunResult:
    """Run ``burn_in`` warmup steps then collect ``num_samples`` samples.

    init_position: (C, D).  Returns samples as (C, num_samples // thin, D).
    ``warmup_kernel`` (same state type) replaces ``kernel`` during burn-in
    -- e.g. MALA's transient-scaling phase (``BLR_MALA.m:167,243``).
    ``collect_fn`` maps the kernel state to the pytree recorded each step
    (default: ``state.position``) -- e.g. both hyperparameters and latent
    volatilities of the StochVol two-block state.
    """
    if init_state is not None:
        state = init_state  # continue from a previous run's final_state
    else:
        if mesh is not None:
            init_position = shard_chains(mesh, init_position)
        state = (warmup_kernel or kernel).init(init_position)
        if mesh is not None:
            state = shard_chains(mesh, state)
    k_warm, k_sample = jax.random.split(key)

    warm_accept = jnp.zeros(())
    if burn_in > 0:
        warm_step = (warmup_kernel or kernel).step
        state, warm_accept, _ = _scan_phase(warm_step, k_warm, state, burn_in, False)

    if collect:
        state, positions, accept, div = _scan_phase(
            kernel.step, k_sample, state, num_samples, True, collect_fn
        )

        # (S, C, D) -> (C, S, D); thinning keeps a static subset.
        def _to_samples(pos):
            s = jnp.moveaxis(pos, 0, 1)
            if thin > 1:
                s = s[:, (thin - 1) :: thin]
            if mesh is not None:
                s = jax.lax.with_sharding_constraint(s, chain_sharding(mesh, s.ndim))
            return s

        samples = jax.tree.map(_to_samples, positions)
    else:
        state, accept, div = _scan_phase(kernel.step, k_sample, state, num_samples, False)
        samples = None

    return RunResult(
        samples=samples,
        final_state=state,
        accept_rate=accept,
        divergences=div,
        warmup_accept_rate=warm_accept,
    )
