"""Probe wall-clock vs chain count for the latency-bound rows (FHN HMC,
StochVol HMC/RMHMC, LGC mMALA) to pick the chain counts for RESULTS.md.

Usage: PYTHONPATH=. python tools/probe_scaling.py fhn|stochvol|lgc
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from riemannhamiltonianmontecarlo_tpu import parallel


def timeit(kernel, init, steps, seg=None):
    k = jax.random.key(0)
    if seg is None:
        warm = parallel.run(kernel, k, init, num_samples=2, collect=False)
        jax.block_until_ready(jax.tree.leaves(warm.final_state)[0])
        t0 = time.perf_counter()
        res = parallel.run(kernel, jax.random.fold_in(k, 1), None, num_samples=steps,
                           collect=False, init_state=warm.final_state)
        jax.block_until_ready(jax.tree.leaves(res.final_state)[0])
        return time.perf_counter() - t0
    # segmented (bounded device programs for the tunneled backend)
    warm = parallel.run(kernel, k, init, num_samples=seg, collect=False)
    state = warm.final_state
    jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    for i in range(0, steps, seg):
        r = parallel.run(kernel, jax.random.fold_in(k, i), None,
                         num_samples=min(seg, steps - i), collect=False, init_state=state)
        state = r.final_state
        jax.block_until_ready(jax.tree.leaves(state)[0])
    return time.perf_counter() - t0


def probe_fhn():
    from riemannhamiltonianmontecarlo_tpu.models import fhn
    from riemannhamiltonianmontecarlo_tpu.samplers import hmc

    data, _ = fhn.generate_data(seed=1, num_obs=200)
    model = fhn.FHNModel(jnp.asarray(data, jnp.float32), substeps=5)
    kernel = hmc.build(model, hmc.HMCConfig(step_size=1 / 150, num_leapfrog=150))
    theta0 = jnp.asarray([0.2, 0.2, 3.0], jnp.float32)
    for chains in (64, 256, 1024):
        init = jnp.tile(theta0, (chains, 1))
        t = timeit(kernel, init, 20, seg=10)
        print(f"fhn/hmc chains={chains:5d}  20 samples: {t:.2f}s "
              f"({t/20*1000:.0f} ms/sample)", flush=True)


def probe_stochvol():
    from riemannhamiltonianmontecarlo_tpu.models import stochvol
    from riemannhamiltonianmontecarlo_tpu.samplers import stochvol as sv

    y, _ = stochvol.generate_data(seed=0, num_obs=2000)
    model = stochvol.StochVolModel(jnp.asarray(y, jnp.float32))
    for method, cfg in (
        ("hmc", sv.StochVolConfig(method="hmc", latent_num_leapfrog=100,
                                  latent_step_size=0.03, hyper_num_leapfrog=100,
                                  hyper_step_size=0.015)),
        ("rmhmc", sv.StochVolConfig()),
    ):
        kernel = sv.build(model, cfg)
        for chains in (64, 256, 512):
            init = jnp.tile(jnp.asarray([0.5, 0.5, 0.5], jnp.float32), (chains, 1))
            t = timeit(kernel, init, 20, seg=10)
            print(f"stochvol/{method} chains={chains:4d}  20 samples: {t:.2f}s",
                  flush=True)


def probe_lgc():
    from riemannhamiltonianmontecarlo_tpu.models import lgc
    from riemannhamiltonianmontecarlo_tpu.samplers import mmala

    y, _ = lgc.generate_data(seed=0, n=64)
    model = lgc.LGCModel(jnp.asarray(y, jnp.float32), n=64)
    kernel = mmala.build(model, mmala.MMALAConfig(step_size=0.07, jitter=1e-5))
    for chains in (2, 8, 16):
        init = jnp.tile(model.prior_mean(), (chains, 1))
        t = timeit(kernel, init, 20)
        print(f"lgc/mmala chains={chains:3d}  20 samples: {t:.2f}s "
              f"({t/20/chains*1000:.1f} ms/chain-sample)", flush=True)


if __name__ == "__main__":
    {"fhn": probe_fhn, "stochvol": probe_stochvol, "lgc": probe_lgc}[sys.argv[1]]()
