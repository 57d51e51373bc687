"""Experiment driver: the L3/L4 layer of the reference, as a library + CLI.

Replaces ``code/main.py`` (edit-the-source sampler selection, 10 serial
repeats) and the MATLAB ``Run_*_Experiments.m`` / ``CalculateStatistics.m``
pipeline with one call: build model + kernel from reference presets, run
chain-parallel on the available hardware, report the reference's summary
statistics (min/median/mean/max ESS, sampling-phase wall clock,
time-per-min-ESS -- ``code/main.py:70-79``, ``CalculateStatistics.m:24-31``).

Timing protocol: only the post-burn-in sampling phase is timed (the
reference convention, ``code/hmc.py:92-96``).  The sampling phase runs as
two identical half-scans; the first also pays XLA compilation, so the
reported time is twice the *second* half -- a steady-state measurement.

CLI::

    python -m riemannhamiltonianmontecarlo_tpu.experiments \
        --sampler rmhmc --dataset australian --chains 1024
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riemannhamiltonianmontecarlo_tpu import diagnostics, models, parallel, samplers, utils
from riemannhamiltonianmontecarlo_tpu.utils.config import (
    MALA_STEP_SIZES,
    MALA_TRANSIENT_FACTOR,
    reference_preset,
)

SAMPLERS = (
    "metropolis",
    "hmc",
    "mala",
    "mmala",
    "mmala_simplified",
    "iwls",
    "gibbs",
    "rmhmc",
    "rmhmc_studentt",
)


@dataclasses.dataclass
class ExperimentResult:
    sampler: str
    dataset: str
    num_chains: int
    num_samples: int
    ess_min: float
    ess_median: float
    ess_mean: float
    ess_max: float
    sampling_time_s: float
    time_per_min_ess: float
    accept_rate: float
    divergences: int
    posterior_mean: np.ndarray
    posterior_std: np.ndarray
    samples: np.ndarray | None = None

    def summary(self) -> str:
        return (
            f"{self.sampler} on {self.dataset}: {self.num_chains} chains x "
            f"{self.num_samples} samples\n"
            f"  ESS (total over chains): min {self.ess_min:.0f}  median "
            f"{self.ess_median:.0f}  mean {self.ess_mean:.0f}  max {self.ess_max:.0f}\n"
            f"  sampling time: {self.sampling_time_s:.3f} s   "
            f"time/minESS: {self.time_per_min_ess:.3e} s   "
            f"accept: {self.accept_rate:.3f}   divergences: {self.divergences}\n"
            f"  posterior mean[:5]: {np.round(self.posterior_mean[:5], 3)}"
        )


def build_kernel(name: str, model, dataset: str, overrides: dict[str, Any] | None = None):
    """(kernel, warmup_kernel_or_None) from reference presets."""
    kw = dict(reference_preset(name, dataset).sampler_kwargs)
    if overrides:
        kw.update(overrides)
    s = samplers
    if name == "metropolis":
        return s.metropolis.build(model, s.metropolis.AMHConfig()), None
    if name == "hmc":
        return s.hmc.build(model, s.hmc.HMCConfig(**kw)), None
    if name == "mala":
        step = kw.get("step_size", MALA_STEP_SIZES.get(dataset, 0.05))
        factor = MALA_TRANSIENT_FACTOR.get(dataset, 1.0)
        kernel = s.mala.build(model, s.mala.MALAConfig(step_size=step))
        warm = s.mala.build(
            model,
            s.mala.MALAConfig(step_size=step, transient=True, transient_factor=factor),
        )
        return kernel, warm
    if name == "mmala":
        return s.mmala.build(model, s.mmala.MMALAConfig(**kw)), None
    if name == "mmala_simplified":
        return s.mmala.build(model, s.mmala.MMALAConfig(simplified=True, **kw)), None
    if name == "iwls":
        return s.iwls.build(model), None
    if name == "gibbs":
        return s.gibbs.build(model), None
    if name == "rmhmc":
        return s.rmhmc.build(model, s.rmhmc.RMHMCConfig(**kw)), None
    if name == "rmhmc_studentt":
        return s.rmhmc.build(model, s.rmhmc.RMHMCConfig(student_t=True, **kw)), None
    raise KeyError(f"unknown sampler '{name}'; options: {SAMPLERS}")


def run_experiment(
    sampler: str,
    dataset: str = "australian",
    *,
    num_chains: int = 1024,
    num_samples: int | None = None,
    burn_in: int | None = None,
    seed: int = 0,
    init: str = "map",
    mesh=None,
    ess_mode: str = "reference",
    keep_samples: bool = False,
    sampler_overrides: dict[str, Any] | None = None,
) -> ExperimentResult:
    preset = reference_preset(sampler, dataset)
    num_samples = preset.num_samples if num_samples is None else num_samples
    burn_in = preset.burn_in if burn_in is None else burn_in

    ds = models.load_dataset(dataset)
    model = models.LogisticRegression(
        jnp.asarray(ds.X, jnp.float32), jnp.asarray(ds.t, jnp.float32)
    )
    kernel, warmup_kernel = build_kernel(sampler, model, dataset, sampler_overrides)

    key = jax.random.key(seed)
    k_init, k_warm, k_a, k_b = jax.random.split(key, 4)
    if init == "map":
        position = utils.default_init(model, k_init, num_chains)
    elif init == "zeros":
        position = jnp.zeros((num_chains, model.dim))
    elif init == "reference":
        # code/rmhmc.py:27 uses 1e-3; code/hmc.py:27 zeros.
        position = jnp.full((num_chains, model.dim), 1e-3)
    else:
        raise ValueError(f"init must be map|zeros|reference, got {init!r}")

    warm = parallel.run(
        kernel,
        k_warm,
        position,
        num_samples=burn_in,
        burn_in=0,
        collect=False,
        mesh=mesh,
        warmup_kernel=warmup_kernel,
    )
    jax.block_until_ready(warm.final_state.position)

    half = max(num_samples // 2, 1)
    res_a = parallel.run(
        kernel, k_a, None, num_samples=half, burn_in=0, init_state=warm.final_state, mesh=mesh
    )
    jax.block_until_ready(res_a.samples)
    t0 = time.perf_counter()
    res_b = parallel.run(
        kernel, k_b, None, num_samples=half, burn_in=0, init_state=res_a.final_state, mesh=mesh
    )
    jax.block_until_ready(res_b.samples)
    t_half = time.perf_counter() - t0
    sampling_time = 2.0 * t_half

    accept = 0.5 * (float(res_a.accept_rate) + float(res_b.accept_rate))
    div = int(res_a.divergences) + int(res_b.divergences)

    if ess_mode == "device":
        # Compute ESS and posterior moments on-device: only tiny arrays
        # cross the host link (matters on tunneled TPU backends where a
        # (C, S, D) sample transfer costs minutes).  Alias-free ACF.
        dev_samples = jnp.concatenate([res_a.samples, res_b.samples], axis=1)
        ess = np.asarray(diagnostics.ess_geyer_device(dev_samples))
        flat_mean = np.asarray(jnp.mean(dev_samples, axis=(0, 1)))
        flat_std = np.asarray(jnp.std(dev_samples, axis=(0, 1)))
        num_kept = int(dev_samples.shape[1])
        samples = np.asarray(dev_samples) if keep_samples else None
    else:
        samples = np.concatenate(
            [np.asarray(res_a.samples), np.asarray(res_b.samples)], axis=1
        )  # (C, S, D)
        ess = diagnostics.ess_multichain(samples, nfft_mode=ess_mode)
        flat = samples.reshape(-1, samples.shape[-1])
        flat_mean, flat_std = flat.mean(axis=0), flat.std(axis=0)
        num_kept = samples.shape[1]

    return ExperimentResult(
        sampler=sampler,
        dataset=dataset,
        num_chains=num_chains,
        num_samples=num_kept,
        ess_min=float(ess.min()),
        ess_median=float(np.median(ess)),
        ess_mean=float(ess.mean()),
        ess_max=float(ess.max()),
        sampling_time_s=sampling_time,
        time_per_min_ess=sampling_time / float(ess.min()),
        accept_rate=accept,
        divergences=div,
        posterior_mean=flat_mean,
        posterior_std=flat_std,
        samples=samples if keep_samples else None,
    )


def aggregate(results: list[ExperimentResult]) -> dict[str, tuple[float, float]]:
    """Mean +- standard error over independent repeats.

    The reference aggregates 10 runs this way (``code/main.py:43-54``,
    ``Results/CalculateStatistics.m:7-31``).  Returns
    {stat: (mean, stderr)} for the ESS summary, sampling time, and
    time/minESS.
    """
    out: dict[str, tuple[float, float]] = {}
    n = len(results)
    for stat in (
        "ess_min",
        "ess_median",
        "ess_mean",
        "ess_max",
        "sampling_time_s",
        "time_per_min_ess",
        "accept_rate",
    ):
        vals = np.asarray([getattr(r, stat) for r in results], np.float64)
        out[stat] = (float(vals.mean()), float(vals.std(ddof=1) / np.sqrt(n)) if n > 1 else 0.0)
    return out


def run_repeated(
    sampler: str, dataset: str = "australian", *, n_repeats: int = 10, seed: int = 0, **kwargs
) -> tuple[list[ExperimentResult], dict[str, tuple[float, float]]]:
    """n independent repeats (different seeds) + CalculateStatistics-style
    aggregation."""
    results = [
        run_experiment(sampler, dataset, seed=seed + i, **kwargs)
        for i in range(n_repeats)
    ]
    return results, aggregate(results)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sampler", choices=SAMPLERS, default="rmhmc")
    ap.add_argument("--dataset", default="australian")
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--burn-in", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init", choices=("map", "zeros", "reference"), default="map")
    ap.add_argument("--ess-mode", choices=("reference", "exact", "device"), default="reference")
    args = ap.parse_args(argv)
    res = run_experiment(
        args.sampler,
        args.dataset,
        num_chains=args.chains,
        num_samples=args.samples,
        burn_in=args.burn_in,
        seed=args.seed,
        init=args.init,
        ess_mode=args.ess_mode,
    )
    print(res.summary())


if __name__ == "__main__":
    main()
