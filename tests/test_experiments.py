"""Experiment driver: presets, runtime, and summary statistics."""

import numpy as np
import pytest

from riemannhamiltonianmontecarlo_tpu.experiments import SAMPLERS, build_kernel, run_experiment
from riemannhamiltonianmontecarlo_tpu.utils.config import reference_preset


def test_presets_reproduce_reference_constants():
    p = reference_preset("rmhmc")
    assert (p.num_iterations, p.burn_in) == (6000, 1000)
    assert p.sampler_kwargs == {"step_size": 0.5, "num_leapfrog": 6, "num_fixed_point": 4}
    p = reference_preset("hmc")
    assert p.sampler_kwargs == {"step_size": 0.14, "num_leapfrog": 100}
    p = reference_preset("mala")
    assert (p.num_iterations, p.burn_in) == (25000, 20000)


def test_run_experiment_hmc_small():
    res = run_experiment(
        "hmc",
        "australian",
        num_chains=16,
        num_samples=60,
        burn_in=30,
        sampler_overrides={"num_leapfrog": 10, "step_size": 0.1},
    )
    assert res.num_samples == 60
    assert res.ess_min > 0
    assert res.sampling_time_s > 0
    assert np.isfinite(res.posterior_mean).all()
    assert res.time_per_min_ess == pytest.approx(res.sampling_time_s / res.ess_min)
    assert "hmc on australian" in res.summary()


def test_run_experiment_mala_warmup_phase():
    res = run_experiment(
        "mala", "heart", num_chains=16, num_samples=80, burn_in=40
    )
    assert np.isfinite(res.posterior_mean).all()
    assert 0.0 <= res.accept_rate <= 1.0


def test_all_samplers_buildable():
    import jax.numpy as jnp

    from riemannhamiltonianmontecarlo_tpu.models import LogisticRegression, synthetic_logreg

    ds = synthetic_logreg(seed=0, n=40, d=3)
    model = LogisticRegression(jnp.asarray(ds.X, jnp.float32), jnp.asarray(ds.t, jnp.float32))
    for name in SAMPLERS:
        kernel, warm = build_kernel(name, model, "australian", None)
        assert kernel.init is not None and kernel.step is not None


def test_run_repeated_aggregation():
    from riemannhamiltonianmontecarlo_tpu.experiments import run_repeated

    results, agg = run_repeated(
        "hmc",
        "australian",
        n_repeats=2,
        num_chains=8,
        num_samples=30,
        burn_in=10,
        sampler_overrides={"num_leapfrog": 5, "step_size": 0.1},
    )
    assert len(results) == 2
    mean, stderr = agg["ess_min"]
    assert mean > 0 and stderr >= 0
    assert set(agg) >= {"ess_min", "sampling_time_s", "time_per_min_ess"}
