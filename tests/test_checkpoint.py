"""Checkpoint round-trip: stop and resume a run bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from riemannhamiltonianmontecarlo_tpu.parallel import run
from riemannhamiltonianmontecarlo_tpu.samplers import hmc
from riemannhamiltonianmontecarlo_tpu.utils.checkpoint import load_state, save_state

from targets import ConstantMetricGaussian


def test_checkpoint_roundtrip_resume(tmp_path):
    target = ConstantMetricGaussian(mean=[0.0, 1.0], cov=np.eye(2))
    kernel = hmc.build(target, hmc.HMCConfig(step_size=0.3, num_leapfrog=5))
    init = jnp.zeros((16, 2))
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)

    # One continuous run...
    mid = run(kernel, k1, init, num_samples=20, burn_in=0)
    full = run(kernel, k2, None, num_samples=30, burn_in=0, init_state=mid.final_state)

    # ...vs save/restore at the midpoint.
    path = tmp_path / "ckpt.npz"
    save_state(path, mid.final_state, step=20, key=k2)
    template = kernel.init(init)
    restored, step, rkey = load_state(path, template)
    assert step == 20
    resumed = run(kernel, rkey, None, num_samples=30, burn_in=0, init_state=restored)

    np.testing.assert_array_equal(np.asarray(full.samples), np.asarray(resumed.samples))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    target = ConstantMetricGaussian(mean=[0.0, 1.0], cov=np.eye(2))
    kernel = hmc.build(target, hmc.HMCConfig())
    state = kernel.init(jnp.zeros((8, 2)))
    path = tmp_path / "ckpt.npz"
    save_state(path, state)
    wrong_template = kernel.init(jnp.zeros((4, 2)))
    try:
        load_state(path, wrong_template)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
