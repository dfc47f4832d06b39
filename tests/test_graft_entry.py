"""Driver contract: entry() compiles and runs; dryrun_multichip executes the
sharded fleet step on the virtual CPU mesh; the fused mcl step works."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from badger_amcl_tpu import mcl
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.poses.shape == (4096, 3)
    assert int(out.n_active) >= 1
    w = np.asarray(out.weights)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


@pytest.mark.slow
def test_fused_step_backends_agree():
    """xla vs pallas_interpret full-step agreement on a concentrated cloud."""
    omap, params, state, scan, sp, pool = graft._build_setup(
        256, 48, 320, pose_cov=(0.01, 0.01, 0.001)
    )
    kw = dict(
        odom_pose=jnp.array([0.05, 0.0, 0.01]),
        odom_delta=jnp.array([0.05, 0.0, 0.01]),
        absolute_motion=jnp.array([0.05, 0.0, 0.01]),
        alphas=jnp.full((5,), 0.05),
        params=params,
    )
    a = mcl.mcl_step_2d(state, omap, sp, scan, pool, backend="xla", **kw)
    b = mcl.mcl_step_2d(state, omap, sp, scan, pool, backend="pallas_interpret", **kw)
    # same PRNG stream; bf16 texture quantization perturbs weights slightly,
    # which can flip resample picks — compare the population statistics
    np.testing.assert_allclose(
        np.asarray(a.stats.mean), np.asarray(b.stats.mean), atol=0.05
    )
    assert abs(int(a.n_active) - int(b.n_active)) <= max(8, int(0.1 * int(a.n_active)))
