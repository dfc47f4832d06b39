"""Particle filter core: init, sensor update semantics, augmented-MCL
averages, resampling distributions, KLD stop, convergence.

The reference never tested its filter (SURVEY.md §4); these are golden and
statistical tests of the documented contracts in particle_filter.cpp.
"""

import jax
import jax.numpy as jnp
import numpy as np

from badger_amcl_tpu.pf import (
    PFParams,
    init_with_gaussian,
    init_with_poses,
    resample,
    sensor_update,
)
from badger_amcl_tpu.pf.filter import ResampleModel, update_converged

PARAMS = PFParams(min_samples=20, max_samples=400)


def _init(key=0, mean=(0.0, 0.0, 0.0), cov=(0.1, 0.1, 0.05)):
    return init_with_gaussian(
        PARAMS, jax.random.PRNGKey(key), jnp.array(mean), jnp.diag(jnp.array(cov))
    )


def test_init_gaussian_moments():
    st = _init(cov=(0.04, 0.09, 0.01), mean=(1.0, -2.0, 0.5))
    p = np.asarray(st.poses)
    assert st.poses.shape == (400, 3)
    np.testing.assert_allclose(p.mean(axis=0), [1.0, -2.0, 0.5], atol=0.08)
    np.testing.assert_allclose(p.var(axis=0), [0.04, 0.09, 0.01], rtol=0.35)
    np.testing.assert_allclose(np.asarray(st.weights), 1.0 / 400)
    assert float(st.w_slow) == 0.0 and float(st.w_fast) == 0.0
    assert not bool(st.converged)  # initConverged


def test_init_gaussian_correlated_cov():
    cov = jnp.array([[0.04, 0.02, 0.0], [0.02, 0.04, 0.0], [0.0, 0.0, 0.01]])
    st = init_with_gaussian(
        PFParams(max_samples=4000), jax.random.PRNGKey(1), jnp.zeros(3), cov
    )
    emp = np.cov(np.asarray(st.poses).T)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.006)


def test_sensor_update_normalization_and_averages():
    st = _init()
    p = jnp.ones((400,)) * 2.0  # uniform likelihood
    st2 = sensor_update(st, p)
    np.testing.assert_allclose(np.asarray(st2.weights).sum(), 1.0, rtol=1e-6)
    # total = sum(w*p) = 2; w_avg = 2/400 = 0.005; first update seeds both
    np.testing.assert_allclose(float(st2.w_slow), 0.005, rtol=1e-5)
    np.testing.assert_allclose(float(st2.w_fast), 0.005, rtol=1e-5)
    # second update: w_avg = 1/400 (weights normalized, p=1)
    st3 = sensor_update(st2, jnp.ones((400,)))
    wavg = 1.0 / 400
    want_slow = 0.005 + st3.alpha_slow * (wavg - 0.005)
    np.testing.assert_allclose(float(st3.w_slow), float(want_slow), rtol=1e-5)


def test_sensor_update_zero_total_resets_uniform():
    st = _init()
    st2 = sensor_update(st, jnp.zeros((400,)))
    np.testing.assert_allclose(np.asarray(st2.weights), 1.0 / 400)
    assert float(st2.w_slow) == 0.0  # untouched


def test_sensor_update_map_factor_guard():
    """recalcWeight only applies when the model total is positive
    (planar_scanner.cpp:159-162)."""
    st = _init()
    factor = jnp.full((400,), 0.5)
    st2 = sensor_update(st, jnp.ones((400,)) * 3.0, factor)
    # factors uniform -> normalized weights unchanged, but averages use t2
    np.testing.assert_allclose(np.asarray(st2.weights).sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(st2.w_fast), 1.5 / 400, rtol=1e-5)


def test_resample_concentrates_on_heavy_particle():
    st = _init()
    # all mass on particle 7
    w = jnp.zeros((400,)).at[7].set(1.0)
    st = st.replace(weights=w)
    pool = jnp.zeros((400, 3))
    st2 = resample(st, PARAMS, pool, ResampleModel.MULTINOMIAL)
    target = np.asarray(st.poses)[7]
    p = np.asarray(st2.poses)[: int(st2.n_active)]
    assert (p == target).all()
    # one bin -> resample_limit(1) = max, but the stop rule n > limit never
    # fires -> full max_samples kept
    assert int(st2.n_active) == 400
    np.testing.assert_allclose(np.asarray(st2.weights).sum(), 1.0, rtol=1e-6)


def test_resample_systematic_proportionality():
    st = _init()
    w = np.zeros(400)
    w[0], w[1], w[2] = 0.5, 0.3, 0.2
    st = st.replace(weights=jnp.asarray(w, jnp.float32))
    pool = jnp.zeros((400, 3))
    st2 = resample(st, PARAMS, pool, ResampleModel.SYSTEMATIC)
    n = int(st2.n_active)
    p = np.asarray(st2.poses)[:n]
    src = np.asarray(st.poses)
    counts = [(p == src[i]).all(axis=1).sum() / n for i in range(3)]
    np.testing.assert_allclose(counts, [0.5, 0.3, 0.2], atol=0.02)


def test_kld_stop_reduces_population():
    """A tight cloud occupying few bins must trigger the KLD early stop."""
    params = PFParams(min_samples=20, max_samples=4000, pop_err=0.05, pop_z=3.0)
    st = init_with_gaussian(
        params, jax.random.PRNGKey(3), jnp.zeros(3), jnp.diag(jnp.array([0.01, 0.01, 0.005]))
    )
    pool = jnp.zeros((4000, 3))
    st2 = resample(st, params, pool, ResampleModel.MULTINOMIAL)
    assert int(st2.n_active) < 4000  # stopped early
    assert int(st2.n_active) >= 20
    # weights uniform over the survivors
    w = np.asarray(st2.weights)
    n = int(st2.n_active)
    np.testing.assert_allclose(w[:n], 1.0 / n, rtol=1e-5)
    assert (w[n:] == 0).all()


def test_recovery_injects_random_poses():
    """w_fast << w_slow triggers uniform injection (particle_filter.cpp:438-455)."""
    st = _init()
    st = st.replace(w_slow=jnp.float32(1.0), w_fast=jnp.float32(0.5))  # w_diff=0.5
    far_pose = jnp.array([50.0, 50.0, 0.0])
    pool = jnp.broadcast_to(far_pose, (400, 3))
    st2 = resample(st, PARAMS, pool, ResampleModel.MULTINOMIAL)
    p = np.asarray(st2.poses)[: int(st2.n_active)]
    frac_random = (p == np.asarray(far_pose)).all(axis=1).mean()
    assert 0.35 < frac_random < 0.65
    # averages reset after injection
    assert float(st2.w_slow) == 0.0 and float(st2.w_fast) == 0.0


def test_recovery_systematic_counts():
    st = _init()
    st = st.replace(w_slow=jnp.float32(1.0), w_fast=jnp.float32(0.8))  # w_diff=0.2
    far_pose = jnp.array([50.0, 50.0, 0.0])
    pool = jnp.broadcast_to(far_pose, (400, 3))
    st2 = resample(st, PARAMS, pool, ResampleModel.SYSTEMATIC)
    n = int(st2.n_active)
    p = np.asarray(st2.poses)[:n]
    n_rand = int((p == np.asarray(far_pose)).all(axis=1).sum())
    # exactly floor(w_diff * new_count) random poses at the front; w_diff =
    # 1 - 0.8/1.0 rounds below 0.2 in both f32 and the reference's f64, so
    # the truncation may land one below the nominal count
    assert n_rand in (int(0.2 * n) - 1, int(0.2 * n))
    assert (p[:n_rand] == np.asarray(far_pose)).all()


def test_update_converged():
    st = _init(cov=(0.01, 0.01, 0.01))
    st2 = update_converged(st, PARAMS)
    assert bool(st2.converged)
    st3 = init_with_poses(
        PARAMS,
        jax.random.PRNGKey(5),
        jax.random.uniform(jax.random.PRNGKey(6), (400, 3), minval=-10, maxval=10),
    )
    st4 = update_converged(st3, PARAMS)
    assert not bool(st4.converged)


def test_init_with_poses_spread_not_converged():
    """initWithPoseFn leaves converged False until a resample confirms it."""
    poses = jax.random.uniform(jax.random.PRNGKey(7), (400, 3), minval=-5, maxval=5)
    st = init_with_poses(PARAMS, jax.random.PRNGKey(8), poses)
    assert not bool(st.converged)
    assert int(st.stats.cluster_count) > 1
