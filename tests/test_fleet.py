"""Fleet batching + mesh sharding, on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from badger_amcl_tpu.fleet import (
    fleet_init,
    make_fleet_step,
    make_sharded_fleet_step,
)
from badger_amcl_tpu.fleet.fleet import fleet_health
from badger_amcl_tpu.pf.types import PFParams
from badger_amcl_tpu.sensors.planar import PlanarScan, PlanarScanParams

R, N, B = 8, 128, 32
PARAMS = PFParams(min_samples=16, max_samples=N)


@pytest.fixture(scope="module")
def fleet_inputs(box_map):
    key = jax.random.PRNGKey(0)
    means = jnp.tile(jnp.array([0.0, 0.0, 0.0]), (R, 1)) + 0.1 * jax.random.normal(
        key, (R, 3)
    )
    covs = jnp.tile(jnp.diag(jnp.array([0.05, 0.05, 0.02])), (R, 1, 1))
    states = fleet_init(PARAMS, key, means, covs)
    angles = jnp.linspace(-2.0, 2.0, B)
    scans = PlanarScan(
        ranges=jnp.tile(jnp.full((B,), 0.9), (R, 1)),
        angles=jnp.tile(angles, (R, 1)),
        range_max=jnp.full((R,), 5.0),
    )
    pools = jnp.zeros((R, N, 3))
    odom_poses = jnp.tile(jnp.array([0.0, 0.0, 0.0]), (R, 1))
    odom_deltas = jnp.tile(jnp.array([0.05, 0.0, 0.01]), (R, 1))
    alphas = jnp.full((5,), 0.05)
    return states, scans, pools, odom_poses, odom_deltas, alphas


@pytest.mark.slow
def test_fleet_vmapped_step(box_map, fleet_inputs):
    states, scans, pools, odom_poses, odom_deltas, alphas = fleet_inputs
    step = make_fleet_step(PARAMS)
    out = step(states, box_map, PlanarScanParams(), scans, pools,
               odom_poses, odom_deltas, odom_deltas, alphas)
    assert out.poses.shape == (R, N, 3)
    assert out.weights.shape == (R, N)
    # every robot resampled to a valid population
    n = np.asarray(out.n_active)
    assert ((n >= PARAMS.min_samples) & (n <= N)).all()
    # robots evolve independently: different keys -> different poses
    assert not np.allclose(np.asarray(out.poses[0]), np.asarray(out.poses[1]))
    h = fleet_health(out)
    assert 0.0 <= float(h["converged_frac"]) <= 1.0


@pytest.mark.slow
def test_fleet_batched_corr_matches_xla():
    """The single-call batched-robot corr kernel must agree with the exact
    per-robot XLA likelihood at the corr backend's usual lattice tolerance,
    for robots scattered across the map with differing scans."""
    from badger_amcl_tpu.fleet.fleet import _fleet_likelihood
    from badger_amcl_tpu.maps import CellState, OccupancyMap2D
    from badger_amcl_tpu.sensors.planar import bake_corr_texture, planar_likelihood

    rng = np.random.default_rng(7)
    n = 448
    cells = np.full((n, n), int(CellState.FREE), np.int8)
    cells[0:2, :] = cells[-2:, :] = int(CellState.OCCUPIED)
    cells[:, 0:2] = cells[:, -2:] = int(CellState.OCCUPIED)
    for _ in range(12):
        cx, cy = rng.integers(20, n - 28, 2)
        cells[cy : cy + 6, cx : cx + 6] = int(CellState.OCCUPIED)
    omap = OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)
    sp = PlanarScanParams()
    omap = bake_corr_texture(omap, sp, 6.0, "likelihood_field")

    r, m, b = 4, 256, 48
    key = jax.random.PRNGKey(1)
    means = jnp.array([[0.0, 0.0, 0.1], [2.5, -1.5, 1.2],
                       [-3.0, 2.0, -0.7], [1.0, 4.0, 2.9]])
    covs = jnp.tile(jnp.diag(jnp.array([0.02, 0.02, 0.002])), (r, 1, 1))
    states = fleet_init(PFParams(min_samples=16, max_samples=m), key, means, covs)
    angles = jnp.linspace(-2.0, 2.0, b)
    ranges = jnp.stack([
        jnp.clip(1.2 + 0.5 * jnp.sin(angles * (2.0 + i)), 0.3, 2.5)
        for i in range(r)
    ])
    scans = PlanarScan(
        ranges=ranges.astype(jnp.float32),
        angles=jnp.tile(angles, (r, 1)).astype(jnp.float32),
        range_max=jnp.full((r,), 6.0, jnp.float32),
    )

    p_fast, mf_fast = _fleet_likelihood(
        omap, sp, scans, states, "likelihood_field", "pallas_corr_interpret"
    )
    # exact XLA reference, robot by robot
    p_ref = jnp.stack([
        planar_likelihood(
            omap, sp,
            PlanarScan(ranges=scans.ranges[i], angles=scans.angles[i],
                       range_max=scans.range_max[i]),
            states.poses[i], states.active_mask[i], states.n_active[i],
            "likelihood_field",
        )[0]
        for i in range(r)
    ])
    px, pf = np.asarray(p_ref, np.float64), np.asarray(p_fast, np.float64)
    rel = np.abs(pf - px) / np.maximum(px, 1e-12)
    assert rel.max() < 0.35, rel.max()
    assert rel.mean() < 0.08, rel.mean()
    # estimator-level agreement per robot
    for i in range(r):
        wx = px[i] / px[i].sum()
        wf = pf[i] / pf[i].sum()
        mx = (wx[:, None] * np.asarray(states.poses[i])).sum(0)
        mf_ = (wf[:, None] * np.asarray(states.poses[i])).sum(0)
        np.testing.assert_allclose(mf_[:2], mx[:2], atol=8e-3)


@pytest.mark.slow
def test_fleet_sharded_step_matches_local(box_map, fleet_inputs):
    states, scans, pools, odom_poses, odom_deltas, alphas = fleet_inputs
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devices[:8]), ("fleet",))

    local_step = make_fleet_step(PARAMS)
    want = local_step(states, box_map, PlanarScanParams(), scans, pools,
                      odom_poses, odom_deltas, odom_deltas, alphas)

    sharded_step = make_sharded_fleet_step(mesh, PARAMS)
    shard = NamedSharding(mesh, P("fleet"))
    states_s = jax.device_put(states, shard)
    got = sharded_step(states_s, box_map, PlanarScanParams(), scans, pools,
                       odom_poses, odom_deltas, odom_deltas, alphas)
    # identical PRNG keys + identical inputs -> identical trajectories
    np.testing.assert_allclose(
        np.asarray(got.poses), np.asarray(want.poses), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.n_active), np.asarray(want.n_active))
    # the output really is sharded across the mesh
    assert len(got.poses.sharding.device_set) == 8

    h = fleet_health(got, mesh=mesh)
    h_local = fleet_health(want)
    np.testing.assert_allclose(
        float(h["mean_active"]), float(h_local["mean_active"]), rtol=1e-6
    )
