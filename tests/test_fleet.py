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


def _uniform_pools(key, r, m, lo=-1.8, hi=1.8):
    """(R, M, 3) uniform free-space-ish pose pools over the box map interior."""
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (r, m, 2), minval=lo, maxval=hi)
    th = jax.random.uniform(k2, (r, m, 1), minval=-np.pi, maxval=np.pi)
    return jnp.concatenate([xy, th], axis=-1)


@pytest.mark.slow
def test_fleet_production_shape_sharded(box_map):
    """The VERDICT-r3 production-shaped sharded run: 16 robots x 2k
    particles x 60 beams (the reference's 2D production config scale,
    examples/badger_amcl_2d.launch:50-51,70-79) on the 8-device mesh, with
    the same value asserts as the toy-shape test."""
    from badger_amcl_tpu.sensors.raycast import calc_range

    r, n, b = 16, 2048, 60
    params = PFParams(min_samples=256, max_samples=n)
    key = jax.random.PRNGKey(3)
    means = jnp.concatenate(
        [jax.random.uniform(key, (r, 2), minval=-1.2, maxval=1.2),
         jax.random.uniform(jax.random.PRNGKey(4), (r, 1), minval=-3.0, maxval=3.0)],
        axis=1,
    )
    covs = jnp.tile(jnp.diag(jnp.array([0.05, 0.05, 0.02])), (r, 1, 1))
    states = fleet_init(params, key, means, covs)
    angles = jnp.linspace(-2.2, 2.2, b).astype(jnp.float32)
    # per-robot scans raycast from each robot's true (mean) pose
    ranges = jax.vmap(
        lambda p: calc_range(box_map, p[0], p[1], p[2] + angles, 5.0)
    )(means)
    scans = PlanarScan(
        ranges=ranges.astype(jnp.float32),
        angles=jnp.tile(angles, (r, 1)),
        range_max=jnp.full((r,), 5.0, jnp.float32),
    )
    pools = _uniform_pools(jax.random.PRNGKey(5), r, n)
    odom_poses = jnp.zeros((r, 3))
    odom_deltas = jnp.tile(jnp.array([0.03, 0.0, 0.01]), (r, 1))
    alphas = jnp.full((5,), 0.05)

    local_step = make_fleet_step(params)
    want = local_step(states, box_map, PlanarScanParams(), scans, pools,
                      odom_poses, odom_deltas, odom_deltas, alphas)

    devices = jax.devices()
    mesh = Mesh(np.array(devices[:8]), ("fleet",))
    sharded_step = make_sharded_fleet_step(mesh, params)
    shard = NamedSharding(mesh, P("fleet"))
    states_s = jax.device_put(states, shard)
    got = sharded_step(states_s, box_map, PlanarScanParams(), scans, pools,
                       odom_poses, odom_deltas, odom_deltas, alphas)
    np.testing.assert_allclose(
        np.asarray(got.poses), np.asarray(want.poses), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(got.n_active), np.asarray(want.n_active))
    np.testing.assert_allclose(
        np.asarray(got.stats.mean), np.asarray(want.stats.mean), atol=1e-4)
    assert len(got.poses.sharding.device_set) == 8
    # every robot's population stayed within the KLD bounds
    na = np.asarray(got.n_active)
    assert ((na >= params.min_samples) & (na <= n)).all()


@pytest.mark.slow
def test_fleet_subset_global_localization():
    """Recovery of a sharded-fleet SUBSET: robots 0-2 are kidnapped and
    re-initialized via fleet_reinit_masked (the batched global-localization
    service, node.cpp:870-883) while robots 3-7 keep tracking. The
    untouched robots' trajectories must be bit-identical to a run without
    the reinit; the recovered robots must re-concentrate.

    Map: the sim's 12 x 12 m pillar room (a tiny box map is too weakly
    discriminative — a wrong pose's endpoints always land near SOME wall,
    so the selection ratio per resample barely beats sampling drift)."""
    from badger_amcl_tpu.fleet.fleet import fleet_reinit_masked
    from badger_amcl_tpu.maps import CellState, OccupancyMap2D
    from badger_amcl_tpu.sensors.planar import planar_likelihood
    from badger_amcl_tpu.sensors.raycast import calc_range

    nmap = 240
    data = np.full((nmap, nmap), int(CellState.FREE), np.int8)
    data[0:2, :] = data[-2:, :] = int(CellState.OCCUPIED)
    data[:, 0:2] = data[:, -2:] = int(CellState.OCCUPIED)
    rng = np.random.default_rng(42)
    for _ in range(12):
        cx, cy = rng.integers(30, 210, 2)
        data[cy : cy + 8, cx : cx + 8] = int(CellState.OCCUPIED)
    room = OccupancyMap2D.from_cells(data, 0.05).with_distance_field(2.0)

    r, n, b = 8, 512, 48
    params = PFParams(min_samples=64, max_samples=n)
    key = jax.random.PRNGKey(11)
    true_poses = jnp.array(
        [[-2.2, -3.0, 0.3], [3.3, -2.2, 2.0], [-3.0, 3.2, -1.2],
         [0.5, 0.0, 0.0], [-0.5, -4.3, 1.0], [4.5, 3.4, -2.5],
         [0.0, -1.4, 0.7], [-4.5, 0.2, 3.0]], jnp.float32)
    covs = jnp.tile(jnp.diag(jnp.array([0.03, 0.03, 0.01])), (r, 1, 1))
    states = fleet_init(params, key, true_poses, covs)
    angles = jnp.linspace(-2.2, 2.2, b).astype(jnp.float32)
    ranges = jax.vmap(
        lambda p: calc_range(room, p[0], p[1], p[2] + angles, 8.0)
    )(true_poses)
    scans = PlanarScan(
        ranges=ranges.astype(jnp.float32),
        angles=jnp.tile(angles, (r, 1)),
        range_max=jnp.full((r,), 8.0, jnp.float32),
    )
    odom_poses = jnp.zeros((r, 3))
    zero_deltas = jnp.zeros((r, 3))
    alphas = jnp.full((5,), 0.02)

    devices = jax.devices()
    mesh = Mesh(np.array(devices[:8]), ("fleet",))
    sharded_step = make_sharded_fleet_step(mesh, params)
    shard = NamedSharding(mesh, P("fleet"))

    mask = jnp.arange(r) < 3
    # GL seeding mirrors the reference's uniformPoseGenerator: uniform
    # candidates filtered by scorePose (node.cpp:847-868) — here the best
    # n of 4096 scored uniform draws per robot (the batched equivalent of
    # the rejection loop with a decaying threshold).
    cand = _uniform_pools(jax.random.PRNGKey(12), r, 4096, lo=-5.5, hi=5.5)

    def score_pool(poses_c, scan_r, scan_a, scan_m):
        s = PlanarScan(ranges=scan_r, angles=scan_a, range_max=scan_m)
        p, mf = planar_likelihood(
            room, PlanarScanParams(), s, poses_c,
            jnp.ones((4096,), bool), jnp.int32(4096), "likelihood_field",
            fold_factors=True)
        score = p if mf is None else p * mf
        top = jnp.argsort(-score)[:n]
        return jnp.take(poses_c, top, axis=0)

    pose_pools = jax.vmap(score_pool)(
        cand, scans.ranges, scans.angles, scans.range_max)

    def run(reinit):
        st = jax.device_put(states, shard)
        if reinit:
            st = fleet_reinit_masked(st, mask, pose_pools, params)
            c0 = np.asarray(st.stats.cov)
            spread0 = c0[:, 0, 0] + c0[:, 1, 1]
        else:
            spread0 = None
        for i in range(14):
            pools = _uniform_pools(
                jax.random.PRNGKey(100 + i), r, n, lo=-5.5, hi=5.5)
            st = sharded_step(st, room, PlanarScanParams(), scans, pools,
                              odom_poses, zero_deltas, zero_deltas, alphas)
        return st, spread0

    got, spread0 = run(True)
    want, _ = run(False)

    # untouched robots: bit-identical trajectories (keys were never split)
    np.testing.assert_array_equal(
        np.asarray(got.poses[3:]), np.asarray(want.poses[3:]))
    np.testing.assert_array_equal(
        np.asarray(got.n_active[3:]), np.asarray(want.n_active[3:]))

    # recovered robots: the cloud re-concentrated (xy spread well below the
    # scored-reinit spread) and a dominant cluster emerged. Ten stationary
    # repeats of ONE scan select slowly (the p = 1 + sum pz^3 contract keeps
    # weight ratios shallow), so the bounds certify concentration, not
    # final convergence — the E2E kidnap demos cover that.
    cov_after = np.asarray(got.stats.cov)
    xy_spread_after = cov_after[:3, 0, 0] + cov_after[:3, 1, 1]
    xy_spread0 = spread0[:3]
    assert (xy_spread_after < 0.65 * xy_spread0).all(), (
        xy_spread_after, xy_spread0)
    top_w = np.asarray(jnp.max(got.stats.cluster_weights, axis=-1))[:3]
    assert (top_w > 0.3).all(), top_w


def test_fleet_resample_matches_vmapped_resample():
    """The composite-key fleet resample (pf_filter.fleet_resample) must be
    pick-for-pick EQUAL to vmap(pf_filter.resample) — same key splits and
    draws, and the composite-sort KLD stop / cluster-rank machinery is an
    exact reformulation of the per-robot grid path (round-5 fleet
    breakdown optimization)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from badger_amcl_tpu.fleet import fleet_init
    from badger_amcl_tpu.pf import filter as pf_filter
    from badger_amcl_tpu.pf.types import PFParams

    r, n = 6, 512
    params = PFParams(min_samples=32, max_samples=n, hist_x=32, hist_y=32,
                      stats_max_clusters=64)
    key = jax.random.PRNGKey(0)
    means = jnp.asarray(
        np.random.default_rng(0).uniform(-3, 3, (r, 3)), jnp.float32)
    covs = jnp.tile(jnp.diag(jnp.array([0.3, 0.3, 0.1])), (r, 1, 1))
    states = fleet_init(params, key, means, covs)
    # non-uniform weights + collapsed averages so w_diff/injection engage
    rng = np.random.default_rng(1)
    w = rng.uniform(0.5, 2.0, (r, n)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    states = states.replace(
        weights=jnp.asarray(w),
        w_slow=jnp.full((r,), 0.4, jnp.float32),
        w_fast=jnp.full((r,), 0.3, jnp.float32),
    )
    pools = jnp.asarray(rng.uniform(-4, 4, (r, n, 3)), jnp.float32)

    got = jax.jit(lambda s, p: pf_filter.fleet_resample(s, params, p))(
        states, pools)
    want = jax.jit(jax.vmap(
        lambda st, pool: pf_filter.resample(st, params, pool)
    ))(states, pools)

    np.testing.assert_array_equal(np.asarray(got.poses),
                                  np.asarray(want.poses))
    np.testing.assert_array_equal(np.asarray(got.n_active),
                                  np.asarray(want.n_active))
    np.testing.assert_array_equal(np.asarray(got.stats.cluster_count),
                                  np.asarray(want.stats.cluster_count))
    # cluster ranks are identical, so per-cluster weights line up exactly
    np.testing.assert_allclose(np.asarray(got.stats.cluster_weights),
                               np.asarray(want.stats.cluster_weights),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.stats.mean),
                               np.asarray(want.stats.mean), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.converged),
                                  np.asarray(want.converged))
