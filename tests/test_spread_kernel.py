"""Yaw-binned sorted-tile spread kernel (ops/spread_kernel.py) vs the XLA
exact path.

Interpreter mode on CPU. Numerical contract: distances quantized to
max_distance/127 (~16 mm at the 2 m default) on BOTH the kernel tiers and
the escape arm, everything else exact; the full-model comparison is
estimator-level like the corr kernel's.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from badger_amcl_tpu.maps import CellState, OccupancyMap2D
from badger_amcl_tpu.ops import spread_kernel
from badger_amcl_tpu.sensors.planar import PlanarScan, PlanarScanParams, planar_likelihood


@pytest.fixture(scope="module")
def huge_map():
    rng = np.random.default_rng(11)
    n = 512  # >= COLS1 so the spread kernel is eligible
    cells = np.full((n, n), int(CellState.FREE), np.int8)
    cells[0:2, :] = cells[-2:, :] = int(CellState.OCCUPIED)
    cells[:, 0:2] = cells[:, -2:] = int(CellState.OCCUPIED)
    for _ in range(24):
        cx, cy = rng.integers(16, n - 24, 2)
        cells[cy : cy + 6, cx : cx + 6] = int(CellState.OCCUPIED)
    return OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)


def _scan(b=24, range_max=6.0):
    angles = jnp.linspace(-2.2, 2.2, b).astype(jnp.float32)
    ranges = jnp.clip(2.0 + jnp.sin(angles * 5.0), 0.3, 2.5)
    return PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(range_max))


def _spread_poses(n=4000, seed=3, half=4.0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    return jnp.concatenate(
        [jax.random.uniform(k1, (n, 2), minval=-half, maxval=half),
         jax.random.uniform(k2, (n, 1), minval=-3.14, maxval=3.14)],
        axis=1,
    ).astype(jnp.float32)


def _xla_distances(omap, poses, scan):
    th = poses[None, :, 2] + scan.angles[:, None]
    hx = poses[None, :, 0] + scan.ranges[:, None] * jnp.cos(th)
    hy = poses[None, :, 1] + scan.ranges[:, None] * jnp.sin(th)
    ij = omap.world_to_map(jnp.stack([hx, hy], axis=-1))
    return omap.distance_at(ij)


def test_spread_term_sums_match_xla(huge_map):
    """Kernel term sums (identity term: sum of distances) vs the exact XLA
    gather: agreement to the quantization + bf16-term contract. Also
    asserts most pairs ride the kernel tiers (no silent wholesale
    escape)."""
    poses = _spread_poses()
    scan = _scan()
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = spread_kernel.spread_prepass(
        huge_map, poses, scan.ranges, scan.angles, valid
    )
    assert bool(pre["fits"]), "spread cloud with short beams must fit"
    flags = np.asarray(pre["flags"])[: pre["n_tiles"]]
    assert (flags < spread_kernel.ESCAPE).mean() > 0.5, \
        "most pairs should ride the kernel tiers"
    s = spread_kernel.spread_term_sums(
        huge_map, poses, scan.ranges, scan.angles, valid, pre,
        lambda z: z, interpret=True,
    )
    got = np.asarray(spread_kernel.unsort(s, pre))
    z_xla = np.asarray(_xla_distances(huge_map, poses, scan), np.float64)
    want = (z_xla * np.asarray(valid)[:, None]).sum(0)
    b = scan.ranges.shape[0]
    # per-beam error: int8 quantization (+-8 mm) + rare one-cell floor
    # flips (res*sqrt(2))
    tol = b * 0.009 + 3 * huge_map.resolution * 1.5
    np.testing.assert_allclose(got, want, atol=tol)
    # tighter distributional check: the MEAN error is quantization-level
    assert np.abs(got - want).mean() < b * 0.01, np.abs(got - want).mean()


def test_spread_term_sums_with_escape(huge_map):
    """Dense core + far-flung full-yaw stragglers with LONG beams: some
    (tile, group) pairs must escape, and the merged kernel+escape sums must
    still match the exact XLA reduction."""
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    dense = jnp.concatenate([
        jax.random.uniform(k1, (3500, 2), minval=-1.5, maxval=1.5),
        jax.random.uniform(k2, (3500, 1), minval=-3.14, maxval=3.14),
    ], axis=1)
    strag = jnp.concatenate([
        jax.random.uniform(k3, (60, 2), minval=-11.0, maxval=11.0),
        jax.random.uniform(jax.random.PRNGKey(7), (60, 1),
                           minval=-3.14, maxval=3.14),
    ], axis=1)
    poses = jnp.concatenate([dense, strag], axis=0).astype(jnp.float32)
    angles = jnp.linspace(-2.2, 2.2, 24).astype(jnp.float32)
    ranges = jnp.clip(4.0 + 2.0 * jnp.sin(angles * 5.0), 0.3, 6.5)
    scan = PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(8.0))
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = spread_kernel.spread_prepass(
        huge_map, poses, scan.ranges, scan.angles, valid
    )
    assert int(pre["n_escape"]) > 0, "stragglers should force escape pairs"
    assert bool(pre["fits"]), "escape capacity should absorb the stragglers"

    term = lambda z: z * z  # arbitrary elementwise beam term
    s = spread_kernel.spread_term_sums(
        huge_map, poses, scan.ranges, scan.angles, valid, pre, term,
        interpret=True,
    )
    got = np.asarray(spread_kernel.unsort(s, pre))
    z_xla = np.asarray(_xla_distances(huge_map, poses, scan), np.float64)
    want = (z_xla ** 2 * np.asarray(valid)[:, None]).sum(0)
    # quantization: |z_k - z| <= q/2 => |z_k^2 - z^2| <~ q * z_max per beam
    tol = 0.016 * 2.0 * scan.ranges.shape[0]
    np.testing.assert_allclose(got, want, atol=tol)


def test_spread_full_model_estimator_agreement(huge_map):
    poses = _spread_poses(3000, seed=9)
    scan = _scan()
    n = poses.shape[0]
    params = PlanarScanParams()
    p_x, _ = planar_likelihood(
        huge_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field",
    )
    # pallas_corr routes: corr (fails: spread) -> spread kernel
    p_s, _ = planar_likelihood(
        huge_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field", backend="pallas_corr_interpret",
    )
    px, ps = np.asarray(p_x, np.float64), np.asarray(p_s, np.float64)
    rel = np.abs(ps - px) / np.maximum(px, 1e-12)
    assert rel.max() < 0.1, rel.max()
    wx, ws = px / px.sum(), ps / ps.sum()
    mean_x = (wx[:, None] * np.asarray(poses)).sum(0)
    mean_s = (ws[:, None] * np.asarray(poses)).sum(0)
    np.testing.assert_allclose(mean_s[:2], mean_x[:2], atol=2e-2)


def test_long_beams_in_envelope(huge_map):
    """Round 2 sent ALL long-beam spread scans to the fallback; the
    yaw-binned tiers must now cover a localized spread cloud at 5 m beams
    (100 cells) without a single escape overflow."""
    poses = _spread_poses(3000, seed=5)
    angles = jnp.linspace(-2.0, 2.0, 32).astype(jnp.float32)
    ranges = jnp.full((32,), 5.0, jnp.float32)
    scan = PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(8.0))
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = spread_kernel.spread_prepass(
        huge_map, poses, scan.ranges, scan.angles, valid
    )
    assert bool(pre["fits"])
    n = poses.shape[0]
    params = PlanarScanParams()
    p_x, _ = planar_likelihood(
        huge_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field",
    )
    p_f, _ = planar_likelihood(
        huge_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field", backend="pallas_corr_interpret",
    )
    # quantization-level agreement only (the kernel path runs): worst-case
    # per-beam |d pz^3| from the +-8 mm quantization is ~3 pz^2 z_hit z/s^2
    # ~ 0.07 at sigma_hit = 0.2, so p = 1 + sum pz^3 can move a few percent
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_x), rtol=6e-2)


def test_escape_overflow_falls_back(huge_map):
    """A deeply map-wide sparse cloud with many beams overflows CAP_PAIRS;
    the dispatch must return the exact XLA result."""
    poses = _spread_poses(16000, seed=13, half=12.0)
    angles = jnp.linspace(-2.0, 2.0, 160).astype(jnp.float32)
    ranges = jnp.full((160,), 5.0, jnp.float32)
    scan = PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(8.0))
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = spread_kernel.spread_prepass(
        huge_map, poses, scan.ranges, scan.angles, valid
    )
    assert not bool(pre["fits"])
    n = poses.shape[0]
    params = PlanarScanParams()
    p_x, _ = planar_likelihood(
        huge_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field",
    )
    p_f, _ = planar_likelihood(
        huge_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field", backend="pallas_corr_interpret",
    )
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_x), rtol=2e-3)


def test_unsort_roundtrip():
    vals = jnp.arange(10.0)
    perm = jnp.array([3, 1, 4, 0, 2, 9, 5, 8, 7, 6], jnp.int32)
    pre = {"perm": perm}
    # sorted values are vals[perm]; unsort must restore original order
    restored = spread_kernel.unsort(vals[perm], pre)
    np.testing.assert_array_equal(np.asarray(restored), np.asarray(vals))


def test_wall_adjacent_cloud_stays_in_envelope():
    """A global-loc cloud beside a map wall shoots half its beams off-map;
    bbox clamping must not send edge-touching pairs to the escape arm
    (dilate-before-clip + per-beam interval products, spread_kernel.py).
    Regression: this geometry fell back wholesale (10990 escapes)."""
    import numpy as np

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu.ops import spread_kernel as sk
    from badger_amcl_tpu.sensors import raycast
    from badger_amcl_tpu.sensors.planar import coord_add

    mean = (-23.0, 0.0, 2.6)
    omap, params, state, scan, scan_params, pool = _build_setup(
        20_000, 720, 1024, pose_cov=(2.0, 2.0, 1.0), min_particles=20_000,
        pose_mean=mean)
    mean_a = jnp.asarray(mean, jnp.float32)
    rc = raycast.calc_range(
        omap, mean_a[0:1], mean_a[1:2], (mean_a[2] + scan.angles)[None, :],
        scan.range_max)[0]
    scan = scan.replace(ranges=jnp.clip(rc, 0.2, 7.9).astype(jnp.float32))
    spose = coord_add(scan_params.scanner_pose, state.poses)
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = sk.spread_prepass(omap, spose, scan.ranges, scan.angles, valid)
    assert bool(pre["fits"])
    flags = np.asarray(pre["flags"])
    n_esc = int((flags == sk.ESCAPE).sum())
    total = int(flags.size)
    assert n_esc <= sk.CAP_PAIRS, (n_esc, total)
