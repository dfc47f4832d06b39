"""Pallas windowed-gather likelihood kernel vs the XLA reference path.

Runs the kernel in interpreter mode on CPU; the numerical contract is
bf16-quantized texture values (<= ~0.2% of max distance), everything else
identical, with automatic fallback to the XLA path when the particle cloud
exceeds the window.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from badger_amcl_tpu.maps import CellState, OccupancyMap2D
from badger_amcl_tpu.ops import lf_kernel
from badger_amcl_tpu.sensors.planar import PlanarScan, PlanarScanParams, planar_likelihood


@pytest.fixture(scope="module")
def big_map():
    rng = np.random.default_rng(4)
    n = 448  # >= corr SLICE_C - 2*PAD_C so the corr/windowed paths are eligible
    cells = np.full((n, n), int(CellState.FREE), np.int8)
    cells[0:2, :] = cells[-2:, :] = int(CellState.OCCUPIED)
    cells[:, 0:2] = cells[:, -2:] = int(CellState.OCCUPIED)
    for _ in range(10):
        cx, cy = rng.integers(20, n - 28, 2)
        cells[cy : cy + 6, cx : cx + 6] = int(CellState.OCCUPIED)
    return OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)


def _scan(b=64, range_max=6.0):
    angles = jnp.linspace(-2.2, 2.2, b).astype(jnp.float32)
    ranges = jnp.clip(2.0 + jnp.sin(angles * 5.0), 0.3, range_max - 0.1)
    return PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(range_max))


def _tight_poses(n=600, seed=0):
    key = jax.random.PRNGKey(seed)
    return jnp.concatenate(
        [0.15 * jax.random.normal(key, (n, 2)), 0.04 * jax.random.normal(key, (n, 1))],
        axis=1,
    ).astype(jnp.float32)


def test_kernel_matches_xla_gather(big_map):
    poses = _tight_poses()
    scan = _scan()
    _, _, fits = lf_kernel.window_origins(big_map, poses, scan.ranges, scan.angles)
    assert bool(fits)
    z_kernel = lf_kernel.lf_distances(
        big_map, poses, scan.ranges, scan.angles, interpret=True
    )
    # XLA reference
    th = poses[:, 2:3] + scan.angles[None, :]
    hx = poses[:, 0:1] + scan.ranges[None, :] * jnp.cos(th)
    hy = poses[:, 1:2] + scan.ranges[None, :] * jnp.sin(th)
    ij = big_map.world_to_map(jnp.stack([hx, hy], axis=-1))
    z_xla = big_map.distance_at(ij)
    diff = np.abs(np.asarray(z_kernel) - np.asarray(z_xla))
    assert diff.max() < 0.01  # bf16 texture quantization only
    assert (diff > 0.005).mean() < 0.01


def test_spread_cloud_falls_back(big_map):
    key = jax.random.PRNGKey(3)
    poses = jnp.concatenate(
        [jax.random.uniform(key, (300, 2), minval=-7.0, maxval=7.0),
         jax.random.uniform(key, (300, 1), minval=-3.0, maxval=3.0)],
        axis=1,
    ).astype(jnp.float32)
    scan = _scan()
    _, _, fits = lf_kernel.window_origins(big_map, poses, scan.ranges, scan.angles)
    assert not bool(fits)
    # fallback path must produce the exact XLA result
    z = lf_kernel.lf_distances(big_map, poses, scan.ranges, scan.angles, interpret=True)
    th = poses[:, 2:3] + scan.angles[None, :]
    hx = poses[:, 0:1] + scan.ranges[None, :] * jnp.cos(th)
    hy = poses[:, 1:2] + scan.ranges[None, :] * jnp.sin(th)
    ij = big_map.world_to_map(jnp.stack([hx, hy], axis=-1))
    z_xla = big_map.distance_at(ij)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_xla), atol=1e-6)


def test_full_model_through_backend(big_map):
    """planar_likelihood with backend='pallas_interpret' end to end."""
    poses = _tight_poses(400, seed=5)
    scan = _scan()
    n = poses.shape[0]
    params = PlanarScanParams()
    p_x, mf_x = planar_likelihood(
        big_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field",
    )
    p_k, mf_k = planar_likelihood(
        big_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
        "likelihood_field", backend="pallas_interpret",
    )
    np.testing.assert_allclose(np.asarray(mf_k), np.asarray(mf_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x), rtol=0.02)


@pytest.mark.slow
def test_corr_backend_matches_xla(big_map):
    """Stencil-correlation backend vs exact XLA on every LF-family model.

    Lattice rounding perturbs individual particle likelihoods (up to ~25%
    for particles whose beams straddle obstacle-cell boundaries, amplified
    by pz^3); what MCL consumes is the *normalized weight distribution*, so
    the contract tested is estimator-level agreement plus a bounded
    per-particle deviation."""
    poses = _tight_poses(400, seed=7)
    scan = _scan()
    n = poses.shape[0]
    params = PlanarScanParams()
    for model in ("likelihood_field", "likelihood_field_gompertz",
                  "likelihood_field_prob"):
        p_x, _ = planar_likelihood(
            big_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n), model,
        )
        p_c, _ = planar_likelihood(
            big_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n), model,
            backend="pallas_corr_interpret",
        )
        px, pc = np.asarray(p_x, np.float64), np.asarray(p_c, np.float64)
        rel = np.abs(pc - px) / np.maximum(np.abs(px), 1e-12)
        assert rel.max() < 0.3, (model, rel.max())
        assert rel.mean() < 0.08, (model, rel.mean())
        # estimator agreement: weighted mean pose from either weighting
        wx, wc = px / px.sum(), pc / pc.sum()
        mean_x = (wx[:, None] * np.asarray(poses)).sum(0)
        mean_c = (wc[:, None] * np.asarray(poses)).sum(0)
        np.testing.assert_allclose(mean_c, mean_x, atol=5e-3)


@pytest.mark.slow
def test_corr_wide_yaw_falls_back(big_map):
    """Yaw spread beyond T_MAX bins must route to the exact fallback."""
    from badger_amcl_tpu.ops import corr_kernel

    key = jax.random.PRNGKey(9)
    poses = jnp.concatenate(
        [0.1 * jax.random.normal(key, (200, 2)),
         jax.random.uniform(key, (200, 1), minval=-3.0, maxval=3.0)],
        axis=1,
    ).astype(jnp.float32)
    scan = _scan()
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = corr_kernel.corr_prepass(big_map, poses, scan.ranges, scan.angles, valid)
    assert not bool(pre["fits"])
    n = poses.shape[0]
    p_c, _ = planar_likelihood(
        big_map, PlanarScanParams(), scan, poses, jnp.ones((n,), bool),
        jnp.int32(n), "likelihood_field", backend="pallas_corr_interpret",
    )
    p_x, _ = planar_likelihood(
        big_map, PlanarScanParams(), scan, poses, jnp.ones((n,), bool),
        jnp.int32(n), "likelihood_field",
    )
    # the wide-yaw fallback rides the sorted-tile spread kernel (the tight
    # position cloud makes every tile compact): int8 distance quantization
    # only — estimator-level agreement, bounded per-particle deviation
    px, pc = np.asarray(p_x, np.float64), np.asarray(p_c, np.float64)
    rel = np.abs(pc - px) / np.maximum(px, 1e-12)
    assert rel.max() < 0.1, rel.max()
    wx, wc = px / px.sum(), pc / pc.sum()
    mean_x = (wx[:, None] * np.asarray(poses)).sum(0)
    mean_c = (wc[:, None] * np.asarray(poses)).sum(0)
    np.testing.assert_allclose(mean_c[:2], mean_x[:2], atol=5e-3)


def test_small_map_uses_xla(box_map):
    """Maps smaller than the kernel window skip the kernel entirely."""
    poses = _tight_poses(50, seed=6)
    scan = _scan(16, range_max=4.0)
    z = lf_kernel.lf_distances(box_map, poses, scan.ranges, scan.angles, interpret=True)
    assert z.shape == (50, 16)


def test_corr_at_map_edges(big_map):
    """Active-region slicing must stay exact when the particle window sits
    at map corners/edges (origin clamping paths)."""
    from badger_amcl_tpu.ops import corr_kernel

    res = big_map.resolution
    half_w = big_map.size_x // 2 * res
    scan = _scan(32, range_max=4.0)
    params = PlanarScanParams()
    for corner in ((-half_w + 0.6, -half_w + 0.6), (half_w - 0.7, -half_w + 0.6),
                   (-half_w + 0.6, half_w - 0.7), (half_w - 0.7, half_w - 0.7)):
        key = jax.random.PRNGKey(hash(corner) % (2**31))
        poses = jnp.concatenate([
            jnp.array(corner) + 0.1 * jax.random.normal(key, (100, 2)),
            0.04 * jax.random.normal(key, (100, 1)),
        ], axis=1).astype(jnp.float32)
        valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
        pre = corr_kernel.corr_prepass(big_map, poses, scan.ranges, scan.angles, valid)
        assert bool(pre["fits"]), corner
        n = poses.shape[0]
        p_c, _ = planar_likelihood(
            big_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
            "likelihood_field", backend="pallas_corr_interpret",
        )
        p_x, _ = planar_likelihood(
            big_map, params, scan, poses, jnp.ones((n,), bool), jnp.int32(n),
            "likelihood_field",
        )
        px, pc = np.asarray(p_x, np.float64), np.asarray(p_c, np.float64)
        # per-particle deviations grow at walls (the pose-lattice rounding
        # shifts ALL of a particle's wall-hitting beams coherently); the
        # published estimator is the contract
        rel = np.abs(pc - px) / np.maximum(np.abs(px), 1e-12)
        assert rel.mean() < 0.15, (corner, rel.mean())
        wx, wc = px / px.sum(), pc / pc.sum()
        mean_x = (wx[:, None] * np.asarray(poses)).sum(0)
        mean_c = (wc[:, None] * np.asarray(poses)).sum(0)
        np.testing.assert_allclose(mean_c[:2], mean_x[:2], atol=2e-2)
