"""3D spread kernel (ops/pc_spread_kernel.py) vs the XLA exact path.

Interpret mode on CPU. Contract: the uint8 ratio texture values ARE the
distances (no further quantization) — agreement with the XLA gather is
exact up to floor()-boundary cell flips between the two f32 evaluation
orders (bounded by the field's Lipschitz constant), the same class the 2D
spread kernel documents.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from badger_amcl_tpu.maps import OctoMap3D
from badger_amcl_tpu.ops import pc_spread_kernel
from badger_amcl_tpu.sensors.point_cloud import (
    PointCloudParams,
    point_cloud_likelihood,
    transform_cloud_to_map,
)


@pytest.fixture(scope="module")
def voxel_map():
    rng = np.random.default_rng(2)
    pts = []
    n, nz = 400, 20
    for k in range(nz):
        z = (k + 0.5) * 0.05
        for i in range(0, n, 2):
            x = (i + 0.5) * 0.05
            pts += [[x, 0.025, z], [x, 20 - 0.025, z],
                    [0.025, x, z], [20 - 0.025, x, z]]
    for _ in range(30):
        cx, cy = rng.uniform(2, 18, 2)
        for k in range(nz):
            pts.append([cx, cy, (k + 0.5) * 0.05])
    m = OctoMap3D.from_occupied_points(
        np.array(pts), 0.05, 0.4, metric_min=(0, 0, 0), metric_max=(20, 20, 1.0)
    ).with_distance_field()
    assert pc_spread_kernel.tex_fits(m)
    return m


def _cloud(b=96, seed=3, z_hi=0.9):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(-np.pi, np.pi, b)
    r = rng.uniform(0.5, 3.0, b)
    z = rng.uniform(0.1, z_hi, b)
    return jnp.asarray(
        np.stack([r * np.cos(ang), r * np.sin(ang), z], axis=1), jnp.float32
    )


def _spread_poses(n=4000, seed=7, half=1.5):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    xy = 10.0 + jax.random.uniform(k1, (n, 2), minval=-half, maxval=half)
    th = jax.random.uniform(k2, (n, 1), minval=-3.14, maxval=3.14)
    return jnp.concatenate([xy, th], axis=1).astype(jnp.float32)


def _xla_sums(omap, points, poses, term):
    cloud = transform_cloud_to_map(points, poses)
    zt = omap.distance_at(omap.world_to_map(cloud)).T  # (B, N)
    return np.asarray(term(zt)).sum(axis=0)


def test_pc_spread_term_sums_match_xla(voxel_map):
    poses = _spread_poses()
    points = _cloud()
    pre = pc_spread_kernel.pc_spread_prepass(voxel_map, poses, points)
    assert bool(pre["fits"])
    fl = np.asarray(pre["flags"][: pre["n_tiles"]])
    assert (fl < 3).sum() > 0.5 * fl.size, "most pairs should ride tiers"

    term = lambda z: z * z
    s = pc_spread_kernel.pc_spread_term_sums(
        voxel_map, poses, points, pre, term, interpret=True
    )
    got = np.asarray(pc_spread_kernel.unsort(s, pre))
    want = _xla_sums(voxel_map, points, poses, lambda zt: zt * zt)
    # cell flips at floor boundaries move one term by <= Lipschitz bound
    diff = np.abs(got - want)
    assert np.mean(diff <= 1e-4) >= 0.99, np.mean(diff <= 1e-4)
    assert diff.max() < 0.4 * 0.1 * 3, diff.max()


def test_pc_spread_z_oob_constant(voxel_map):
    """Points above the voxel band must contribute the max-distance term
    for every particle (distance_at's out-of-band convention)."""
    poses = _spread_poses(1500, seed=9)
    points = _cloud(64, z_hi=0.8)
    points = points.at[:8, 2].set(5.0)  # 8 points far above the band
    pre = pc_spread_kernel.pc_spread_prepass(voxel_map, poses, points)
    assert int(pre["pts"]["n_oob"]) == 8
    term = lambda z: z
    s = pc_spread_kernel.pc_spread_term_sums(
        voxel_map, poses, points, pre, term, interpret=True
    )
    got = np.asarray(pc_spread_kernel.unsort(s, pre))
    want = _xla_sums(voxel_map, points, poses, lambda zt: zt)
    diff = np.abs(got - want)
    assert np.mean(diff <= 1e-4) >= 0.99, np.mean(diff <= 1e-4)


def test_pc_full_model_spread_dispatch(voxel_map):
    """pallas backend routes spread clouds through the 3D spread kernel and
    agrees with the XLA model at estimator level."""
    poses = _spread_poses(2000, seed=11)
    points = _cloud(64)
    params = PointCloudParams()
    p_x, _ = point_cloud_likelihood(
        voxel_map, params, points, poses, "likelihood_field", backend="xla"
    )
    p_k, _ = point_cloud_likelihood(
        voxel_map, params, points, poses, "likelihood_field",
        backend="pallas_interpret",
    )
    px, pk = np.asarray(p_x, np.float64), np.asarray(p_k, np.float64)
    rel = np.abs(pk - px) / np.maximum(px, 1e-12)
    assert np.mean(rel < 1e-5) > 0.99, np.mean(rel < 1e-5)
    wx, wk = px / px.sum(), pk / pk.sum()
    mean_x = (wx[:, None] * np.asarray(poses)).sum(0)
    mean_k = (wk[:, None] * np.asarray(poses)).sum(0)
    np.testing.assert_allclose(mean_k[:2], mean_x[:2], atol=2e-2)


def test_pc_spread_overflow_falls_back(voxel_map):
    """Deep map-wide cloud at high particle count overflows the escape
    capacity; the dispatch must return the exact XLA result."""
    poses = _spread_poses(16000, seed=13, half=9.0)
    points = _cloud(160)
    pre = pc_spread_kernel.pc_spread_prepass(voxel_map, poses, points)
    if bool(pre["fits"]):
        pytest.skip("cloud unexpectedly fits — covered by the match test")
    params = PointCloudParams()
    p_x, _ = point_cloud_likelihood(
        voxel_map, params, points, poses, "likelihood_field", backend="xla"
    )
    p_k, _ = point_cloud_likelihood(
        voxel_map, params, points, poses, "likelihood_field",
        backend="pallas_interpret",
    )
    # identical math, but fma/reassociation differs across the two jit
    # programs: rare floor-boundary cell flips move single terms a few %
    px, pk = np.asarray(p_x, np.float64), np.asarray(p_k, np.float64)
    rel = np.abs(pk - px) / np.maximum(px, 1e-12)
    assert np.mean(rel < 1e-5) > 0.99, np.mean(rel < 1e-5)
    assert rel.max() < 0.05, rel.max()
