"""3D windowed voxel-gather kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from badger_amcl_tpu.maps import OctoMap3D
from badger_amcl_tpu.ops import pc_kernel
from badger_amcl_tpu.sensors.point_cloud import (
    PointCloudParams,
    point_cloud_likelihood,
    transform_cloud_to_map,
)


@pytest.fixture(scope="module")
def voxel_map():
    rng = np.random.default_rng(2)
    # 20 m x 20 m x 1 m @ 0.05: texture (nz, ny, nx) = (20, 400, 400) = 3.2 MB
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
    assert pc_kernel.tex_fits(m)
    return m


def _cloud(b=96, seed=3):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(-np.pi, np.pi, b)
    r = rng.uniform(0.5, 4.0, b)
    z = rng.uniform(0.1, 0.9, b)
    return jnp.asarray(
        np.stack([r * np.cos(ang), r * np.sin(ang), z], axis=1), jnp.float32
    )


def _poses(n=300, center=(10.0, 10.0, 0.7), seed=5):
    key = jax.random.PRNGKey(seed)
    base = jnp.asarray(center, jnp.float32)
    noise = jnp.concatenate(
        [0.12 * jax.random.normal(key, (n, 2)), 0.05 * jax.random.normal(key, (n, 1))],
        axis=1,
    )
    return (base[None, :] + noise).astype(jnp.float32)


@pytest.mark.slow
def test_pc_kernel_matches_xla(voxel_map):
    pts = _cloud()
    poses = _poses()
    _, _, _, fits = pc_kernel.window_origins(voxel_map, pts, poses)
    assert bool(fits)
    zt_k = pc_kernel.pc_distances_t(voxel_map, pts, poses, interpret=True)
    cloud = transform_cloud_to_map(pts, poses)
    zt_x = voxel_map.distance_at(voxel_map.world_to_map(cloud)).T
    np.testing.assert_allclose(np.asarray(zt_k), np.asarray(zt_x), atol=1e-5)


def test_pc_kernel_spread_falls_back(voxel_map):
    pts = _cloud()
    key = jax.random.PRNGKey(11)
    poses = jnp.concatenate(
        [jax.random.uniform(key, (200, 2), minval=1.0, maxval=19.0),
         jax.random.uniform(key, (200, 1), minval=-3.0, maxval=3.0)],
        axis=1,
    ).astype(jnp.float32)
    _, _, _, fits = pc_kernel.window_origins(voxel_map, pts, poses)
    assert not bool(fits)
    zt = pc_kernel.pc_distances_t(voxel_map, pts, poses, interpret=True)
    cloud = transform_cloud_to_map(pts, poses)
    zt_x = voxel_map.distance_at(voxel_map.world_to_map(cloud)).T
    np.testing.assert_allclose(np.asarray(zt), np.asarray(zt_x), atol=1e-6)


def test_pc_full_model_backend(voxel_map):
    pts = _cloud()
    poses = _poses(seed=9)
    for model in ("likelihood_field", "likelihood_field_gompertz"):
        p_x, mf_x = point_cloud_likelihood(
            voxel_map, PointCloudParams(), pts, poses, model
        )
        p_k, mf_k = point_cloud_likelihood(
            voxel_map, PointCloudParams(), pts, poses, model,
            backend="pallas_interpret",
        )
        np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(mf_k), np.asarray(mf_x))


def test_pc_out_of_z_band_falls_back(voxel_map):
    pts = np.array(_cloud())
    pts[0, 2] = 5.0  # above the map's z band
    _, _, _, fits = pc_kernel.window_origins(voxel_map, jnp.asarray(pts), _poses())
    assert not bool(fits)
