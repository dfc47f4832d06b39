"""3D point-cloud measurement models.

Both models of the reference's `PointCloudScanner`
(src/amcl/sensors/point_cloud_scanner.cpp): POINT_CLOUD_MODEL
(:132-167) and POINT_CLOUD_MODEL_GOMPERTZ (:169-203), plus the off-map
weight correction (recalcWeight, :205-229).

The reference's dominant cost is `getMapCloud` (:231-248): per particle it
builds a tf2 transform, round-trips the cloud PCL->msg->PCL and transforms
every point on the CPU. Here the scanner extrinsic is folded into the cloud
once per scan (host prep), and the per-particle part reduces to a batched
planar rotation — `(N,)` angles against `(B, 3)` points — followed by one
gather from the uint8 voxel EDT texture.

Cloud decimation to max_beams points is host-side scan prep
(node_3d.cpp:467-480), mirroring the 2D design.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from badger_amcl_tpu.maps.octomap_3d import OctoMap3D


class PointCloudParams(struct.PyTreeNode):
    """setPointCloudModel / setPointCloudModelGompertz / setMapFactors
    (point_cloud_scanner.cpp:53-83)."""

    z_hit: jnp.ndarray = struct.field(default=0.95)
    z_rand: jnp.ndarray = struct.field(default=0.05)
    sigma_hit: jnp.ndarray = struct.field(default=0.2)
    gompertz_a: jnp.ndarray = struct.field(default=1.0)
    gompertz_b: jnp.ndarray = struct.field(default=1.0)
    gompertz_c: jnp.ndarray = struct.field(default=1.0)
    input_shift: jnp.ndarray = struct.field(default=0.0)
    input_scale: jnp.ndarray = struct.field(default=1.0)
    output_shift: jnp.ndarray = struct.field(default=0.0)
    off_map_factor: jnp.ndarray = struct.field(default=1.0)
    non_free_space_factor: jnp.ndarray = struct.field(default=1.0)
    non_free_space_radius: jnp.ndarray = struct.field(default=0.0)


def transform_cloud_to_map(points_base: jnp.ndarray, poses: jnp.ndarray):
    """getMapCloud's math (point_cloud_scanner.cpp:231-248), batched.

    points_base: (B, 3) cloud already composed with the scanner->footprint
    extrinsic (host prep). poses: (N, 3) particle (x, y, yaw). The particle
    transform is a pure z-rotation + xy translation (z of the footprint is 0).
    Returns (N, B, 3)."""
    c = jnp.cos(poses[:, 2])[:, None]
    s = jnp.sin(poses[:, 2])[:, None]
    px, py, pz = points_base[:, 0][None], points_base[:, 1][None], points_base[:, 2][None]
    mx = poses[:, 0][:, None] + c * px - s * py
    my = poses[:, 1][:, None] + s * px + c * py
    mz = jnp.broadcast_to(pz, mx.shape)
    return jnp.stack([mx, my, mz], axis=-1)


def apply_gompertz(params: PointCloudParams, p):
    """applyGompertz (point_cloud_scanner.cpp:250-260)."""
    p = p * params.input_scale + params.input_shift
    p = params.gompertz_a * jnp.exp(-params.gompertz_b * jnp.exp(-params.gompertz_c * p))
    return p + params.output_shift


def _point_distances_t(omap: OctoMap3D, points_base, poses, backend="xla"):
    """(B, N) distances at every transformed cloud point. backend "pallas"
    routes through the windowed voxel kernel (ops/pc_kernel.py) with
    automatic XLA fallback."""
    if backend in ("pallas", "pallas_interpret", "pallas_corr",
                   "pallas_corr_interpret"):
        from badger_amcl_tpu.ops import pc_kernel

        return pc_kernel.pc_distances_t(
            omap, points_base, poses,
            interpret=backend.endswith("interpret"),
        )
    map_cloud = transform_cloud_to_map(points_base, poses)  # (N, B, 3)
    cells = omap.world_to_map(map_cloud)
    return omap.distance_at(cells).T  # (B, N)


def _model_term_finalize(omap, params, model, n_points):
    """(term_fn elementwise over distances, finalize over per-particle term
    sums, combine over a dense (B, N) distance matrix) for each model."""
    denom = 2.0 * params.sigma_hit * params.sigma_hit

    if model == "likelihood_field":
        def term(z):
            pz = params.z_hit * jnp.exp(-(z * z) / denom) \
                + params.z_rand / omap.max_distance_to_object
            return pz * pz * pz

        finalize = lambda s: 1.0 + s
    elif model == "likelihood_field_gompertz":
        def term(z):
            return params.z_hit * jnp.exp(-(z * z) / denom) + params.z_rand

        finalize = lambda s: apply_gompertz(params, s / n_points)
    else:  # pragma: no cover
        raise ValueError(f"unknown point cloud model {model!r}")

    combine = lambda zt: finalize(jnp.sum(term(zt), axis=0))
    return term, finalize, combine


def point_cloud_likelihood(
    omap: OctoMap3D,
    params: PointCloudParams,
    points_base: jnp.ndarray,
    poses: jnp.ndarray,
    model: str = "likelihood_field",
    backend: str = "xla",
):
    """applyModelToSampleSet (point_cloud_scanner.cpp:106-129): returns
    (p_model (N,), map_factor (N,)).

    model == "likelihood_field": pz = z_hit exp(-z^2/2s^2) + z_rand/max_dist,
        p = 1 + sum pz^3 over all points (:132-167 — every point counts,
        there is no max-range skip for clouds).
    model == "likelihood_field_gompertz": mean pz (z_rand added raw) through
        the Gompertz squash (:169-203).

    backend "pallas*" cascades: per-point windowed kernel (converged cloud,
    ops/pc_kernel.py) -> yaw-binned sorted-tile spread kernel (global
    localization, ops/pc_spread_kernel.py) -> exact XLA voxel gather."""
    term, finalize, combine = _model_term_finalize(
        omap, params, model, points_base.shape[0]
    )

    if backend in ("pallas", "pallas_interpret", "pallas_corr",
                   "pallas_corr_interpret"):
        import jax

        from badger_amcl_tpu.ops import pc_kernel, pc_spread_kernel

        interp = backend.endswith("interpret")

        def xla_fb():
            cloud = transform_cloud_to_map(points_base, poses)
            return combine(omap.distance_at(omap.world_to_map(cloud)).T)

        def spread_fb():
            if (omap.distances_u8 is None
                    or not pc_spread_kernel.tex_fits(omap)):
                return xla_fb()
            pre = pc_spread_kernel.pc_spread_prepass(
                omap, poses, points_base
            )

            def fast(_):
                s = pc_spread_kernel.pc_spread_term_sums(
                    omap, poses, points_base, pre, term, interpret=interp
                )
                return finalize(pc_spread_kernel.unsort(s, pre))

            return jax.lax.cond(
                pre["fits"], fast, lambda _: xla_fb(), operand=None
            )

        if pc_kernel.tex_fits(omap):
            row0, col0, kz, fits = pc_kernel.window_origins(
                omap, points_base, poses
            )
            p = jax.lax.cond(
                fits,
                lambda _: combine(pc_kernel.windowed_distances(
                    omap, points_base, poses, row0, col0, kz,
                    interpret=interp)),
                lambda _: spread_fb(),
                operand=None,
            )
        else:
            p = spread_fb()
    else:
        p = combine(_point_distances_t(omap, points_base, poses, backend))
    return p, map_factors(omap, params, poses)


def map_factors(omap: OctoMap3D, params: PointCloudParams, poses):
    """recalcWeight (point_cloud_scanner.cpp:205-229): only the off-map
    penalty applies in 3D, judged on the particle's 2D cell validity."""
    cells = omap.world_to_map(poses[:, :2].astype(jnp.float32))
    valid = omap.is_pose_valid(cells[..., 0], cells[..., 1])
    return jnp.where(valid, 1.0, params.off_map_factor)
