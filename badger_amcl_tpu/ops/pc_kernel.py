"""Pallas TPU kernel: windowed voxel-EDT gather for the 3D point-cloud models.

Same coherence argument as the 2D windowed kernel (lf_kernel.py), lifted to
the voxel field: particles share a pose lattice in (x, y, yaw) only — the
cloud transform is a pure z-rotation plus planar translation
(getMapCloud, point_cloud_scanner.cpp:231-248) — so each cloud point's
z-slab k_b = round(q_b.z / res) is *constant across particles*, and across
particles point b's (x, y) cells live in a small window. Per (particle-tile,
point): dynamic-slice the point's window from the z-major uint8 EDT texture,
extract each particle's cell with the one-hot MXU contraction. Exact (the
uint8 ratios are the storage format — no further quantization).

Falls back to the XLA gather when the spread exceeds the window or the
texture exceeds VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_ROWS = 64  # texture rows (j / y) per point window (usable span after
# the 32-row alignment of the load origin is WIN_ROWS - 31)
WIN_COLS = 256  # texture cols (i / x) per point window
TILE_M = 256  # particles per tile
LOAD_R = WIN_ROWS + 32  # uint8 sublane alignment is 32
MAX_TEX_BYTES = 10 * 1024 * 1024  # VMEM budget for the z-major uint8 texture


def _kernel(
    # scalar prefetch (SMEM)
    row0_ref,  # (B,) int32 window row origin per point (aligned to 32)
    col0_ref,  # (B,) int32 window col origin per point (aligned to 128)
    slab_ref,  # (B,) int32 z-slab per point
    qx_ref,  # (B,) f32 point coords in the footprint frame
    qy_ref,
    # VMEM
    tex_ref,  # (nz, ny, nx) uint8 distance ratios (z-major)
    px_ref,  # (1, TM) f32 particle x
    py_ref,
    pth_ref,
    out_ref,  # (B, TM) f32 distance ratios at each (point, particle)
    *,
    n_points: int,
    inv_res: float,
    size_x: int,
    size_y: int,
    min_i: int,
    min_j: int,
):
    px = px_ref[:]
    py = py_ref[:]
    pth = pth_ref[:]
    c = jnp.cos(pth)
    s = jnp.sin(pth)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_COLS, px.shape[1]), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, px.shape[1]), 0)

    def body(b, _):
        qx = qx_ref[b]
        qy = qy_ref[b]
        ex = px + c * qx - s * qy
        ey = py + s * qx + c * qy
        # world -> voxel cells: floor(x/res + 0.5) (octomap.cpp:98-109),
        # texture-local
        ci = jnp.floor(ex * inv_res + 0.5).astype(jnp.int32) - min_i
        cj = jnp.floor(ey * inv_res + 0.5).astype(jnp.int32) - min_j
        valid = (ci >= 0) & (ci < size_x) & (cj >= 0) & (cj < size_y)
        r0 = row0_ref[b]
        c0 = col0_ref[b]
        lr = jnp.clip(cj - r0, 0, WIN_ROWS - 1)
        lc = jnp.clip(ci - c0, 0, WIN_COLS - 1)
        window = tex_ref[
            pl.ds(slab_ref[b], 1),
            pl.ds(pl.multiple_of(r0, 32), LOAD_R),
            pl.ds(pl.multiple_of(c0, 128), WIN_COLS),
        ].reshape(LOAD_R, WIN_COLS)
        wf = window[0:WIN_ROWS, :].astype(jnp.int32).astype(jnp.bfloat16)  # u8->bf16 unsupported directly
        colhot = (col_iota == lc).astype(jnp.bfloat16)  # (WC, TM)
        picked = jax.lax.dot_general(
            wf, colhot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (WR, TM)
        rowhot = row_iota == lr
        ratio = jnp.sum(jnp.where(rowhot, picked, 0.0), axis=0, keepdims=True)
        out_ref[pl.ds(b, 1), :] = jnp.where(valid, ratio, 255.0)
        return 0

    jax.lax.fori_loop(0, n_points, body, 0, unroll=False)


def tex_fits(omap) -> bool:
    nx = omap.max_cells[0] - omap.min_cells[0] + 1
    ny = omap.max_cells[1] - omap.min_cells[1] + 1
    nz = omap.max_cells[2] - omap.min_cells[2] + 1
    return (
        nz * ny * nx <= MAX_TEX_BYTES
        and ny >= LOAD_R
        and nx >= WIN_COLS
    )


def window_origins(omap, points_base, poses):
    """Per-point window origins + fits flag. Fused XLA reductions over the
    (M, B) transformed cells; nothing materialized."""
    inv_res = 1.0 / omap.resolution
    c = jnp.cos(poses[:, 2])[:, None]
    s = jnp.sin(poses[:, 2])[:, None]
    qx = points_base[None, :, 0]
    qy = points_base[None, :, 1]
    ex = poses[:, 0][:, None] + c * qx - s * qy
    ey = poses[:, 1][:, None] + s * qx + c * qy
    ci = jnp.floor(ex * inv_res + 0.5).astype(jnp.int32) - omap.min_cells[0]
    cj = jnp.floor(ey * inv_res + 0.5).astype(jnp.int32) - omap.min_cells[1]
    nx = omap.max_cells[0] - omap.min_cells[0] + 1
    ny = omap.max_cells[1] - omap.min_cells[1] + 1
    inb = (ci >= 0) & (ci < nx) & (cj >= 0) & (cj < ny)
    big = jnp.int32(1 << 30)
    ci_min = jnp.min(jnp.where(inb, ci, big), axis=0)
    ci_max = jnp.max(jnp.where(inb, ci, -big), axis=0)
    cj_min = jnp.min(jnp.where(inb, cj, big), axis=0)
    cj_max = jnp.max(jnp.where(inb, cj, -big), axis=0)
    # clamp into the texture first; fits is then judged on the usable window
    row0 = jnp.clip(jnp.where(cj_min == big, 0, cj_min), 0, max(ny - LOAD_R, 0)) & ~31
    col0 = jnp.clip(jnp.where(ci_min == big, 0, ci_min), 0, max(nx - WIN_COLS, 0)) & ~127
    fits = jnp.all(
        (ci_max - col0 < WIN_COLS) & (ci_min - col0 >= 0)
        & (cj_max - row0 < WIN_ROWS) & (cj_min - row0 >= 0)
        # all-out-of-bounds points have inverted extrema: treat as fitting
        | ((ci_min == big) & (cj_min == big))
    )
    kz = (
        jnp.floor(points_base[:, 2] * inv_res + 0.5).astype(jnp.int32)
        - omap.min_cells[2]
    )
    nz = omap.max_cells[2] - omap.min_cells[2] + 1
    slab_ok = jnp.all((kz >= 0) & (kz < nz))
    # out-of-z-range points read max distance; handled by falling back (rare:
    # the reference's cloud filter keeps points inside the map's z band)
    return row0.astype(jnp.int32), col0.astype(jnp.int32), kz.astype(jnp.int32), fits & slab_ok


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _pc_call(tex_zyx, row0, col0, kz, qx, qy, px, py, pth, geom, interpret=False):
    n_points = qx.shape[0]
    inv_res, size_x, size_y, min_i, min_j = geom
    m_pad = px.shape[1]
    kern = functools.partial(
        _kernel, n_points=n_points, inv_res=inv_res,
        size_x=size_x, size_y=size_y, min_i=min_i, min_j=min_j,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec(tex_zyx.shape, lambda t, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_points, TILE_M), lambda t, *_: (0, t),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_points, m_pad), jnp.float32),
        interpret=interpret,
    )(row0, col0, kz, qx, qy, tex_zyx, px, py, pth)


def pc_distances_t(omap, points_base, poses, interpret: bool = False):
    """(B, M) distances (meters) at every transformed cloud point: windowed
    kernel when concentrated, XLA voxel gather otherwise."""
    def xla(_):
        from badger_amcl_tpu.sensors.point_cloud import transform_cloud_to_map

        cloud = transform_cloud_to_map(points_base, poses)  # (M, B, 3)
        return omap.distance_at(omap.world_to_map(cloud)).T

    if not tex_fits(omap):
        return xla(None)

    row0, col0, kz, fits = window_origins(omap, points_base, poses)
    return jax.lax.cond(
        fits,
        lambda _: windowed_distances(
            omap, points_base, poses, row0, col0, kz, interpret=interpret),
        xla, operand=None,
    )


def windowed_distances(omap, points_base, poses, row0, col0, kz,
                       interpret: bool = False):
    """(B, M) distances via the per-point windowed kernel (callers must
    have checked tex_fits + window_origins' fits)."""
    tex_zyx = jnp.transpose(omap.distances_u8, (2, 1, 0))  # (nz, ny, nx)
    m = poses.shape[0]
    m_pad = -(-m // TILE_M) * TILE_M
    px = jnp.zeros((1, m_pad), jnp.float32).at[0, :m].set(poses[:, 0])
    py = jnp.zeros((1, m_pad), jnp.float32).at[0, :m].set(poses[:, 1])
    pth = jnp.zeros((1, m_pad), jnp.float32).at[0, :m].set(poses[:, 2])
    geom = (
        float(1.0 / omap.resolution),
        omap.max_cells[0] - omap.min_cells[0] + 1,
        omap.max_cells[1] - omap.min_cells[1] + 1,
        omap.min_cells[0],
        omap.min_cells[1],
    )

    ratios = _pc_call(
        tex_zyx, row0, col0, kz,
        points_base[:, 0].astype(jnp.float32),
        points_base[:, 1].astype(jnp.float32),
        px, py, pth, geom, interpret=interpret,
    )[:, :m]
    return ratios * jnp.float32(omap.max_distance_ratio)
