"""Pallas TPU kernel: yaw-binned sorted-tile windowed gather for SPREAD
particle clouds against the 3D voxel EDT (point-cloud models).

3D lift of ops/spread_kernel.py — the structure carries over verbatim
because a transformed cloud point is the SAME bilinear form as a 2D beam
endpoint:  e_cell = pxc + A*cos(theta) - B*sin(theta)  with per-point
(A, B) = (qx/res, qy/res) standing in for the 2D per-beam
(r cos a / res, r sin a / res), and the point's z-slab k = cell(q_z) is
particle-independent (the particle transform is a pure z-rotation + planar
translation, getMapCloud, point_cloud_scanner.cpp:231-248).

Differences from the 2D kernel:

- the texture is the z-major (nz, ny, nx) uint8 ratio EDT
  (octomap.cpp:328-332 quantization contract — ratios ARE the values, the
  kernel adds no further quantization), and every (tile, point-group)
  window is sliced from the GROUP's slab. Points are therefore sorted by
  (slab, azimuth bucket) and each slab run padded to the group size, so a
  group never straddles slabs and its window bbox is an arc patch, not the
  whole cloud footprint.
- the one-hot contraction runs in bf16 (uint8 values reach 255, which int8
  operands can't carry); one-hot picks are exact in bf16 (single surviving
  term <= 255, f32 accumulate).
- points whose z falls outside the voxel band contribute the max-distance
  term for EVERY particle (distance_at's out-of-band convention — clouds
  have no max-range skip, point_cloud_scanner.cpp:132-167): that constant
  is added analytically, outside the kernel.

Tiers, interval-arithmetic prepass, density-class yaw-block particle sort,
capacity-bounded exact escape, and the bitcast lane-roll dynamic column
origins are shared with (imported from) the 2D module.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from badger_amcl_tpu.ops.spread_kernel import (
    BLOCK_X,
    BLOCK_Y,
    CAP_PAIRS,
    CAP_PAIRS_MAX,
    CAP_PAIRS_SMALL,
    CLASS_EDGES,
    COLS0,
    COLS_M,
    COLS1,
    COLS2,
    ESCAPE,
    LOAD_C0,
    LOAD_CM,
    LOAD_C1,
    LOAD_C2,
    NYAW,
    ROWS0,
    ROWS_M,
    ROWS1,
    ROWS2,
    TILE_M,
    _TWO_PI,
)

GRP3 = 8  # points per matmul group (groups never straddle z-slabs)
NPHI = 64  # azimuth buckets for the within-slab point sort
MAX_TEX_BYTES = 10 * 1024 * 1024  # VMEM budget for the (nz, ny, nx) texture


def _nsize(omap):
    nx = omap.max_cells[0] - omap.min_cells[0] + 1
    ny = omap.max_cells[1] - omap.min_cells[1] + 1
    nz = omap.max_cells[2] - omap.min_cells[2] + 1
    return nx, ny, nz


def tex_fits(omap) -> bool:
    nx, ny, nz = _nsize(omap)
    return (
        nx * ny * nz <= MAX_TEX_BYTES
        and ny >= ROWS1
        and nx >= LOAD_C1
    )


def point_prep(omap, points_base):
    """Sort cloud points by (z-slab, azimuth bucket) and pad every slab run
    to a multiple of GRP3 into a 2B-slot budget.

    Returns dict with per-slot A (= qx/res), B (= qy/res), slab, valid,
    plus n_oob (z out of the voxel band -> constant max-distance term) and
    a traced `ok` (padding fit the budget; slab runs <= B/GRP3-ish)."""
    b = points_base.shape[0]
    budget = 2 * b
    inv_res = jnp.float32(1.0 / omap.resolution)
    nx, ny, nz = _nsize(omap)
    kz = jnp.floor(points_base[:, 2] * inv_res + 0.5).astype(jnp.int32) \
        - omap.min_cells[2]
    z_ok = (kz >= 0) & (kz < nz)
    n_oob = jnp.sum(~z_ok).astype(jnp.int32)
    phi = jnp.arctan2(points_base[:, 1], points_base[:, 0])
    phib = jnp.clip(
        jnp.floor((phi + jnp.pi) * (NPHI / _TWO_PI)).astype(jnp.int32),
        0, NPHI - 1,
    )
    # z-oob points sort to the very end and never get slots
    key = jnp.where(z_ok, jnp.clip(kz, 0, nz - 1) * NPHI + phib, 1 << 28)
    idx = jnp.arange(b, dtype=jnp.int32)
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
    kz_s = jnp.take(jnp.where(z_ok, kz, 0), idx_s)
    ok_s = key_s < (1 << 28)

    # slab runs in sorted order -> padded slot positions
    segstart = ok_s & jnp.concatenate(
        [jnp.ones((1,), bool), kz_s[1:] != kz_s[:-1]]
    )
    pos = jnp.arange(b, dtype=jnp.int32)
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(segstart, pos, -1)
    )  # first position of my slab run
    within = pos - first
    # padded run lengths: segment lengths rounded up to GRP3
    segend = ok_s & jnp.concatenate(
        [kz_s[1:] != kz_s[:-1], jnp.ones((1,), bool)]
    )
    seg_len = jnp.where(segend, pos - first + 1, 0)
    pad_len = jnp.where(segend, -(-seg_len // GRP3) * GRP3, 0)
    # slot start of my run = cumsum of padded lengths of EARLIER runs
    pad_before = jnp.cumsum(pad_len) - pad_len  # at segend positions
    # broadcast run start backwards: suffix-min of (segend ? pad_before : big)
    run_start = jax.lax.associative_scan(
        jnp.minimum, jnp.where(segend, pad_before, 1 << 28), reverse=True
    )
    slot = jnp.where(ok_s, run_start + within, budget)  # oob -> dropped
    total_slots = jnp.max(jnp.where(segend, pad_before + pad_len, 0))
    ok = total_slots <= budget

    qa = jnp.take(points_base[:, 0], idx_s) * inv_res
    qb = jnp.take(points_base[:, 1], idx_s) * inv_res
    A = jnp.zeros((budget,), jnp.float32).at[slot].set(qa, mode="drop")
    B = jnp.zeros((budget,), jnp.float32).at[slot].set(qb, mode="drop")
    slab = jnp.zeros((budget,), jnp.int32).at[slot].set(kz_s, mode="drop")
    valid = jnp.zeros((budget,), bool).at[slot].set(ok_s, mode="drop")
    # dummy tail slots of each run must carry the run's slab (the group
    # window is sliced from it): forward-fill by segmented max over groups
    g = budget // GRP3
    slab = jnp.max(slab.reshape(g, GRP3), axis=1, keepdims=True) * jnp.ones(
        (1, GRP3), jnp.int32
    )
    slab = slab.reshape(-1)
    return {"A": A, "B": B, "slab": slab, "valid": valid,
            "n_oob": n_oob, "ok": ok, "budget": budget}


def _kernel3(
    flags_ref,  # (8, G) int32 SMEM tier per (tile, group)
    org0_ref,  # (8, G) int32 SMEM packed (row0 << 16) | col0
    orgm_ref,  # middle tier (160, 192) — round 5, mirrors the 2D ladder
    org1_ref,
    org2_ref,
    slab_ref,  # (8, G) int32 SMEM — wait: slab is tile-independent, (1, G)
    tex_ref,  # (nz, ny, nx) uint8 (VMEM)
    a_ref,  # (G, 1, GRP3*TILE_M) f32 — A, each repeated TILE_M
    b_ref,  # (G, 1, GRP3*TILE_M) f32 — B likewise
    pxc_ref,  # (1, TILE_M) f32 particle x in texture cell coords
    pyc_ref,
    ct_ref,
    st_ref,
    out_ref,  # (B_budget, TILE_M) f32 distance RATIO (0..255)
    *,
    n_groups: int,
    sizes: tuple,  # (nx, ny)
    tiers: tuple,  # statically enabled tier ids (window must fit the map)
):
    size_x, size_y = sizes
    wide = GRP3 * TILE_M
    tile8 = pl.program_id(0) % 8
    pxc8 = jnp.concatenate([pxc_ref[:]] * GRP3, axis=1)
    pyc8 = jnp.concatenate([pyc_ref[:]] * GRP3, axis=1)
    ct8 = jnp.concatenate([ct_ref[:]] * GRP3, axis=1)
    st8 = jnp.concatenate([st_ref[:]] * GRP3, axis=1)
    col_iota0 = jax.lax.broadcasted_iota(jnp.int32, (COLS0, wide), 0)
    row_iota0 = jax.lax.broadcasted_iota(jnp.int32, (ROWS0, wide), 0)
    col_iotam = jax.lax.broadcasted_iota(jnp.int32, (COLS_M, wide), 0)
    row_iotam = jax.lax.broadcasted_iota(jnp.int32, (ROWS_M, wide), 0)
    col_iota1 = jax.lax.broadcasted_iota(jnp.int32, (COLS1, wide), 0)
    row_iota1 = jax.lax.broadcasted_iota(jnp.int32, (ROWS1, wide), 0)
    col_iota2 = jax.lax.broadcasted_iota(jnp.int32, (COLS2, wide), 0)
    row_iota2 = jax.lax.broadcasted_iota(jnp.int32, (ROWS2, wide), 0)

    def body(g, _):
        av = a_ref[g]  # (1, wide)
        bv = b_ref[g]
        ci = jnp.floor(pxc8 + av * ct8 - bv * st8).astype(jnp.int32)
        cj = jnp.floor(pyc8 + bv * ct8 + av * st8).astype(jnp.int32)
        inmap = (ci >= 0) & (ci < size_x) & (cj >= 0) & (cj < size_y)
        fl = flags_ref[tile8, g]
        slab = slab_ref[tile8, g]

        def emit(z):
            z = jnp.where(inmap, z, 255.0)
            out_ref[pl.ds(g * GRP3, GRP3), :] = z.reshape(GRP3, TILE_M)

        def pick(packed, rows, cols, load_c, col_iota, row_iota):
            r0 = jax.lax.shift_right_arithmetic(packed, 16)
            c0 = packed & 0xFFFF
            cb_cap = ((size_x - load_c) // 128) * 128
            c_base = jnp.minimum((c0 // 128) * 128, cb_cap)
            dc = c0 - c_base
            win = tex_ref[pl.ds(slab, 1),
                          pl.ds(pl.multiple_of(r0, 32), rows),
                          pl.ds(pl.multiple_of(c_base, 128), load_c)]
            win = win.reshape(rows, load_c)
            # uint8 windows take the same int32-bitcast lane roll as int8
            # (bitcast packs 4 sublane rows per int32, columns preserved)
            w32 = pltpu.bitcast(win, jnp.int32)
            w32 = pltpu.roll(w32, (load_c - dc) % load_c, axis=1)
            # bf16 carries 0..255 exactly; int8 operands cannot. Mosaic has
            # no direct uint8 -> bf16 cast (hardware run fails; interpret
            # hides it) — go through int32 like pc_kernel does.
            window = pltpu.bitcast(w32, jnp.uint8)[:, :cols].astype(
                jnp.int32).astype(jnp.bfloat16)
            lr = jnp.clip(cj - r0, 0, rows - 1)
            lc = jnp.clip(ci - c0, 0, cols - 1)
            colhot = (col_iota == lc).astype(jnp.bfloat16)
            picked = jax.lax.dot_general(
                window, colhot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(
                jnp.where(row_iota == lr, picked, 0.0), axis=0, keepdims=True
            )

        # branches for tiers whose window exceeds the texture must not
        # even TRACE (the slice would be malformed); the prepass zeroes
        # their fit flags so they are never selected dynamically either
        if 0 in tiers:
            @pl.when(fl == 0)
            def _():
                emit(pick(org0_ref[tile8, g], ROWS0, COLS0, LOAD_C0,
                          col_iota0, row_iota0))

        if 1 in tiers:
            @pl.when(fl == 1)
            def _():
                emit(pick(orgm_ref[tile8, g], ROWS_M, COLS_M, LOAD_CM,
                          col_iotam, row_iotam))

        if 2 in tiers:
            @pl.when(fl == 2)
            def _():
                emit(pick(org1_ref[tile8, g], ROWS1, COLS1, LOAD_C1,
                          col_iota1, row_iota1))

        if 3 in tiers:
            @pl.when(fl == 3)
            def _():
                emit(pick(org2_ref[tile8, g], ROWS2, COLS2, LOAD_C2,
                          col_iota2, row_iota2))

        return 0

    jax.lax.fori_loop(0, n_groups, body, 0, unroll=False)


def pc_spread_prepass(omap, poses, points_base):
    """Particle (class, yaw bin, block) sort + per-(tile, point-group)
    interval bboxes and tier flags. Mirrors spread_kernel.spread_prepass
    with (A, B) = (qx, qy)/res per point-slot in place of per-beam ranges."""
    pts = point_prep(omap, points_base)
    m = poses.shape[0]
    m_pad = -(-m // TILE_M) * TILE_M
    n_tiles = m_pad // TILE_M
    budget = pts["budget"]
    g_groups = budget // GRP3
    nx, ny, nz = _nsize(omap)
    inv_res = 1.0 / omap.resolution

    # particle texture-cell coords (world_to_map: floor(x/res + .5) - min)
    pxc_all = poses[:, 0] * inv_res + (0.5 - omap.min_cells[0])
    pyc_all = poses[:, 1] * inv_res + (0.5 - omap.min_cells[1])
    ci = jnp.clip(jnp.floor(pxc_all).astype(jnp.int32), 0, nx - 1)
    cj = jnp.clip(jnp.floor(pyc_all).astype(jnp.int32), 0, ny - 1)
    nbx = -(-nx // BLOCK_X)
    nby = -(-ny // BLOCK_Y)
    bx = ci // BLOCK_X
    by = cj // BLOCK_Y
    bx_snake = jnp.where(by % 2 == 0, bx, nbx - 1 - bx)
    yb = jnp.clip(
        jnp.floor(jnp.mod(poses[:, 2], _TWO_PI) * (NYAW / _TWO_PI))
        .astype(jnp.int32), 0, NYAW - 1,
    )
    bin_block = (yb * nby + by) * nbx + bx_snake
    idx = jnp.arange(m, dtype=jnp.int32)
    kb_s, idx_s = jax.lax.sort((bin_block, idx), num_keys=1, is_stable=True)
    segstart = jnp.concatenate(
        [jnp.ones((1,), bool), kb_s[1:] != kb_s[:-1]]
    )
    segend = jnp.concatenate([kb_s[1:] != kb_s[:-1], jnp.ones((1,), bool)])
    first = jax.lax.associative_scan(jnp.maximum, jnp.where(segstart, idx, -1))
    last = jax.lax.associative_scan(
        jnp.minimum, jnp.where(segend, idx, m), reverse=True
    )
    cnt = last - first + 1
    klass = jnp.full((m,), len(CLASS_EDGES), jnp.int32)
    for c, edge in enumerate(CLASS_EDGES):
        klass = jnp.where(cnt >= edge, jnp.minimum(klass, c), klass)
    _, perm = jax.lax.sort((klass, idx_s), num_keys=1, is_stable=True)

    spose_s = jnp.take(poses, perm, axis=0)
    if m_pad != m:
        spose_s = jnp.concatenate(
            [spose_s, jnp.tile(spose_s[-1:], (m_pad - m, 1))], axis=0
        )

    pxc = spose_s[:, 0] * inv_res + (0.5 - omap.min_cells[0])
    pyc = spose_s[:, 1] * inv_res + (0.5 - omap.min_cells[1])
    ct, st = jnp.cos(spose_s[:, 2]), jnp.sin(spose_s[:, 2])

    def tile_iv(v):
        v2 = v.reshape(n_tiles, TILE_M)
        return jnp.min(v2, axis=1), jnp.max(v2, axis=1)

    pxc_lo, pxc_hi = tile_iv(pxc)
    pyc_lo, pyc_hi = tile_iv(pyc)
    ct_lo, ct_hi = tile_iv(ct)
    st_lo, st_hi = tile_iv(st)

    A1 = pts["A"]  # (P_pad,) per-point scalars
    B1 = pts["B"]
    v1 = pts["valid"]
    v2 = v1.reshape(g_groups, GRP3)
    fbig = jnp.float32(1e9)
    empty = ~jnp.any(v2, axis=1)[:, None] & jnp.ones((1, n_tiles), bool)

    # Per-POINT x per-tile interval products, then min/max reduced over each
    # group's points (the 2D spread kernel's fix, same reasoning): bounding
    # (A, B) by the group's rectangle first pairs one point's A with
    # another's B — phantom corners that dilate the bbox up to ~sqrt(2)*r
    # when radii vary within an azimuth bucket. Per-point products keep only
    # the (ct, st) yaw-box slop (~r*w^2/8 cells).
    def bprod(s_b, lo_t, hi_t):  # (P,) scalar x (T,) interval -> (P, T)
        p1 = s_b[:, None] * lo_t[None, :]
        p2 = s_b[:, None] * hi_t[None, :]
        return jnp.minimum(p1, p2), jnp.maximum(p1, p2)

    cc_lo, cc_hi = bprod(A1, ct_lo, ct_hi)  # A * ct
    ss_lo, ss_hi = bprod(B1, st_lo, st_hi)  # B * st
    sc_lo, sc_hi = bprod(B1, ct_lo, ct_hi)  # B * ct
    cs_lo, cs_hi = bprod(A1, st_lo, st_hi)  # A * st

    def group_reduce(v, sentinel, op):  # (P, T) -> (G, T) over valid points
        v = jnp.where(v1[:, None], v, sentinel)
        return op(v.reshape(g_groups, GRP3, n_tiles), axis=1)

    ex_lo = group_reduce(cc_lo - ss_hi, fbig, jnp.min)
    ex_hi = group_reduce(cc_hi - ss_lo, -fbig, jnp.max)
    ey_lo = group_reduce(sc_lo + cs_lo, fbig, jnp.min)
    ey_hi = group_reduce(sc_hi + cs_hi, -fbig, jnp.max)
    fx_lo = pxc_lo[None, :] + ex_lo
    fx_hi = pxc_hi[None, :] + ex_hi
    fy_lo = pyc_lo[None, :] + ey_lo
    fy_hi = pyc_hi[None, :] + ey_hi
    # dilate by the 1-cell fp margin BEFORE clamping to the grid: dilating
    # after pushed edge-touching mins to -1, which no clipped window origin
    # (>= 0) can satisfy, so every bbox touching the left/top edge escaped
    # (the 2D kernel's wall-adjacent-cloud bug, fixed identically there).
    fx_lo_c = jnp.clip(jnp.floor(fx_lo) - 1, -fbig, fbig).astype(jnp.int32)
    fx_hi_c = jnp.clip(jnp.floor(fx_hi) + 1, -fbig, fbig).astype(jnp.int32)
    fy_lo_c = jnp.clip(jnp.floor(fy_lo) - 1, -fbig, fbig).astype(jnp.int32)
    fy_hi_c = jnp.clip(jnp.floor(fy_hi) + 1, -fbig, fbig).astype(jnp.int32)
    ci_min = jnp.clip(fx_lo_c, 0, nx - 1)
    ci_max = jnp.clip(fx_hi_c, 0, nx - 1)
    cj_min = jnp.clip(fy_lo_c, 0, ny - 1)
    cj_max = jnp.clip(fy_hi_c, 0, ny - 1)

    def tier_fit(rows, cols, load_c):
        c_hi = ((nx - load_c) // 128) * 128 + (load_c - cols)
        row0 = jnp.clip(jnp.where(empty, 0, cj_min), 0, ny - rows) & ~31
        col0 = jnp.clip(jnp.where(empty, 0, ci_min), 0, c_hi)
        fit = empty | (
            (cj_min >= row0) & ((cj_max - row0) < rows)
            & (ci_min >= col0) & ((ci_max - col0) < cols)
        )
        return fit, (jnp.left_shift(row0, 16) | col0).astype(jnp.int32)

    fit0, org0 = tier_fit(ROWS0, COLS0, LOAD_C0)
    if not (ny >= ROWS0 and nx >= LOAD_C0):
        fit0 = jnp.zeros_like(fit0)
    fitm, orgm = tier_fit(ROWS_M, COLS_M, LOAD_CM)
    if not (ny >= ROWS_M and nx >= LOAD_CM):
        fitm = jnp.zeros_like(fitm)
    fit1, org1 = tier_fit(ROWS1, COLS1, LOAD_C1)
    if not (ny >= ROWS1 and nx >= LOAD_C1):
        fit1 = jnp.zeros_like(fit1)
    fit2, org2 = tier_fit(ROWS2, COLS2, LOAD_C2)
    if not (ny >= ROWS2 and nx >= LOAD_C2):
        fit2 = jnp.zeros_like(fit2)
    flags = jnp.where(
        fit0, 0,
        jnp.where(fitm, 1, jnp.where(fit1, 2, jnp.where(fit2, 3, ESCAPE))),
    ).astype(jnp.int32)
    n_escape = jnp.sum(flags == ESCAPE).astype(jnp.int32)

    pad8 = (-n_tiles) % 8

    def to_tiles(a):
        a = jnp.transpose(a)
        return jnp.pad(a, ((0, pad8), (0, 0))) if pad8 else a

    slab_g = jnp.max(pts["slab"].reshape(g_groups, GRP3), axis=1)
    slab_tiles = jnp.broadcast_to(
        slab_g[None, :], (n_tiles + pad8, g_groups)
    )

    return {
        "perm": perm,
        "spose_s": spose_s,
        "flags": to_tiles(flags),
        "org0": to_tiles(org0),
        "orgm": to_tiles(orgm),
        "org1": to_tiles(org1),
        "org2": to_tiles(org2),
        "slab_tiles": slab_tiles,
        "pts": pts,
        "n_escape": n_escape,
        "fits": (n_escape <= CAP_PAIRS_MAX) & pts["ok"],
        "n_tiles": n_tiles,
        "m_pad": m_pad,
        "g_groups": g_groups,
    }


@functools.partial(jax.jit, static_argnames=("sizes", "interpret"))
def _tiered_call3(sizes, tex_zyx, spose_s, pre_arrays, inv_res, mins,
                  interpret=False):
    flags, org0, orgm, org1, org2, slab_tiles, A, B = pre_arrays
    m_pad = spose_s.shape[0]
    budget = A.shape[0]
    n_groups = budget // GRP3
    n_tiles = m_pad // TILE_M
    pxc = (spose_s[:, 0] * inv_res + (0.5 - mins[0])).reshape(1, m_pad)
    pyc = (spose_s[:, 1] * inv_res + (0.5 - mins[1])).reshape(1, m_pad)
    ct = jnp.cos(spose_s[:, 2]).reshape(1, m_pad)
    st = jnp.sin(spose_s[:, 2]).reshape(1, m_pad)
    arep = jnp.repeat(A, TILE_M).reshape(n_groups, 1, GRP3 * TILE_M)
    brep = jnp.repeat(B, TILE_M).reshape(n_groups, 1, GRP3 * TILE_M)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, n_groups), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_groups), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_groups), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_groups), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_groups), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_groups), lambda t: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tex_zyx.shape, lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(arep.shape, lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(brep.shape, lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((budget, TILE_M), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
    )
    nx, ny = sizes
    tiers = tuple(
        t for t, (rr, lc) in enumerate(
            ((ROWS0, LOAD_C0), (ROWS_M, LOAD_CM), (ROWS1, LOAD_C1),
             (ROWS2, LOAD_C2)))
        if ny >= rr and nx >= lc
    )
    kern = functools.partial(
        _kernel3, n_groups=n_groups, sizes=sizes, tiers=tiers)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((budget, m_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(flags, org0, orgm, org1, org2, slab_tiles, tex_zyx, arep, brep,
      pxc, pyc, ct, st)


def _escape_term_sums3(omap, pre, term_fn, cap):
    """Exact escape arm: gather the escaped (tile, group) pairs' slots from
    the voxel texture, reduce term_fn over the group, row-scatter-add."""
    n_tiles = pre["n_tiles"]
    g = pre["g_groups"]
    flags = pre["flags"][:n_tiles]
    nx, ny, nz = _nsize(omap)
    big = jnp.int32(1 << 30)
    pid = jnp.arange(n_tiles * g, dtype=jnp.int32)
    esc_sorted = jax.lax.sort(
        jnp.where(flags.reshape(-1) == ESCAPE, pid, big), is_stable=False
    )
    ids = esc_sorted[:cap]
    pvalid = ids < n_tiles * g
    ids = jnp.clip(ids, 0, n_tiles * g - 1)
    pt = ids // g
    pg = ids % g

    poses3 = pre["spose_s"].reshape(n_tiles, TILE_M, 3)
    pp = jnp.take(poses3, pt, axis=0)  # (CAP, TILE_M, 3)
    pts = pre["pts"]
    ag = jnp.take(pts["A"].reshape(g, GRP3), pg, axis=0)  # (CAP, GRP3)
    bg = jnp.take(pts["B"].reshape(g, GRP3), pg, axis=0)
    sg = jnp.take(pts["slab"].reshape(g, GRP3), pg, axis=0)
    vg = jnp.take(pts["valid"].reshape(g, GRP3), pg, axis=0)

    inv_res = jnp.float32(1.0 / omap.resolution)
    ct = jnp.cos(pp[:, None, :, 2])
    st = jnp.sin(pp[:, None, :, 2])
    pxc = pp[:, None, :, 0] * inv_res + (0.5 - omap.min_cells[0])
    pyc = pp[:, None, :, 1] * inv_res + (0.5 - omap.min_cells[1])
    ci = jnp.floor(pxc + ag[:, :, None] * ct - bg[:, :, None] * st
                   ).astype(jnp.int32)
    cj = jnp.floor(pyc + bg[:, :, None] * ct + ag[:, :, None] * st
                   ).astype(jnp.int32)
    inmap = (ci >= 0) & (ci < nx) & (cj >= 0) & (cj < ny)
    tex = pre["tex_zyx"].reshape(-1)
    flat = (jnp.clip(sg[:, :, None], 0, nz - 1) * ny
            + jnp.clip(cj, 0, ny - 1)) * nx + jnp.clip(ci, 0, nx - 1)
    ratio = jnp.where(inmap, tex[flat].astype(jnp.float32), 255.0)
    z = ratio * jnp.float32(omap.max_distance_ratio)
    t = jnp.where(vg[:, :, None] & pvalid[:, None, None], term_fn(z), 0.0)
    partial = jnp.sum(t, axis=1)
    out = jnp.zeros((n_tiles, TILE_M), jnp.float32).at[pt].add(partial)
    return out.reshape(-1)


def pc_spread_term_sums(omap, poses, points_base, pre, term_fn,
                        interpret=False):
    """Per-particle sums of term_fn(distance meters) over ALL cloud points
    (every point counts, point_cloud_scanner.cpp:132-167), in SORTED order
    (m_pad,). Kernel tiers + gated escape + the analytic z-out-of-band
    constant."""
    nx, ny, nz = _nsize(omap)
    tex_zyx = jnp.transpose(omap.distances_u8, (2, 1, 0))
    pre = dict(pre, tex_zyx=tex_zyx)
    pts = pre["pts"]
    zt = _tiered_call3(
        (nx, ny), tex_zyx, pre["spose_s"],
        (pre["flags"], pre["org0"], pre["orgm"], pre["org1"], pre["org2"],
         pre["slab_tiles"], pts["A"], pts["B"]),
        jnp.float32(1.0 / omap.resolution),
        (omap.min_cells[0], omap.min_cells[1]),
        interpret=interpret,
    )  # (budget, m_pad) ratios
    n_tiles = pre["n_tiles"]
    cov_pairs = pre["flags"][:n_tiles] < ESCAPE  # (n_tiles, G)
    cov = jnp.repeat(
        jnp.repeat(jnp.transpose(cov_pairs), GRP3, axis=0),
        TILE_M, axis=1,
    )
    scale = jnp.float32(omap.max_distance_ratio)
    terms = jnp.where(
        cov & pts["valid"][:, None], term_fn(zt * scale), 0.0
    )
    sums = jnp.sum(terms, axis=0)
    n_esc = pre["n_escape"]
    esc = jax.lax.cond(
        n_esc > 0,
        lambda _: jax.lax.cond(
            n_esc <= CAP_PAIRS_SMALL,
            lambda __: _escape_term_sums3(
                omap, pre, term_fn, CAP_PAIRS_SMALL),
            lambda __: jax.lax.cond(
                n_esc <= CAP_PAIRS,
                lambda ___: _escape_term_sums3(omap, pre, term_fn, CAP_PAIRS),
                lambda ___: _escape_term_sums3(
                    omap, pre, term_fn, CAP_PAIRS_MAX),
                operand=None,
            ),
            operand=None,
        ),
        lambda _: jnp.zeros_like(sums),
        operand=None,
    )
    # z-out-of-band points: max-distance term for every particle
    maxd = jnp.float32(omap.max_distance_to_object)
    oob = pts["n_oob"].astype(jnp.float32) * term_fn(maxd)
    return sums + esc + oob


def unsort(values_sorted: jnp.ndarray, pre) -> jnp.ndarray:
    """(m_pad,) sorted-order values -> (M,) original particle order."""
    m = pre["perm"].shape[0]
    return jnp.zeros((m,), values_sorted.dtype).at[pre["perm"]].set(
        values_sorted[:m]
    )
