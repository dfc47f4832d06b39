"""Pallas TPU kernel: yaw-binned sorted-tile windowed gather for SPREAD
particle clouds.

Global localization is exactly when the cloud covers a wide area with wide
yaw, so neither the stencil-correlation lattice (needs shared windows) nor
the per-beam windowed kernel (needs a converged cloud) applies, and the XLA
fallback pays ~7.8 ns per random texture gather — ~280 ms at 50k x 720.

Structure exploited here (round 3): particles are SORTED by
(yaw bin, snake-ordered spatial block) — argsort is microseconds on TPU;
the expensive primitive is the gather, not the sort. A run of TILE_M
consecutive particles is then compact in (theta, x, y), so for a group of
GRP consecutive beams (adjacent angles in any real scan) the endpoints
  e = p + r_b * u(theta_p + a_b)
span only  tile_bbox + r * dtheta_tile + r * GRP*da  cells — a small arc
patch instead of the full radius-r annulus the round-2 spatial-only sort
produced. That shrinks the windows (the per-endpoint MXU cost is the window
AREA) and extends coverage to uncapped 8 m beams.

Per (tile, beam-group) the prepass computes the EXACT endpoint bbox and
assigns a tier:

- tier 0: a (ROWS0 x COLS0) = (96 x 128) window fits — the dense bulk of a
  localized spread cloud. ~7x fewer MACs per endpoint than round 2's arm.
- tier 1 (round 5): a (160 x 192) window fits — 81% of the pairs that
  miss tier 0 (median need: 84 rows x 132 cols) at 0.54x tier 2's MACs.
- tier 2: a (224 x 256) window fits — sparse/straggler tiles,
  range-discontinuity groups (doorways), low-density yaw bins.
- tier 3: a (384 x 384) GIANT window fits — sparse full-yaw tiles whose
  endpoints cover the whole radius-r annulus; the big matmul is still ~4x
  cheaper than per-element XLA gathers.
- tier ESCAPE (4): nothing fits. Those pairs are evaluated EXACTLY (same
  int8 quantization) by a capacity-bounded XLA gather (CAP_PAIRS pairs,
  gated behind a lax.cond so the zero-escape common case pays nothing) and
  merged additively into the per-particle beam-term sums. Only when the
  escape overflows does the WHOLE call fall back — the round-2 design fell
  back whenever jnp.all(fits) failed, which a handful of injected uniform
  stragglers triggered every time (measured 284 ms/step on evolved
  global-loc states vs ~10 ms here).

Both tiers run in ONE kernel (pl.when-gated per group), group_of(B) beams
per (ROWS x COLS) @ (COLS, GRP*TILE_M) int8 MXU contraction; the per-endpoint
cell extraction is the one-hot MXU trick: column one-hot int8 matmul ->
int32, then a row-mask reduce — the "gather" becomes dense int8 MXU work.

Exactness contract: distances are quantized to max_distance/127 (the 2D
twin of the 3D path's uint8 ratio contract, octomap.cpp:328-332) — ~16 mm
at the default 2 m cap, an order below sigma_hit; everything else is exact,
including the escape path. Off-map endpoints read max_distance
(occupancy_map.cpp:90-98 out-of-bounds convention). Output is in SORTED
particle order; beam reductions are order-invariant, so callers reduce
first and un-permute the final (M,) vector with `unsort`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128  # particles per sorted tile (lane blocks)
def group_of(b: int) -> int:
    """Beams per matmul group (static per scan size). Wide groups amortize
    window loads and loop overhead, but a group's endpoint bbox unions its
    beams' arcs — its ANGULAR span (GRP x the scan's angular resolution)
    must stay small, so short scans take narrower groups."""
    # (GRP 32 at 720 beams measured WORSE — 11.1 vs 10.77 ms real — the
    # doubled arc span demotes too many pairs to bigger windows; GRP 8
    # measured worse in round 4 via loop overhead. 16 is the sweet spot.)
    return 16 if b >= 256 else (8 if b >= 64 else 4)
# Window tiers (rows x cols): per-endpoint MXU cost scales with ROWS*COLS.
# int8 VMEM tiling is (32, 128): row origins align down to 32 (usable span
# ROWS-31). Column origins are FULLY dynamic: the kernel loads an aligned
# (rows, cols+128) slice and left-rotates it by the misalignment through an
# int32 bitcast view — pltpu.bitcast packs 4 int8 sublane rows per int32
# and PRESERVES columns (verified on v5e, interpret == hw), and
# DynamicRotateOp is 32-bit-only, so the int32 view is what makes a lane
# roll of an int8 texture legal. That removes the 127-column alignment
# waste, shrinking the matmul K-dim ~2x at equal coverage.
ROWS0 = 96
COLS0 = 128
LOAD_C0 = COLS0 + 128
# Middle tier (round 5): the tier-occupancy diagnosis showed the median
# tier-1 pair needs only (84 rows, 132 cols) — 81% of them fit (160, 192),
# at 0.54x tier-1's MACs (the tier-1 matmul alone was ~4.3 ms of pure int8
# MXU time at the bench shape).
ROWS_M = 160
COLS_M = 192
# the rolled int32 view's lane dim must be 128-aligned (Mosaic
# DynamicRotateOp rejects unaligned shapes), so the load rounds 192+128 up
# to 384; the matmul K-dim stays COLS_M
LOAD_CM = 384
ROWS1 = 224
COLS1 = 256
LOAD_C1 = COLS1 + 128
# Giant tier: absorbs sparse full-yaw tiles (whole-annulus bboxes, up to
# ~2*160-cell beams) on the MXU — ~147k MACs per endpoint is still ~4x
# cheaper than the 7.8 ns XLA per-element gather the escape arm pays.
ROWS2 = 384
COLS2 = 384
LOAD_C2 = COLS2 + 128
# Yaw-primary sort: 32 bins x snake-raster spatial blocks. More bins
# tighten r*dtheta on long beams but fragment the spatial compactness of
# each bin's tiles; 32 puts r*dtheta at ~31 cells for uncapped 8 m beams
# on a 5 cm map, comfortably inside the tier-0 window.
NYAW = 32
BLOCK_X = 64
BLOCK_Y = 40
QLEVELS = 127.0  # int8 quantization levels for the distance texture
MAX_TEX_CELLS = 4 * 1024 * 1024  # int8 texture VMEM budget (bytes == cells)
# Escape capacity: (tile, group) pairs the XLA arm absorbs before the call
# falls back entirely. Two lax.cond-gated capacity tiers so the common
# cases pay nothing: 0 pairs -> no gather at all; <= CAP_PAIRS (524k exact
# gathers, ~4 ms) for a sprinkling of straggler tiles; <= CAP_PAIRS_MAX
# (~16 ms) for evolved global-loc states where random-pose injection builds
# a whole sparse sub-population (node.cpp:847-868 recovery regime).
CAP_PAIRS_SMALL = 64
CAP_PAIRS = 256
CAP_PAIRS_MAX = 2048
# Tier ids: 0 = (96,128), 1 = (160,192), 2 = (224,256), 3 = giant,
# ESCAPE = exact XLA arm.
ESCAPE = 4
# Density classes (primary sort key): per (yaw bin, block) particle counts
# bucket particles into coarse density classes so sparse stragglers sort
# into their OWN tiles instead of interleaving into dense ones (a single
# far-flung particle would otherwise blow its host tile's endpoint bbox
# and send every one of the tile's groups to the escape arm).
CLASS_EDGES = (128, 32, 8)  # count >= edge -> class 0/1/2, below all -> 3
_TWO_PI = 6.283185307179586


def _cells(px, py, geom):
    """world -> map cells (occupancy_map.cpp:90-98) + in-map mask."""
    res, half_x, half_y, origin_x, origin_y, size_x, size_y, _ = geom
    ci = jnp.floor((px - origin_x) / res + 0.5).astype(jnp.int32) + half_x
    cj = jnp.floor((py - origin_y) / res + 0.5).astype(jnp.int32) + half_y
    valid = (ci >= 0) & (ci < size_x) & (cj >= 0) & (cj < size_y)
    return ci, cj, valid


def _geom(omap):
    return (
        float(omap.resolution), omap.size_x // 2, omap.size_y // 2,
        float(omap.origin_x), float(omap.origin_y), omap.size_x, omap.size_y,
        float(omap.max_distance_to_object),
    )


def tex_fits(omap) -> bool:
    """Static check: int8 texture within VMEM budget and window-sized."""
    return (
        omap.size_x * omap.size_y <= MAX_TEX_CELLS
        and omap.size_y >= ROWS1
        and omap.size_x >= LOAD_C1
    )


def quantized_tex(omap) -> jnp.ndarray:
    """The int8 ratio-quantized distance texture both arms read."""
    return jnp.round(
        omap.distances * (QLEVELS / omap.max_distance_to_object)
    ).astype(jnp.int8)


def _kernel(
    flags_ref,  # (8, G) int32 SMEM block — tier per (tile, group)
    org0_ref,  # (8, G) int32 SMEM packed (row0 << 16) | col0, tier 0
    orgm_ref,  # (8, G) int32 SMEM, middle tier
    org1_ref,  # (8, G) int32 SMEM, tier (224, 256)
    org2_ref,  # (8, G) int32 SMEM, giant tier
    tex_ref,  # (H, W) int8 full texture (VMEM)
    rca_ref,  # (G, 1, GRP*TILE_M) f32 — r*cos(a)/res, each repeated TILE_M
    rsa_ref,  # (G, 1, GRP*TILE_M) f32 — r*sin(a)/res likewise
    pxc_ref,  # (1, TILE_M) f32 sorted particle x in CELL coords (+0.5+half)
    pyc_ref,
    ct_ref,  # (1, TILE_M) f32 cos(theta_p)
    st_ref,  # (1, TILE_M) f32 sin(theta_p)
    out_ref,  # (B_pad, TILE_M) f32 quantized distance (meters)
    *,
    n_groups: int,
    geom: tuple,
    grp: int,
    tiers: tuple,  # statically enabled tier ids (window must fit the map)
):
    # NO transcendentals in-kernel: endpoint cells come from the angle-
    # addition identity on precomputed per-particle cos/sin and per-beam
    # r*cos(a)/res, r*sin(a)/res — 36M in-kernel cos+sin calls were the
    # single largest cost of the round-3 kernel (benchmarks isolation:
    # base-without-matmul 15.2 of 18.8 ms).
    max_dist = geom[-1]
    size_x, size_y = geom[5], geom[6]
    wide = grp * TILE_M
    scale = max_dist / QLEVELS
    tile8 = pl.program_id(0) % 8
    pxc8 = jnp.concatenate([pxc_ref[:]] * grp, axis=1)  # (1, wide)
    pyc8 = jnp.concatenate([pyc_ref[:]] * grp, axis=1)
    ct8 = jnp.concatenate([ct_ref[:]] * grp, axis=1)
    st8 = jnp.concatenate([st_ref[:]] * grp, axis=1)
    col_iota0 = jax.lax.broadcasted_iota(jnp.int32, (COLS0, wide), 0)
    row_iota0 = jax.lax.broadcasted_iota(jnp.int32, (ROWS0, wide), 0)
    col_iotam = jax.lax.broadcasted_iota(jnp.int32, (COLS_M, wide), 0)
    row_iotam = jax.lax.broadcasted_iota(jnp.int32, (ROWS_M, wide), 0)
    col_iota1 = jax.lax.broadcasted_iota(jnp.int32, (COLS1, wide), 0)
    row_iota1 = jax.lax.broadcasted_iota(jnp.int32, (ROWS1, wide), 0)
    col_iota2 = jax.lax.broadcasted_iota(jnp.int32, (COLS2, wide), 0)
    row_iota2 = jax.lax.broadcasted_iota(jnp.int32, (ROWS2, wide), 0)

    def body(g, _):
        rca = rca_ref[g]  # (1, wide)
        rsa = rsa_ref[g]
        ci = jnp.floor(pxc8 + rca * ct8 - rsa * st8).astype(jnp.int32)
        cj = jnp.floor(pyc8 + rsa * ct8 + rca * st8).astype(jnp.int32)
        inmap = (ci >= 0) & (ci < size_x) & (cj >= 0) & (cj < size_y)
        fl = flags_ref[tile8, g]

        def emit(z):
            z = jnp.where(inmap, z, max_dist)
            # one (grp, TILE_M) store: row-major (1, wide) relayouts to
            # (grp, 128) exactly (beam k's lane block becomes row k)
            out_ref[pl.ds(g * grp, grp), :] = z.reshape(grp, TILE_M)

        def pick(packed, rows, cols, load_c, col_iota, row_iota):
            r0 = jax.lax.shift_right_arithmetic(packed, 16)
            c0 = packed & 0xFFFF
            # aligned load + int32-bitcast lane roll = dynamic col origin.
            # The prepass clips c0 so dc <= 128 < load_c - cols + 128.
            size_x = geom[5]
            cb_cap = ((size_x - load_c) // 128) * 128
            c_base = jnp.minimum((c0 // 128) * 128, cb_cap)
            dc = c0 - c_base
            win = tex_ref[pl.ds(pl.multiple_of(r0, 32), rows),
                          pl.ds(pl.multiple_of(c_base, 128), load_c)]
            w32 = pltpu.bitcast(win, jnp.int32)  # (rows//4, load_c)
            # pltpu.roll needs a NON-NEGATIVE traced amount: left-roll by dc
            # is its right-roll complement (CLAUDE.md roll contract)
            w32 = pltpu.roll(w32, (load_c - dc) % load_c, axis=1)
            window = pltpu.bitcast(w32, jnp.int8)[:, :cols]
            lr = jnp.clip(cj - r0, 0, rows - 1)
            lc = jnp.clip(ci - c0, 0, cols - 1)
            colhot = (col_iota == lc).astype(jnp.int8)  # (cols, wide)
            picked = jax.lax.dot_general(
                window, colhot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (rows, wide)
            # NOTE (round 5): routing this reduce through the MXU (pack
            # picked to int8, mask, ones-contraction) measured SLOWER
            # (tier0-all 7.67 -> 10.02 ms): the i32 -> i8 conversions force
            # cross-sublane relayouts that cost more than the VPU select +
            # tree reduce they replace. Same lesson as the bf16 term-window
            # experiment (tier0-all 11.3 ms): mid-kernel dtype narrowing is
            # a relayout, not a discount.
            return jnp.sum(
                jnp.where(row_iota == lr, picked, 0), axis=0, keepdims=True
            ).astype(jnp.float32) * scale

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

        # fl == ESCAPE: out rows stay garbage; callers mask with the
        # `covered` flags and add the escape arm's exact sums instead.
        return 0

    jax.lax.fori_loop(0, n_groups, body, 0, unroll=False)


def spread_prepass(omap, spose, ranges, angles, valid):
    """Sort particles by (yaw bin, snake spatial block) and tier every
    (tile, beam-group) pair from a conservative interval-arithmetic
    endpoint bbox (see the inline block below); a too-big bbox can only
    demote a pair's tier, never misread a window."""
    m = spose.shape[0]
    m_pad = -(-m // TILE_M) * TILE_M
    n_tiles = m_pad // TILE_M
    b = ranges.shape[0]
    grp = group_of(b)
    b_pad = -(-b // grp) * grp
    g_groups = b_pad // grp

    # ---- yaw-primary snake sort ------------------------------------------
    ij = omap.world_to_map(spose[:, :2])
    ci = jnp.clip(ij[..., 0], 0, omap.size_x - 1)
    cj = jnp.clip(ij[..., 1], 0, omap.size_y - 1)
    nbx = -(-omap.size_x // BLOCK_X)
    nby = -(-omap.size_y // BLOCK_Y)
    bx = ci // BLOCK_X
    by = cj // BLOCK_Y
    # boustrophedon: consecutive blocks stay spatially adjacent at row wraps
    bx_snake = jnp.where(by % 2 == 0, bx, nbx - 1 - bx)
    # reference yaw is unnormalized (particle_filter.cpp never wraps it);
    # binning by mod 2*pi only affects the sort quality, never the values
    yb = jnp.floor(
        jnp.mod(spose[:, 2], _TWO_PI) * (NYAW / _TWO_PI)
    ).astype(jnp.int32)
    yb = jnp.clip(yb, 0, NYAW - 1)
    nb = nbx * nby
    bin_block = yb * nb + by * nbx + bx_snake
    # per-(bin, block) particle counts WITHOUT an M-sized scatter/gather
    # round-trip (each ~0.5-2 ms at 50k): sort by bin_block, get each
    # position's segment extent from a prefix-max of segment-start
    # positions and a suffix-min of segment-end positions, then a second
    # stable sort by density class alone — stability preserves the
    # bin_block order within each class, so the net order is
    # (class, bin_block, draw index) exactly.
    idx = jnp.arange(m, dtype=jnp.int32)
    kb_s, idx_s = jax.lax.sort((bin_block, idx), num_keys=1, is_stable=True)
    segstart = jnp.concatenate(
        [jnp.ones((1,), bool), kb_s[1:] != kb_s[:-1]]
    )
    segend = jnp.concatenate([kb_s[1:] != kb_s[:-1], jnp.ones((1,), bool)])
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(segstart, idx, -1)
    )
    last = jax.lax.associative_scan(
        jnp.minimum, jnp.where(segend, idx, m), reverse=True
    )
    cnt = last - first + 1  # (m,) in bin-sorted order
    klass = jnp.full((m,), len(CLASS_EDGES), jnp.int32)
    for c, edge in enumerate(CLASS_EDGES):
        klass = jnp.where(cnt >= edge, jnp.minimum(klass, c), klass)
    _, perm = jax.lax.sort((klass, idx_s), num_keys=1, is_stable=True)

    spose_s = jnp.take(spose, perm, axis=0)
    if m_pad != m:
        # pad with the last sorted pose so tile bboxes stay honest
        spose_s = jnp.concatenate(
            [spose_s, jnp.tile(spose_s[-1:], (m_pad - m, 1))], axis=0
        )

    # ---- per-(group, tile) endpoint bboxes by INTERVAL ARITHMETIC --------
    # The kernel computes endpoint cells as floor(pxc + rca*ct - rsa*st)
    # (cell space, angle-addition identity). Bounding that bilinear form by
    # per-tile intervals on (pxc, pyc, ct, st) x per-group intervals on
    # (rca, rsa) costs O(n_tiles x G) instead of materializing the
    # (B, Mp) endpoint arrays (which measured 7.9 ms of prepass at
    # 50k x 720 — 8 x 144 MB of HBM traffic). Interval products are
    # conservative (the ct/st box around a yaw arc ignores their coupling),
    # which is SAFE: a too-big bbox only demotes the pair a tier or sends
    # it to the exact escape arm, never misreads a window. Off-map clamping
    # is safe too: the kernel masks off-map endpoints to max_dist whatever
    # the clipped window read produced.
    geom = _geom(omap)
    res, half_x, half_y, ox, oy = geom[0], geom[1], geom[2], geom[3], geom[4]
    pxc = (spose_s[:, 0] - ox) / res + (0.5 + half_x)  # (Mp,) cell coords
    pyc = (spose_s[:, 1] - oy) / res + (0.5 + half_y)
    ct, st = jnp.cos(spose_s[:, 2]), jnp.sin(spose_s[:, 2])

    def tile_iv(v):  # (Mp,) -> ((n_tiles,), (n_tiles,)) min/max per tile
        v2 = v.reshape(n_tiles, TILE_M)
        return jnp.min(v2, axis=1), jnp.max(v2, axis=1)

    pxc_lo, pxc_hi = tile_iv(pxc)
    pyc_lo, pyc_hi = tile_iv(pyc)
    ct_lo, ct_hi = tile_iv(ct)
    st_lo, st_hi = tile_iv(st)

    inv_res = jnp.float32(1.0 / res)
    rpad = jnp.pad(ranges.astype(jnp.float32), (0, b_pad - b))
    apad = jnp.pad(angles.astype(jnp.float32), (0, b_pad - b))
    vpad = jnp.pad(valid, (0, b_pad - b))
    rca_b = rpad * jnp.cos(apad) * inv_res  # (b_pad,) per-beam scalars
    rsa_b = rpad * jnp.sin(apad) * inv_res
    vg2 = vpad.reshape(g_groups, grp)
    fbig = jnp.float32(1e9)
    empty = ~jnp.any(vg2, axis=1)[:, None] & jnp.ones(
        (1, n_tiles), bool)  # (G, n_tiles)

    # Per-BEAM x per-tile interval products, then a min/max reduce over each
    # group's beams. (rca_b, rsa_b) are scalars per beam, so the only slop
    # left is the (ct, st) box around the tile's yaw arc (~r*w^2/8, a few
    # cells). The earlier per-GROUP formulation bounded (rca, rsa) by the
    # group's r-range rectangle first — when ranges vary widely inside one
    # group (wall-adjacent scans: 2 m hits next to 8 m misses), its phantom
    # corners (r_hi*cos paired with r_hi*sin) dilated bboxes up to ~sqrt(2)*r
    # past even the giant tier and sent most pairs to the escape arm
    # (measured: 10990 escapes -> full fallback on the wall-adjacent parity
    # cloud). Cost stays O(B x n_tiles), 128x below a per-particle pass.
    def bprod(s_b, lo_t, hi_t):  # (B,) scalar x (T,) interval -> (B, T)
        p1 = s_b[:, None] * lo_t[None, :]
        p2 = s_b[:, None] * hi_t[None, :]
        return jnp.minimum(p1, p2), jnp.maximum(p1, p2)

    cc_lo, cc_hi = bprod(rca_b, ct_lo, ct_hi)  # rca * ct
    ss_lo, ss_hi = bprod(rsa_b, st_lo, st_hi)  # rsa * st
    sc_lo, sc_hi = bprod(rsa_b, ct_lo, ct_hi)  # rsa * ct
    cs_lo, cs_hi = bprod(rca_b, st_lo, st_hi)  # rca * st

    def group_reduce(v, sentinel, op):  # (B, T) -> (G, T) over valid beams
        v = jnp.where(vpad[:, None], v, sentinel)
        return op(v.reshape(g_groups, grp, n_tiles), axis=1)

    ex_lo = group_reduce(cc_lo - ss_hi, fbig, jnp.min)
    ex_hi = group_reduce(cc_hi - ss_lo, -fbig, jnp.max)
    ey_lo = group_reduce(sc_lo + cs_lo, fbig, jnp.min)
    ey_hi = group_reduce(sc_hi + cs_hi, -fbig, jnp.max)
    fx_lo = pxc_lo[None, :] + ex_lo
    fx_hi = pxc_hi[None, :] + ex_hi
    fy_lo = pyc_lo[None, :] + ey_lo
    fy_hi = pyc_hi[None, :] + ey_hi
    big = jnp.int32(1 << 30)
    # floor, dilate by the 1-cell fp margin, THEN clamp to the map (off-map
    # endpoints are masked to max_dist in-kernel, so the window only needs
    # the on-map part of the bbox). Dilating after the clamp pushed edge-
    # touching mins to -1, which no clipped window origin (>= 0) can
    # satisfy — every bbox touching the left/top map edge escaped (measured:
    # 10990 escapes -> full fallback on a wall-adjacent global-loc cloud
    # whose beams half-exit the map).
    fx_lo_c = jnp.clip(jnp.floor(fx_lo) - 1, -fbig, fbig).astype(jnp.int32)
    fx_hi_c = jnp.clip(jnp.floor(fx_hi) + 1, -fbig, fbig).astype(jnp.int32)
    fy_lo_c = jnp.clip(jnp.floor(fy_lo) - 1, -fbig, fbig).astype(jnp.int32)
    fy_hi_c = jnp.clip(jnp.floor(fy_hi) + 1, -fbig, fbig).astype(jnp.int32)
    ci_min = jnp.clip(fx_lo_c, 0, omap.size_x - 1)
    ci_max = jnp.clip(fx_hi_c, 0, omap.size_x - 1)
    cj_min = jnp.clip(fy_lo_c, 0, omap.size_y - 1)
    cj_max = jnp.clip(fy_hi_c, 0, omap.size_y - 1)

    def tier_fit(rows, cols, load_c):
        """Packed (clipped + aligned) origins, then the fit predicates
        evaluated against those SAME origins (the window the kernel actually
        loads): near the bottom/right map edge the clip moves the origin
        up/left, so testing the raw mins would pass endpoints that fall past
        the real window's end. Rows align down to 32 (int8 tiling); columns
        are fully dynamic via the kernel's bitcast lane roll, clipped only
        so the roll distance stays <= 128 (c_hi below mirrors the kernel's
        c_base cap)."""
        c_hi = ((omap.size_x - load_c) // 128) * 128 + (load_c - cols)
        row0 = jnp.clip(jnp.where(empty, 0, cj_min), 0, omap.size_y - rows) & ~31
        col0 = jnp.clip(jnp.where(empty, 0, ci_min), 0, c_hi)
        fit = empty | (
            (cj_min >= row0) & ((cj_max - row0) < rows)
            & (ci_min >= col0) & ((ci_max - col0) < cols)
        )
        return fit, (jnp.left_shift(row0, 16) | col0).astype(jnp.int32)

    fit0, org0 = tier_fit(ROWS0, COLS0, LOAD_C0)
    if not (omap.size_y >= ROWS0 and omap.size_x >= LOAD_C0):
        fit0 = jnp.zeros_like(fit0)
    fitm, orgm = tier_fit(ROWS_M, COLS_M, LOAD_CM)
    if not (omap.size_y >= ROWS_M and omap.size_x >= LOAD_CM):
        fitm = jnp.zeros_like(fitm)
    fit1, org1 = tier_fit(ROWS1, COLS1, LOAD_C1)
    if not (omap.size_y >= ROWS1 and omap.size_x >= LOAD_C1):
        fit1 = jnp.zeros_like(fit1)
    fit2, org2 = tier_fit(ROWS2, COLS2, LOAD_C2)
    if not (omap.size_y >= ROWS2 and omap.size_x >= LOAD_C2):
        fit2 = jnp.zeros_like(fit2)
    flags = jnp.where(
        fit0, 0,
        jnp.where(fitm, 1, jnp.where(fit1, 2, jnp.where(fit2, 3, ESCAPE))),
    ).astype(jnp.int32)
    n_escape = jnp.sum(flags == ESCAPE).astype(jnp.int32)

    # kernel SMEM blocks are (8, G) per 8-tile slab: transpose to (tiles, G)
    pad8 = (-n_tiles) % 8
    def to_tiles(a):
        a = jnp.transpose(a)  # (n_tiles, G)
        return jnp.pad(a, ((0, pad8), (0, 0))) if pad8 else a

    return {
        "perm": perm,
        "spose_s": spose_s,
        "flags": to_tiles(flags),  # (n_tiles_pad8, G) int32 tier
        "org0": to_tiles(org0),
        "orgm": to_tiles(orgm),
        "org1": to_tiles(org1),
        "org2": to_tiles(org2),
        "n_escape": n_escape,
        "fits": n_escape <= CAP_PAIRS_MAX,
        "n_tiles": n_tiles,
        "m_pad": m_pad,
        "g_groups": g_groups,
    }


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _tiered_call(geom, tex8, spose_s, ranges, angles, flags, org0, orgm,
                 org1, org2, interpret=False):
    m_pad = spose_s.shape[0]
    b = ranges.shape[0]
    grp = group_of(b)
    b_pad = -(-b // grp) * grp
    n_groups = b_pad // grp
    n_tiles = m_pad // TILE_M
    res, half_x, half_y, ox, oy = geom[0], geom[1], geom[2], geom[3], geom[4]
    pxc = ((spose_s[:, 0] - ox) / res + (0.5 + half_x)).reshape(1, m_pad)
    pyc = ((spose_s[:, 1] - oy) / res + (0.5 + half_y)).reshape(1, m_pad)
    ct = jnp.cos(spose_s[:, 2]).reshape(1, m_pad)
    st = jnp.sin(spose_s[:, 2]).reshape(1, m_pad)
    rpad = jnp.pad(ranges.astype(jnp.float32), (0, b_pad - b))
    apad = jnp.pad(angles.astype(jnp.float32), (0, b_pad - b))
    inv_res = jnp.float32(1.0 / res)
    rca = jnp.repeat(rpad * jnp.cos(apad) * inv_res, TILE_M).reshape(
        n_groups, 1, grp * TILE_M)
    rsa = jnp.repeat(rpad * jnp.sin(apad) * inv_res, TILE_M).reshape(
        n_groups, 1, grp * TILE_M)
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
            pl.BlockSpec(tex8.shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rca.shape, lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rsa.shape, lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, TILE_M), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
    )
    size_x, size_y = geom[5], geom[6]
    tiers = tuple(
        t for t, (rr, lc) in enumerate(
            ((ROWS0, LOAD_C0), (ROWS_M, LOAD_CM), (ROWS1, LOAD_C1),
             (ROWS2, LOAD_C2)))
        if size_y >= rr and size_x >= lc
    )
    kern = functools.partial(
        _kernel, n_groups=n_groups, geom=geom, grp=grp, tiers=tiers)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(flags, org0, orgm, org1, org2, tex8, rca, rsa, pxc, pyc, ct, st)
    return out[:b]


def spread_distances_sorted(omap, spose, ranges, angles, valid, pre,
                            interpret=False):
    """Kernel-covered (B, m_pad) distances in SORTED particle order, plus a
    (B, m_pad) `covered` mask (False on escape pairs — those columns hold
    garbage and must be taken from the escape arm; see spread_term_sums).

    Callers reduce over beams first (order-invariant) and un-permute the
    final per-particle vector with `unsort(values_sorted, pre)`."""
    geom = _geom(omap)
    tex8 = quantized_tex(omap)
    zt = _tiered_call(
        geom, tex8, pre["spose_s"], ranges, angles,
        pre["flags"], pre["org0"], pre["orgm"], pre["org1"], pre["org2"],
        interpret=interpret,
    )
    n_tiles = pre["n_tiles"]
    b = ranges.shape[0]
    # (B, m_pad) coverage: tier < 2, expanded groups -> beams, tiles -> lanes
    cov_pairs = pre["flags"][:n_tiles] < ESCAPE  # (n_tiles, G)
    cov = jnp.repeat(
        jnp.repeat(jnp.transpose(cov_pairs), group_of(b), axis=0)[:b],
        TILE_M, axis=1,
    )
    return zt, cov


def _escape_term_sums(omap, pre, ranges, angles, valid, term_fn, cap):
    """Exact (same int8 quantization) beam-term sums for up to `cap`
    escaped (tile, group) pairs, returned as a (m_pad,) sorted-order vector.

    Compaction is the sort trick (pair ids of escaped pairs to the front);
    the per-pair particle rows and beam slices come from ROW gathers (cost
    is per index — the 128 lanes are free, PERF.md microbenchmarks), and
    the final merge is a tiny row scatter-add."""
    n_tiles = pre["n_tiles"]
    g = pre["g_groups"]
    flags = pre["flags"][:n_tiles]  # (n_tiles, G)
    b = ranges.shape[0]
    grp = group_of(b)
    b_pad = g * grp
    big = jnp.int32(1 << 30)

    pid = jnp.arange(n_tiles * g, dtype=jnp.int32)
    esc_sorted = jax.lax.sort(
        jnp.where(flags.reshape(-1) == ESCAPE, pid, big), is_stable=False
    )
    ids = esc_sorted[:cap]
    pvalid = ids < n_tiles * g
    ids = jnp.clip(ids, 0, n_tiles * g - 1)
    pt = ids // g  # (CAP,) tile index
    pg = ids % g  # (CAP,) group index

    poses3 = pre["spose_s"].reshape(n_tiles, TILE_M, 3)
    pp = jnp.take(poses3, pt, axis=0)  # (CAP, TILE_M, 3) row gathers
    rpad = jnp.pad(ranges.astype(jnp.float32), (0, b_pad - b))
    apad = jnp.pad(angles.astype(jnp.float32), (0, b_pad - b))
    vpad = jnp.pad(valid, (0, b_pad - b))
    rg = jnp.take(rpad.reshape(g, grp), pg, axis=0)  # (CAP, grp)
    ag = jnp.take(apad.reshape(g, grp), pg, axis=0)
    vg = jnp.take(vpad.reshape(g, grp), pg, axis=0)

    th = pp[:, None, :, 2] + ag[:, :, None]  # (CAP, grp, TILE_M)
    hx = pp[:, None, :, 0] + rg[:, :, None] * jnp.cos(th)
    hy = pp[:, None, :, 1] + rg[:, :, None] * jnp.sin(th)
    geom = _geom(omap)
    eci, ecj, inmap = _cells(hx, hy, geom)
    tex8 = quantized_tex(omap).reshape(-1)
    flat = jnp.clip(ecj, 0, omap.size_y - 1) * omap.size_x \
        + jnp.clip(eci, 0, omap.size_x - 1)
    maxd = jnp.float32(omap.max_distance_to_object)
    z = jnp.where(inmap, tex8[flat].astype(jnp.float32) * (maxd / QLEVELS),
                  maxd)
    t = jnp.where(vg[:, :, None] & pvalid[:, None, None], term_fn(z), 0.0)
    partial = jnp.sum(t, axis=1)  # (CAP, TILE_M)
    out = jnp.zeros((n_tiles, TILE_M), jnp.float32).at[pt].add(partial)
    return out.reshape(-1)


def spread_term_sums(omap, spose, ranges, angles, valid, pre, term_fn,
                     interpret=False):
    """Per-particle sums of term_fn(distance) over valid beams, in SORTED
    order (m_pad,): kernel tiers for covered pairs + the gated escape arm.
    term_fn must be elementwise (every LF-family beam term is)."""
    zt, cov = spread_distances_sorted(
        omap, spose, ranges, angles, valid, pre, interpret=interpret
    )
    terms = jnp.where(cov & valid[:, None], term_fn(zt), 0.0)
    sums = jnp.sum(terms, axis=0)  # (m_pad,)
    n_esc = pre["n_escape"]
    # three cond-gated capacity tiers: the escape gather's cost is its
    # STATIC cap (per-index scalar loops), so a typical global-loc cloud's
    # ~50 straggler pairs must not pay the 256-pair arm's ~4 ms
    esc = jax.lax.cond(
        n_esc > 0,
        lambda _: jax.lax.cond(
            n_esc <= CAP_PAIRS_SMALL,
            lambda __: _escape_term_sums(
                omap, pre, ranges, angles, valid, term_fn, CAP_PAIRS_SMALL),
            lambda __: jax.lax.cond(
                n_esc <= CAP_PAIRS,
                lambda ___: _escape_term_sums(
                    omap, pre, ranges, angles, valid, term_fn, CAP_PAIRS),
                lambda ___: _escape_term_sums(
                    omap, pre, ranges, angles, valid, term_fn, CAP_PAIRS_MAX),
                operand=None,
            ),
            operand=None,
        ),
        lambda _: jnp.zeros_like(sums),
        operand=None,
    )
    return sums + esc


def unsort(values_sorted: jnp.ndarray, pre) -> jnp.ndarray:
    """(m_pad,) sorted-order values -> (M,) original particle order."""
    m = pre["perm"].shape[0]
    return jnp.zeros((m,), values_sorted.dtype).at[pre["perm"]].set(
        values_sorted[:m]
    )
