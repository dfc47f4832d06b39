"""Pallas TPU kernel: sorted-tile windowed gather for SPREAD particle clouds.

Global localization is exactly when the cloud covers the whole map, so
neither the stencil-correlation lattice (needs shared windows) nor the
per-beam windowed kernel (needs a converged cloud) applies, and the XLA
fallback pays ~7.8 ns per random texture gather — 280 ms at 50k x 720.

Structure exploited here: particles can be SORTED spatially (argsort is
microseconds on TPU — the expensive primitive is the gather, not the sort).
After sorting by a snake-ordered block raster (BLOCK_Y x BLOCK_X cells),
every run of TILE_M consecutive particles is spatially compact, and all of
beam b's endpoints for a tile lie inside the tile's particle bbox dilated
by r_b (yaw is unconstrained in a spread cloud, so the reachable set is the
full disc — the bound is analytic, no per-endpoint prepass is needed).

Two kernels cover the density spectrum, chosen PER TILE by a flag pass:

- narrow/batched (dense tiles — most of a fresh global-localization burst):
  one (ROWS_N x COLS_N) window covers every beam of the tile; beams are
  processed 8 per step against the resident window with a single
  (ROWS_N, COLS_N) @ (COLS_N, 8*TILE_M) int8 MXU contraction, amortizing
  loop and pipeline overhead 8x.
- standard (sparse tail tiles): per-(tile, beam) windows (ROWS x COLS),
  one matmul per beam.

Both passes share the grid and skip each other's tiles (pl.when); their
outputs merge by the flag. The per-endpoint cell extraction is the one-hot
MXU trick: column one-hot int8 matmul -> int32, then a row-mask reduce —
the "gather" becomes dense int8 MXU work.

Exactness contract: distances are quantized to max_distance/127 (the 2D
twin of the 3D path's uint8 ratio contract, octomap.cpp:328-332) — ~16 mm
at the default 2 m cap, an order below sigma_hit; everything else is exact.
Output is returned in SORTED particle order (B, M); reductions over beams
are order-invariant, so callers reduce first and un-permute the final (M,)
vector.

Envelope (checked exactly in the prepass, conservative disc bounds): every
tile must satisfy tile_span + 2*r <= usable window span for one of the two
shapes. At the flagship density (50k particles on a 1024^2-cell map) that
admits beams up to ~56 cells (2.8 m at 5 cm); thinner clouds, longer beams,
or maps over the VMEM budget fall back to the XLA gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128  # particles per sorted tile (lane blocks)
GRP = 8  # beams per matmul in the batched kernel
# Window shapes (rows x cols): per-endpoint cost scales with ROWS*COLS on
# the MXU and ROWS+COLS on the VPU.
ROWS = 224  # int8 VMEM tiling is (32, 128) -> row origins align to 32
COLS = 384  # col origins align down to 128 -> usable span COLS-127
ROWS_N = 160
COLS_N = 256
# Sort blocks (snake raster): flat blocks balance the straddle constraints —
# a tile spanning 2 in-row blocks needs 2*BLOCK_X + 2r to fit a window's
# usable cols, and a tile wrapping to the next (vertically adjacent, thanks
# to the boustrophedon order) block row needs 2*BLOCK_Y + 2r usable rows.
BLOCK_X = 64
BLOCK_Y = 40
QLEVELS = 127.0  # int8 quantization levels for the distance texture
MAX_TEX_CELLS = 4 * 1024 * 1024  # int8 texture VMEM budget (bytes == cells)


def _cells(px, py, geom):
    """world -> map cells (occupancy_map.cpp:90-98) + in-map mask."""
    res, half_x, half_y, origin_x, origin_y, size_x, size_y, _ = geom
    ci = jnp.floor((px - origin_x) / res + 0.5).astype(jnp.int32) + half_x
    cj = jnp.floor((py - origin_y) / res + 0.5).astype(jnp.int32) + half_y
    valid = (ci >= 0) & (ci < size_x) & (cj >= 0) & (cj < size_y)
    return ci, cj, valid


def _kernel_std(
    ranges_ref,  # (B,) f32  (scalar prefetch, SMEM)
    angles_ref,  # (B,) f32
    flags_ref,  # (n_tiles,) int32 — 1 where the tile runs the batched pass
    org_ref,  # (8, B) int32 packed (row0 << 16) | col0, 8-tile SMEM block
    tex_ref,  # (H, W) int8 full texture (VMEM)
    px_ref,  # (1, TILE_M) f32 sorted particle x
    py_ref,
    pth_ref,
    out_ref,  # (B, TILE_M) f32 quantized distance (meters)
    *,
    n_beams: int,
    geom: tuple,
):
    max_dist = geom[-1]
    px = px_ref[:]
    py = py_ref[:]
    pth = pth_ref[:]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (COLS, TILE_M), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, TILE_M), 0)
    scale = max_dist / QLEVELS
    tid = pl.program_id(0)
    tile8 = tid % 8

    def body(b, _):
        packed = org_ref[tile8, b]
        r0 = jax.lax.shift_right_arithmetic(packed, 16)
        c0 = packed & 0xFFFF
        th = pth + angles_ref[b]
        r = ranges_ref[b]
        ci, cj, valid = _cells(px + r * jnp.cos(th), py + r * jnp.sin(th), geom)
        lr = jnp.clip(cj - r0, 0, ROWS - 1)
        lc = jnp.clip(ci - c0, 0, COLS - 1)
        window = tex_ref[pl.ds(pl.multiple_of(r0, 32), ROWS),
                         pl.ds(pl.multiple_of(c0, 128), COLS)]
        colhot = (col_iota == lc).astype(jnp.int8)
        picked = jax.lax.dot_general(
            window, colhot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        z = jnp.sum(
            jnp.where(row_iota == lr, picked, 0), axis=0, keepdims=True
        ).astype(jnp.float32) * scale
        out_ref[pl.ds(b, 1), :] = jnp.where(valid, z, max_dist)
        return 0

    @pl.when(flags_ref[tid] == 0)
    def _():
        jax.lax.fori_loop(0, n_beams, body, 0, unroll=False)


def _kernel_batched(
    flags_ref,  # (n_tiles,) int32  (scalar prefetch)
    org_ref,  # (8, 1) int32 packed per-TILE origin
    tex_ref,  # (H, W) int8
    rrep_ref,  # (n_groups, 1, GRP*TILE_M) f32 — ranges, each repeated TILE_M
    arep_ref,  # (n_groups, 1, GRP*TILE_M) f32 — angles likewise
    px_ref,  # (1, TILE_M)
    py_ref,
    pth_ref,
    out_ref,  # (B_pad, TILE_M)
    *,
    n_groups: int,
    geom: tuple,
):
    max_dist = geom[-1]
    wide = GRP * TILE_M
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (COLS_N, wide), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS_N, wide), 0)
    scale = max_dist / QLEVELS
    tid = pl.program_id(0)
    tile8 = tid % 8

    @pl.when(flags_ref[tid] == 1)
    def _():
        packed = org_ref[tile8, 0]
        r0 = jax.lax.shift_right_arithmetic(packed, 16)
        c0 = packed & 0xFFFF
        window = tex_ref[pl.ds(pl.multiple_of(r0, 32), ROWS_N),
                         pl.ds(pl.multiple_of(c0, 128), COLS_N)]
        px8 = jnp.concatenate([px_ref[:]] * GRP, axis=1)  # (1, wide)
        py8 = jnp.concatenate([py_ref[:]] * GRP, axis=1)
        pth8 = jnp.concatenate([pth_ref[:]] * GRP, axis=1)

        def body(g, _):
            r = rrep_ref[g]  # (1, wide)
            a = arep_ref[g]
            th = pth8 + a
            ci, cj, valid = _cells(
                px8 + r * jnp.cos(th), py8 + r * jnp.sin(th), geom
            )
            lr = jnp.clip(cj - r0, 0, ROWS_N - 1)
            lc = jnp.clip(ci - c0, 0, COLS_N - 1)
            colhot = (col_iota == lc).astype(jnp.int8)  # (COLS_N, wide)
            picked = jax.lax.dot_general(
                window, colhot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (ROWS_N, wide)
            z = jnp.sum(
                jnp.where(row_iota == lr, picked, 0), axis=0, keepdims=True
            ).astype(jnp.float32) * scale
            z = jnp.where(valid, z, max_dist)
            for k in range(GRP):
                out_ref[pl.ds(g * GRP + k, 1), :] = (
                    z[:, k * TILE_M:(k + 1) * TILE_M]
                )
            return 0

        jax.lax.fori_loop(0, n_groups, body, 0, unroll=False)


def tex_fits(omap) -> bool:
    """Static check: int8 texture within VMEM budget and window-sized."""
    return (
        omap.size_x * omap.size_y <= MAX_TEX_CELLS
        and omap.size_y >= ROWS
        and omap.size_x >= COLS
    )


def spread_prepass(omap, spose, ranges, angles, valid):
    """Sort particles into snake-raster blocks and bound every tile's
    endpoint windows EXACTLY from the per-(tile, beam) endpoint bboxes.
    The (B, M) pass carries no transcendentals: endpoint = pose + r*(cos a'
    cos t - sin a' sin t, ...) uses the angle-addition identity on
    per-particle cos/sin and per-beam cos/sin — outer-product mults only."""
    m = spose.shape[0]
    m_pad = -(-m // TILE_M) * TILE_M
    n_tiles = m_pad // TILE_M

    ij = omap.world_to_map(spose[:, :2])
    ci = jnp.clip(ij[..., 0], 0, omap.size_x - 1)
    cj = jnp.clip(ij[..., 1], 0, omap.size_y - 1)
    nbx = -(-omap.size_x // BLOCK_X)
    bx = ci // BLOCK_X
    by = cj // BLOCK_Y
    # boustrophedon: consecutive blocks stay spatially adjacent at row wraps
    bx_snake = jnp.where(by % 2 == 0, bx, nbx - 1 - bx)
    key = by * nbx + bx_snake
    perm = jnp.argsort(key).astype(jnp.int32)

    spose_s = jnp.take(spose, perm, axis=0)
    if m_pad != m:
        # pad with the last sorted pose so tile bboxes stay honest
        spose_s = jnp.concatenate(
            [spose_s, jnp.tile(spose_s[-1:], (m_pad - m, 1))], axis=0
        )

    # exact (B, Mp) endpoint cells via the angle-addition identity
    ct, st = jnp.cos(spose_s[:, 2]), jnp.sin(spose_s[:, 2])  # (Mp,)
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # (B,)
    r = ranges.astype(jnp.float32)
    hx = spose_s[None, :, 0] + (r * ca)[:, None] * ct[None, :] \
        - (r * sa)[:, None] * st[None, :]
    hy = spose_s[None, :, 1] + (r * sa)[:, None] * ct[None, :] \
        + (r * ca)[:, None] * st[None, :]
    geom = _geom(omap)
    eci, ecj, inmap = _cells(hx, hy, geom)
    big = jnp.int32(1 << 30)
    shape3 = (-1, n_tiles, TILE_M)
    ci_min = jnp.min(jnp.where(inmap, eci, big).reshape(shape3), axis=2)
    cj_min = jnp.min(jnp.where(inmap, ecj, big).reshape(shape3), axis=2)
    ci_max = jnp.max(jnp.where(inmap, eci, -big).reshape(shape3), axis=2)
    cj_max = jnp.max(jnp.where(inmap, ecj, -big).reshape(shape3), axis=2)
    skip = (ci_min == big) | ~valid[:, None]  # (B, n_tiles)
    pad8 = (-n_tiles) % 8

    def packed_origins(row0, col0, rows, cols):
        """Clipped + aligned window origins — the ones the kernel actually
        loads from. Fit checks MUST test against these, not the raw mins:
        near the bottom/right edge the clip moves the origin up/left, so an
        endpoint that fit the unclipped origin can fall past the real
        window's end (the in-kernel clip would then silently read a wrong
        cell up to 31/127 away)."""
        row0 = jnp.clip(row0, 0, omap.size_y - rows) & ~31
        col0 = jnp.clip(col0, 0, omap.size_x - cols) & ~127
        return row0, col0

    # standard pass: per-(tile, beam) windows
    row0_s, col0_s = packed_origins(
        jnp.where(skip, 0, cj_min), jnp.where(skip, 0, ci_min), ROWS, COLS
    )
    fit_s = skip | (
        (cj_min >= row0_s) & ((cj_max - row0_s) < ROWS)
        & (ci_min >= col0_s) & ((ci_max - col0_s) < COLS)
    )
    tile_std = jnp.all(fit_s, axis=0)  # (n_tiles,)
    org_std = jnp.transpose(
        jnp.left_shift(row0_s, 16) | col0_s
    ).astype(jnp.int32)
    if pad8:
        org_std = jnp.pad(org_std, ((0, pad8), (0, 0)))

    # batched pass: ONE window per tile covering every beam
    tci_min = jnp.min(jnp.where(skip, big, ci_min), axis=0)  # (n_tiles,)
    tcj_min = jnp.min(jnp.where(skip, big, cj_min), axis=0)
    tci_max = jnp.max(jnp.where(skip, -big, ci_max), axis=0)
    tcj_max = jnp.max(jnp.where(skip, -big, cj_max), axis=0)
    tile_empty = tci_min == big
    row0_n, col0_n = packed_origins(
        jnp.where(tile_empty, 0, tcj_min), jnp.where(tile_empty, 0, tci_min),
        ROWS_N, COLS_N,
    )
    tile_nrw = tile_empty | (
        (tcj_min >= row0_n) & ((tcj_max - row0_n) < ROWS_N)
        & (tci_min >= col0_n) & ((tci_max - col0_n) < COLS_N)
    )
    if not (omap.size_y >= ROWS_N and omap.size_x >= COLS_N):
        tile_nrw = jnp.zeros_like(tile_nrw)
    org_nrw = (jnp.left_shift(row0_n, 16) | col0_n).astype(jnp.int32)[:, None]
    if pad8:
        org_nrw = jnp.pad(org_nrw, ((0, pad8), (0, 0)))

    flags = tile_nrw.astype(jnp.int32)
    return {
        "perm": perm,
        "spose_s": spose_s,
        "origins": org_std,
        "origins_narrow": org_nrw,
        "flags": flags,
        "fits": jnp.all(tile_nrw | tile_std),
        "n_tiles": n_tiles,
        "m_pad": m_pad,
    }


def _geom(omap):
    return (
        float(omap.resolution), omap.size_x // 2, omap.size_y // 2,
        float(omap.origin_x), float(omap.origin_y), omap.size_x, omap.size_y,
        float(omap.max_distance_to_object),
    )


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _std_call(geom, tex8, spose_s, ranges, angles, flags, origins,
              interpret=False):
    m_pad = spose_s.shape[0]
    b = ranges.shape[0]
    n_tiles = m_pad // TILE_M
    px = spose_s[:, 0].reshape(1, m_pad)
    py = spose_s[:, 1].reshape(1, m_pad)
    pth = spose_s[:, 2].reshape(1, m_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, b), lambda t, *_: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tex8.shape, lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, TILE_M), lambda t, *_: (0, t),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_kernel_std, n_beams=b, geom=geom)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m_pad), jnp.float32),
        interpret=interpret,
    )(ranges.astype(jnp.float32), angles.astype(jnp.float32),
      flags.astype(jnp.int32), origins, tex8, px, py, pth)


@functools.partial(jax.jit, static_argnames=("geom", "interpret"))
def _batched_call(geom, tex8, spose_s, ranges, angles, flags, origins,
                  interpret=False):
    m_pad = spose_s.shape[0]
    b = ranges.shape[0]
    b_pad = -(-b // GRP) * GRP
    n_groups = b_pad // GRP
    n_tiles = m_pad // TILE_M
    px = spose_s[:, 0].reshape(1, m_pad)
    py = spose_s[:, 1].reshape(1, m_pad)
    pth = spose_s[:, 2].reshape(1, m_pad)
    rpad = jnp.pad(ranges.astype(jnp.float32), (0, b_pad - b))
    apad = jnp.pad(angles.astype(jnp.float32), (0, b_pad - b))
    rrep = jnp.repeat(rpad, TILE_M).reshape(n_groups, 1, GRP * TILE_M)
    arep = jnp.repeat(apad, TILE_M).reshape(n_groups, 1, GRP * TILE_M)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 1), lambda t, *_: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tex8.shape, lambda t, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rrep.shape, lambda t, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(arep.shape, lambda t, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, TILE_M), lambda t, *_: (0, t),
                               memory_space=pltpu.VMEM),
    )
    kern = functools.partial(_kernel_batched, n_groups=n_groups, geom=geom)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(flags.astype(jnp.int32), origins, tex8, rrep, arep, px, py, pth)
    return out[:b]


def spread_distances_sorted(omap, spose, ranges, angles, valid, pre,
                            interpret=False):
    """(B, m_pad) distances in SORTED particle order.

    Callers reduce over beams first (order-invariant) and un-permute the
    final per-particle vector with `unsort(values_sorted, pre)`."""
    geom = _geom(omap)
    tex8 = jnp.round(
        omap.distances * (QLEVELS / omap.max_distance_to_object)
    ).astype(jnp.int8)
    flags = pre["flags"]
    out_n = _batched_call(
        geom, tex8, pre["spose_s"], ranges, angles, flags,
        pre["origins_narrow"], interpret=interpret,
    )
    out_s = _std_call(
        geom, tex8, pre["spose_s"], ranges, angles, flags, pre["origins"],
        interpret=interpret,
    )
    percol = jnp.repeat(flags[: pre["n_tiles"]], TILE_M)  # (m_pad,)
    return jnp.where(percol[None, :] == 1, out_n, out_s)


def unsort(values_sorted: jnp.ndarray, pre) -> jnp.ndarray:
    """(m_pad,) sorted-order values -> (M,) original particle order."""
    m = pre["perm"].shape[0]
    return jnp.zeros((m,), values_sorted.dtype).at[pre["perm"]].set(
        values_sorted[:m]
    )
