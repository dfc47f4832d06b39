"""Pallas TPU kernel: stencil-correlation likelihood (correlative scan
matching on a pose lattice).

The windowed one-hot kernel (lf_kernel.py) still does O(M x B) work. This
kernel exploits a deeper structure: on the pose *lattice* (map cells x
quantized yaw), every particle sharing a lattice cell has the same score, and
the score is a sparse correlation of the scan's endpoint stencil with a
per-cell beam-likelihood texture:

    corr[t, dj, di] = sum_b  Psi[(j0 + dj) + oj(t, b), (i0 + di) + oi(t, b)]

with per-(yaw-bin, beam) integer offsets oj/oi = round(r_b * u(theta_t + a_b)
/ res), computed in-kernel with scalar trig from SMEM-resident scan data.
Building `corr` costs O(T_active x B) shifted-window adds — *independent of
the particle count* — and particles then read their value with one small
gather.

This is the likelihood-field arm of Olson-style correlative scan matching:
lattice rounding replaces exact per-endpoint rounding (each endpoint cell
differs by at most one map cell — below the sigma_hit length scale and far
inside Monte-Carlo tolerance). The exact paths ("pallas" windowed kernel,
"xla") remain available, and a lax.cond falls back to them for spread
clouds, wide yaw ranges, over-long beams, or maps too big for VMEM.

Mosaic constraints shaping the implementation: vector-load origins must be
(8, 128)-aligned — arbitrary stencil shifts are aligned loads + two dynamic
rolls (tpu.DynamicRotateOp, 32-bit only, hence the f32 texture); per-element
VMEM reads can't be proven aligned — per-tap scalars therefore come from
SMEM or scalar arithmetic, never VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_R = 192  # row padding: >= max |row offset| + 8 alignment margin
PAD_C = 320  # col padding: >= max |col offset| + 128 alignment margin
PWIN_R = 64  # particle-cell window rows (j)
PWIN_C = 128  # particle-cell window cols (i)
T_MAX = 64  # max active yaw bins per update
LOAD_R = PWIN_R + 8
LOAD_C = PWIN_C + 128
# rad/bin: stencil error r*delta/2 stays ~half a cell for r <= 160 cells
# (8 m at 5 cm); 64 bins then cover 0.4 rad of yaw spread, comfortably more
# than a converged filter's yaw range
DELTA_THETA = 1.0 / 160.0
# VMEM budget for the padded f32 texture (tpu.DynamicRotateOp is 32-bit
# only, so the in-kernel texture must be f32); bigger maps fall back (static)
MAX_PADDED_CELLS = 3 * 1024 * 1024


def _kernel(
    # scalar prefetch (SMEM)
    meta_ref,  # (4,) int32 — (t_count, window row0, window col0, t_min)
    valid_ref,  # (B,) int32 — beam validity
    tocc_ref,  # (T_MAX,) int32 — 1 where the yaw bin holds any particle
    ranges_ref,  # (B,) f32
    angles_ref,  # (B,) f32
    # VMEM
    tex_ref,  # (Hp, Wp) f32 padded likelihood texture
    corr_ref,  # out (T_MAX, PWIN_R, PWIN_C) f32
    *,
    n_beams: int,
    inv_res: float,
):
    corr_ref[...] = jnp.zeros_like(corr_ref)
    row0 = meta_ref[1]
    col0 = meta_ref[2]

    def tap(k, _):
        t = k // n_beams
        b = k % n_beams

        @pl.when((valid_ref[b] != 0) & (tocc_ref[t] != 0))
        def _():
            r = ranges_ref[b]
            # theta_t = (t_min + t) * delta; t_min rides in meta (dynamic)
            theta = (
                (meta_ref[3] + t).astype(jnp.float32) * DELTA_THETA
                + angles_ref[b]
            )
            oi = jnp.round(r * jnp.cos(theta) * inv_res).astype(jnp.int32)
            oj = jnp.round(r * jnp.sin(theta) * inv_res).astype(jnp.int32)
            sr = row0 + oj
            sc = col0 + oi
            ar = (sr // 8) * 8
            ac = (sc // 128) * 128
            dr = sr - ar
            dc = sc - ac
            block = tex_ref[pl.ds(pl.multiple_of(ar, 8), LOAD_R),
                            pl.ds(pl.multiple_of(ac, 128), LOAD_C)]
            block = pltpu.roll(block, -dr, axis=0)
            block = pltpu.roll(block, -dc, axis=1)
            corr_ref[pl.ds(t, 1)] = (
                corr_ref[pl.ds(t, 1)] + block[0:PWIN_R, 0:PWIN_C][None, :, :]
            )

        return 0

    jax.lax.fori_loop(0, meta_ref[0] * n_beams, tap, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("n_beams", "inv_res", "interpret"))
def _corr_call(tex_pad, meta, valid, tocc, ranges, angles, n_beams, inv_res,
               interpret=False):
    kern = functools.partial(_kernel, n_beams=n_beams, inv_res=inv_res)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_MAX, PWIN_R, PWIN_C), jnp.float32),
        interpret=interpret,
    )(meta, valid, tocc, ranges, angles, tex_pad)


def map_fits(omap) -> bool:
    """Static check: padded texture within the VMEM budget and window-sized."""
    hp = omap.size_y + 2 * PAD_R
    wp = omap.size_x + 2 * PAD_C
    return (
        hp * wp <= MAX_PADDED_CELLS
        and omap.size_y >= PWIN_R
        and omap.size_x >= PWIN_C
    )


def corr_prepass(omap, spose, ranges, angles, valid):
    """Lattice geometry: particle cells & window, yaw bins, dynamic fits
    flag. All fused XLA reductions; nothing (M, B)-sized."""
    res = omap.resolution
    ij = omap.world_to_map(spose[:, :2])
    ci = jnp.clip(ij[..., 0], 0, omap.size_x - 1)
    cj = jnp.clip(ij[..., 1], 0, omap.size_y - 1)
    i0 = jnp.min(ci)
    j0 = jnp.min(cj)
    span_ok = (jnp.max(ci) - i0 < PWIN_C) & (jnp.max(cj) - j0 < PWIN_R)
    i0 = jnp.clip(i0, 0, max(omap.size_x - PWIN_C, 0))
    j0 = jnp.clip(j0, 0, max(omap.size_y - PWIN_R, 0))

    t_m = jnp.round(spose[:, 2] / DELTA_THETA).astype(jnp.int32)
    t_min = jnp.min(t_m)
    t_count = jnp.max(t_m) - t_min + 1
    yaw_ok = t_count <= T_MAX

    # max stencil offset magnitude is bounded by the longest valid range
    max_cells = jnp.max(jnp.where(valid, ranges, 0.0)) / res
    range_ok = (max_cells < (PAD_C - 129)) & (max_cells < (PAD_R - 9))

    # yaw-bin occupancy: empty bins (Gaussian tails) are skipped in-kernel
    t_rel = jnp.clip(t_m - t_min, 0, T_MAX - 1)
    t_occ = jnp.zeros((T_MAX,), jnp.int32).at[t_rel].set(1, mode="drop")
    return {
        "ci": ci, "cj": cj, "i0": i0, "j0": j0,
        "t_m": t_m, "t_min": t_min, "t_count": t_count, "t_occ": t_occ,
        "fits": span_ok & yaw_ok & range_ok,
    }


def corr_values(omap, tex_psi, offmap_psi, spose, ranges, angles, valid, pre,
                interpret=False):
    """Build the correlation table and gather each particle's value.

    tex_psi: (H, W) per-cell beam likelihood (model-specific transform of the
    distance field). offmap_psi: value for endpoints beyond the map
    (psi(max_distance), planar_scanner.cpp:295-300) — painted into the
    padding. Returns (M,) f32 of sum_b psi at each particle's lattice pose."""
    tex_pad = jnp.zeros(
        (omap.size_y + 2 * PAD_R, omap.size_x + 2 * PAD_C), jnp.float32
    )
    tex_pad = tex_pad + offmap_psi.astype(jnp.float32)
    tex_pad = jax.lax.dynamic_update_slice(
        tex_pad, tex_psi.astype(jnp.float32), (PAD_R, PAD_C)
    )

    meta = jnp.stack(
        [pre["t_count"], pre["j0"] + PAD_R, pre["i0"] + PAD_C, pre["t_min"]]
    ).astype(jnp.int32)
    corr = _corr_call(
        tex_pad,
        meta,
        valid.astype(jnp.int32),
        pre["t_occ"],
        ranges.astype(jnp.float32),
        angles.astype(jnp.float32),
        n_beams=int(ranges.shape[0]),
        inv_res=float(1.0 / omap.resolution),
        interpret=interpret,
    )
    t_rel = jnp.clip(pre["t_m"] - pre["t_min"], 0, T_MAX - 1)
    dj = jnp.clip(pre["cj"] - pre["j0"], 0, PWIN_R - 1)
    di = jnp.clip(pre["ci"] - pre["i0"], 0, PWIN_C - 1)
    flat = (t_rel * PWIN_R + dj) * PWIN_C + di
    return jnp.take(corr.reshape(-1), flat)
