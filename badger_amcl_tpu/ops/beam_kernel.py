"""Pallas TPU kernel: lattice beam model over a precomputed range image.

Companion to ops/corr_kernel.py for the beam measurement model
(calcBeamModel, planar_scanner.cpp:168-234). With the per-angle range image
(maps/range_image.py), the map range seen by lattice pose (cell, yaw-bin t)
through beam b is a pure texture value R[k(t, b), j, i], so the whole beam
mixture becomes a correlation:

    corr[t, dj, di] = sum_b  phi_b( R[k(t, b), j0+dj, i0+di] * res )

phi_b is the 4-part hit/short/max/rand mixture cubed. One XLA dynamic_slice
compacts the (K, H, W) range image to the particle window (K, 64, 128) —
4 MB of VMEM — so the kernel does no DMA and no shifts at all: per tap it
reads one full slab window and runs the mixture elementwise.

Round-3 structure (adopted from corr v2):
- yaw-bin width is ADAPTIVE: delta = res/range_max keeps the worst-case
  arc error r*delta <= one cell for the longest representable return on
  the map at hand (clamped to [1/MAX_RANGE_CELLS, 1/MIN_RANGE_CELLS]), so
  short-range sensors get proportionally coarser bins -> fewer taps.
- occupied yaw bins are COMPACTED outside the kernel (one-hot cumsum, no
  vmapped argsort), so Gaussian tails and multimodal gaps between bins are
  never iterated.
- the beam loop is INNER and accumulates into a (PWIN_R, PWIN_C) register
  tile, storing corr[t] once per bin: the round-2 flat tap loop re-read and
  re-wrote the 32 KB corr slab per (t, b) tap, which dominated its 14.9 ms
  at 5k x 720 (PERF.md config 2).

Approximate (lattice + angle-bin + range-image resampling, each ~1 cell /
r * 2 pi / K); the exact Bresenham path (sensors/raycast.py) remains the
reference contract and the fallback for spread clouds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from badger_amcl_tpu.ops.corr_kernel import (
    MAX_RANGE_CELLS,
    MIN_RANGE_CELLS,
    PWIN_C,
    PWIN_R,
    PWIN_R_NARROW,
    PWIN_R_TIGHT,
    T_MAX,
)

MAX_RI_BYTES = 6 * 1024 * 1024  # VMEM budget for the compacted (K, 64, 128) u16


def _dtheta(omap, range_max):
    """Adaptive yaw-bin width: one map cell of arc at the sensor's max
    range (the longest return the range image can produce)."""
    max_cells = range_max / omap.resolution
    return 1.0 / jnp.clip(max_cells, MIN_RANGE_CELLS, MAX_RANGE_CELLS)


def _kernel(
    # scalar prefetch (SMEM)
    meta_ref,  # (2,) int32: (t_n, t_min)
    t_order_ref,  # (T_MAX,) int32 — compacted slot -> raw bin offset
    obs_ref,  # (B,) f32 observed ranges
    angles_ref,  # (B,) f32 beam bearings
    mix_ref,  # (9,) f32: z_hit, z_short, z_max, z_rand_mult, range_max,
    #            denom_inv, lambda_short, res, dtheta
    # VMEM
    rwin_ref,  # (K, rows, PWIN_C) uint16 compacted range image (cells)
    corr_ref,  # out (T_MAX, rows, PWIN_C) f32
    *,
    n_beams: int,
    k_angles: int,
    rows: int,
):
    corr_ref[...] = jnp.zeros_like(corr_ref)
    z_hit = mix_ref[0]
    z_short = mix_ref[1]
    z_max = mix_ref[2]
    z_rand_mult = mix_ref[3]
    range_max = mix_ref[4]
    denom_inv = mix_ref[5]
    lam = mix_ref[6]
    res = mix_ref[7]
    dtheta = mix_ref[8]
    bin_inv = jnp.float32(k_angles) / (2.0 * jnp.pi)

    def bin_body(t, _):
        t_raw = (meta_ref[1] + t_order_ref[t]).astype(jnp.float32) * dtheta

        def beam_body(b, acc):
            obs = obs_ref[b]
            theta = t_raw + angles_ref[b]
            k = jnp.round(theta * bin_inv).astype(jnp.int32)
            k = jax.lax.rem(jax.lax.rem(k, k_angles) + k_angles, k_angles)
            win = rwin_ref[pl.ds(k, 1)].reshape(rows, PWIN_C)
            map_range = jnp.minimum(
                win.astype(jnp.int32).astype(jnp.float32) * res, range_max
            )
            z = obs - map_range
            pz = z_hit * jnp.exp(-(z * z) * denom_inv)
            pz = pz + jnp.where(z < 0, z_short * lam * jnp.exp(-lam * obs), 0.0)
            pz = pz + jnp.where(obs == range_max, z_max, 0.0)
            pz = pz + jnp.where(obs < range_max, z_rand_mult, 0.0)
            return acc + pz * pz * pz

        acc = jax.lax.fori_loop(
            0, n_beams, beam_body,
            jnp.zeros((rows, PWIN_C), jnp.float32), unroll=False,
        )
        corr_ref[pl.ds(t, 1)] = acc[None, :, :]
        return 0

    jax.lax.fori_loop(0, meta_ref[0], bin_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("n_beams", "k_angles", "rows",
                                              "interpret"))
def _beam_call(rwin, meta, t_order, obs, angles, mix, n_beams, k_angles,
               rows=PWIN_R, interpret=False):
    kern = functools.partial(
        _kernel, n_beams=n_beams, k_angles=k_angles, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_MAX, rows, PWIN_C), jnp.float32),
        interpret=interpret,
    )(meta, t_order, obs, angles, mix, rwin)


def beam_prepass(omap, spose, range_max=8.0):
    """Particle lattice geometry for the beam kernel: window, adaptive yaw
    bins, and the compacted occupied-bin machinery (corr_kernel-style
    one-hot cumsum — no M-sized scatter, no argsort)."""
    ij = omap.world_to_map(spose[:, :2])
    ci = jnp.clip(ij[..., 0], 0, omap.size_x - 1)
    cj = jnp.clip(ij[..., 1], 0, omap.size_y - 1)
    i0 = jnp.min(ci)
    j0 = jnp.min(cj)
    row_span = jnp.max(cj) - j0
    span_ok = (jnp.max(ci) - i0 < PWIN_C) & (row_span < PWIN_R)
    # window-height variants (corr_kernel pattern): the per-tap elementwise
    # mixture cost scales with rows, and converged clouds span ~15-20 cells
    narrow_ok = span_ok & (row_span < PWIN_R_NARROW) & (
        omap.size_y >= PWIN_R_NARROW)
    tight_ok = span_ok & (row_span < PWIN_R_TIGHT) & (
        omap.size_y >= PWIN_R_TIGHT)
    j0_raw = j0
    i0 = jnp.clip(i0, 0, max(omap.size_x - PWIN_C, 0))
    j0 = jnp.clip(j0_raw, 0, max(omap.size_y - PWIN_R, 0))
    j0_n = jnp.clip(j0_raw, 0, max(omap.size_y - PWIN_R_NARROW, 0))
    j0_t = jnp.clip(j0_raw, 0, max(omap.size_y - PWIN_R_TIGHT, 0))
    dtheta = _dtheta(omap, jnp.float32(range_max))
    t_m = jnp.round(spose[:, 2] / dtheta).astype(jnp.int32)
    t_min = jnp.min(t_m)
    t_count = jnp.max(t_m) - t_min + 1
    fits = span_ok & (t_count <= T_MAX)

    # occupied-bin compaction (corr_prepass pattern): per-particle compacted
    # slot + slot -> raw-offset order, both as tiny one-hot reductions
    t_rel = jnp.clip(t_m - t_min, 0, T_MAX - 1)
    oh_bins = t_rel[:, None] == jnp.arange(T_MAX, dtype=jnp.int32)[None, :]
    t_occ = jnp.any(oh_bins, axis=0).astype(jnp.int32)
    t_n = jnp.sum(t_occ)
    t_dest = jnp.where(
        t_occ == 1,
        jnp.cumsum(t_occ) - 1,
        t_n + jnp.cumsum(1 - t_occ) - 1,
    ).astype(jnp.int32)
    t_order = jnp.zeros((T_MAX,), jnp.int32).at[t_dest].set(
        jnp.arange(T_MAX, dtype=jnp.int32)
    )
    t_slot = jnp.sum(jnp.where(oh_bins, t_dest[None, :], 0), axis=1)

    return {"ci": ci, "cj": cj, "i0": i0, "j0": j0, "j0_narrow": j0_n,
            "j0_tight": j0_t, "narrow": narrow_ok, "tight": tight_ok,
            "t_m": t_m, "t_min": t_min, "t_count": t_count, "fits": fits,
            "dtheta": dtheta, "t_slot": t_slot, "t_n": t_n,
            "t_order": t_order}


def ri_fits(omap) -> bool:
    if omap.range_image is None:
        return False
    k = omap.range_image.shape[0]
    return (
        k * PWIN_R * PWIN_C * 2 <= MAX_RI_BYTES
        and omap.size_y >= PWIN_R
        and omap.size_x >= PWIN_C
    )


def beam_corr_values(omap, params, scan, spose, pre, interpret=False):
    """p_model (M,) for the beam mixture via the lattice kernel:
    p = 1 + corr at each particle's lattice pose. A lax.cond picks the
    smallest window height the particle row span allows."""
    k_angles = int(omap.range_image.shape[0])
    denom = 2.0 * params.sigma_hit * params.sigma_hit
    mix = jnp.stack([
        params.z_hit, params.z_short, params.z_max,
        params.z_rand / scan.range_max, scan.range_max,
        1.0 / denom, params.lambda_short, jnp.float32(omap.resolution),
        pre["dtheta"],
    ]).astype(jnp.float32)
    meta = jnp.stack(
        [jnp.maximum(pre["t_n"], 1), pre["t_min"]]
    ).astype(jnp.int32)

    def run(rows, j0):
        rwin = jax.lax.dynamic_slice(
            omap.range_image, (0, j0, pre["i0"]),
            (k_angles, rows, PWIN_C),
        )
        corr = _beam_call(
            rwin, meta, pre["t_order"], scan.ranges.astype(jnp.float32),
            scan.angles.astype(jnp.float32), mix,
            n_beams=int(scan.ranges.shape[0]), k_angles=k_angles,
            rows=rows, interpret=interpret,
        )
        dj = jnp.clip(pre["cj"] - j0, 0, rows - 1)
        di = jnp.clip(pre["ci"] - pre["i0"], 0, PWIN_C - 1)
        flat = (pre["t_slot"] * rows + dj) * PWIN_C + di
        return 1.0 + jnp.take(corr.reshape(-1), flat)

    return jax.lax.cond(
        pre["tight"],
        lambda _: run(PWIN_R_TIGHT, pre["j0_tight"]),
        lambda _: jax.lax.cond(
            pre["narrow"],
            lambda __: run(PWIN_R_NARROW, pre["j0_narrow"]),
            lambda __: run(PWIN_R, pre["j0"]),
            operand=None,
        ),
        operand=None,
    )
