"""Pallas TPU kernel: lattice beam model over a precomputed range image.

Companion to ops/corr_kernel.py for the beam measurement model
(calcBeamModel, planar_scanner.cpp:168-234). With the per-angle range image
(maps/range_image.py), the map range seen by lattice pose (cell, yaw-bin t)
through beam b is a pure texture value R[k(t, b), j, i], so the whole beam
mixture becomes a correlation:

    corr[t, dj, di] = sum_b  phi_b( R[k(t,b), j0+dj, i0+di] * res )

phi_b is the 4-part hit/short/max/rand mixture cubed. One XLA dynamic_slice
compacts the (K, H, W) range image to the particle window (K, 64, 128) —
4 MB of VMEM — so the kernel does no DMA and no shifts at all: per tap it
reads one full slab window and runs the mixture elementwise.

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
    PWIN_C,
    PWIN_R,
    T_MAX,
)

# Fixed yaw-bin width for the beam lattice (corr_kernel's is adaptive, but
# the range-image kernel's angle discretization is tied to the baked K bins,
# so it keeps the original fixed contract: r*delta/2 <= half a cell at 8 m
# of 5 cm cells).
DELTA_THETA = 1.0 / 160.0

MAX_RI_BYTES = 6 * 1024 * 1024  # VMEM budget for the compacted (K, 64, 128) u16


def _kernel(
    # scalar prefetch (SMEM)
    meta_ref,  # (2,) int32: (t_count, t_min)
    obs_ref,  # (B,) f32 observed ranges
    angles_ref,  # (B,) f32 beam bearings
    mix_ref,  # (8,) f32: z_hit, z_short, z_max, z_rand_mult, range_max,
    #            denom_inv, lambda_short, res
    # VMEM
    rwin_ref,  # (K, PWIN_R, PWIN_C) uint16 compacted range image (cells)
    corr_ref,  # out (T_MAX, PWIN_R, PWIN_C) f32
    *,
    n_beams: int,
    k_angles: int,
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
    bin_inv = jnp.float32(k_angles) / (2.0 * jnp.pi)

    def tap(i, _):
        t = i // n_beams
        b = i % n_beams
        obs = obs_ref[b]
        theta = (meta_ref[1] + t).astype(jnp.float32) * DELTA_THETA + angles_ref[b]
        k = jnp.round(theta * bin_inv).astype(jnp.int32)
        k = jax.lax.rem(jax.lax.rem(k, k_angles) + k_angles, k_angles)
        win = rwin_ref[pl.ds(k, 1)].reshape(PWIN_R, PWIN_C)
        map_range = jnp.minimum(
            win.astype(jnp.int32).astype(jnp.float32) * res, range_max
        )
        z = obs - map_range
        pz = z_hit * jnp.exp(-(z * z) * denom_inv)
        pz = pz + jnp.where(z < 0, z_short * lam * jnp.exp(-lam * obs), 0.0)
        pz = pz + jnp.where(obs == range_max, z_max, 0.0)
        pz = pz + jnp.where(obs < range_max, z_rand_mult, 0.0)
        corr_ref[pl.ds(t, 1)] = corr_ref[pl.ds(t, 1)] + (pz * pz * pz)[None, :, :]
        return 0

    jax.lax.fori_loop(0, meta_ref[0] * n_beams, tap, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("n_beams", "k_angles", "interpret"))
def _beam_call(rwin, meta, obs, angles, mix, n_beams, k_angles, interpret=False):
    kern = functools.partial(_kernel, n_beams=n_beams, k_angles=k_angles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_MAX, PWIN_R, PWIN_C), jnp.float32),
        interpret=interpret,
    )(meta, obs, angles, mix, rwin)


def beam_prepass(omap, spose):
    """Particle lattice geometry for the beam kernel (window + yaw bins)."""
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
    fits = span_ok & (t_count <= T_MAX)
    return {"ci": ci, "cj": cj, "i0": i0, "j0": j0, "t_m": t_m,
            "t_min": t_min, "t_count": t_count, "fits": fits}


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
    p = 1 + corr at each particle's lattice pose."""
    k_angles = int(omap.range_image.shape[0])
    rwin = jax.lax.dynamic_slice(
        omap.range_image, (0, pre["j0"], pre["i0"]),
        (k_angles, PWIN_R, PWIN_C),
    )
    denom = 2.0 * params.sigma_hit * params.sigma_hit
    mix = jnp.stack([
        params.z_hit, params.z_short, params.z_max,
        params.z_rand / scan.range_max, scan.range_max,
        1.0 / denom, params.lambda_short, jnp.float32(omap.resolution),
    ]).astype(jnp.float32)
    meta = jnp.stack([pre["t_count"], pre["t_min"]]).astype(jnp.int32)
    corr = _beam_call(
        rwin, meta, scan.ranges.astype(jnp.float32),
        scan.angles.astype(jnp.float32), mix,
        n_beams=int(scan.ranges.shape[0]), k_angles=k_angles,
        interpret=interpret,
    )
    t_rel = jnp.clip(pre["t_m"] - pre["t_min"], 0, T_MAX - 1)
    dj = jnp.clip(pre["cj"] - pre["j0"], 0, PWIN_R - 1)
    di = jnp.clip(pre["ci"] - pre["i0"], 0, PWIN_C - 1)
    flat = (t_rel * PWIN_R + dj) * PWIN_C + di
    return 1.0 + jnp.take(corr.reshape(-1), flat)
