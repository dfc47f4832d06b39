"""Pallas TPU kernel: beam-model likelihood for SPREAD particle clouds.

Closes the last recovery-regime gap (the round-3 verdict's "beam-model
global localization" item): `laser_model_type: beam` during global
localization (reference node.cpp:847-868 over calcBeamModel,
planar_scanner.cpp:168-234). The lattice beam kernel (ops/beam_kernel.py)
needs a shared (64, 128) particle window and a bounded yaw span — exactly
what a spread cloud violates — and the exact Bresenham bundle is
seconds-class at 50k x 720.

Key structural fact the spread formulation exploits: unlike the LF models,
the beam model's texture read is at the PARTICLE's own cell, not the beam
endpoint — with the per-angle range image R[k, j, i] (maps/range_image.py),
beam b of particle p reads R[k(p, b), j_p, i_p] where

    k(p, b) = round((theta_p + a_b) * K / 2pi) mod K
            ~ sigma_p + kappa_b   (each term rounded; <= 1 extra slab vs
                                   the lattice kernel's rounding — same
                                   approximation class)

So ALL of a particle's reads live in ONE per-cell K-vector R[:, j_p, i_p],
and the per-beam slab offsets kappa_b are PARTICLE-INDEPENDENT. The design:

1. Bake a transposed range image `range_rows` (H*W, K) u16 once per map
   (rows contiguous in K) — one XLA row gather then fetches a particle's
   whole K-vector at the ~8 ns/row per-INDEX cost (PERF.md: the lanes of
   a row are free), vs 36M scalar endpoint gathers (~270 ms) for the
   naive formulation. (A 2D-start gather that would fetch pre-rotated
   rows measured 62 ms — XLA lowers it per-ELEMENT — hence the rotation
   happens in-kernel instead.)
2. Sort particles by sigma_p (argsort is microseconds). A 1024-particle
   tile then contains few DISTINCT sigma values; the prepass emits each
   tile's distinct-slab list, and the kernel selects each particle's row
   by slot identity — cost proportional to the tile's ACTUAL distinct
   count, so dense tiles pay ~6 selects while sparse yaw-tail tiles
   (Gaussian clouds wrap into a dense-ends/sparse-middle profile over the
   mod-K axis) pay up to K — bounded, never a fallback.
3. Collapse beams to their <= K distinct slab offsets: beams sharing
   kappa read the SAME value for every particle, so their mixture terms
   merge into one per-offset table  Phi[kappa, v] = sum_b pz_b(m(v))^3
   over beams with that offset (m(v) = min(v*res, range_max) — the range
   image's value contract). 720 beams -> ~180 table rows; the mixture
   (exp-heavy) is evaluated (B, V) ONCE outside the kernel — no
   transcendentals in-kernel (the spread kernel's hardest-won lesson).
4. The kernel, per (1024-particle tile, occupied offset g): nd single-row
   reads of the doubled-row texture block + slot selects, then the Phi[g]
   table lookup as a (V, 1024) one-hot and a (1, V) @ (V, 1024) MXU
   contraction at Precision.HIGHEST — DEFAULT f32 matmuls truncate to
   bf16 on the MXU and made hw diverge from interpret by ~8e-3 (caught by
   PROBES_r04; the exact CLAUDE.md class). Table reads are EXACT (one-hot
   matmuls sum a single product).

Approximation vs the exact Bresenham contract: range-image resampling
(~1 cell) + slab rounding (<= 1.5 slabs = 2.1 deg at K=256) — the same
class as the lattice beam kernel, documented there; the exact path
remains the contract and the fallback (engaged only when `range_rows`
is not baked or range_max/res exceeds the value-table capacity). Output
is in SORTED particle order; callers un-permute with `unsort`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 1024  # particles per kernel tile (8 sublane rows x 128 lanes)
V = 256  # static range-value table size (cells); needs range_max/res < V
_TWO_PI = 6.283185307179586

# HBM budget for the transposed range-image bake (H*W*K u16): 1024^2 x 256
# is 512 MB; past this the bake is skipped and spread beam clouds take the
# exact Bresenham fallback.
RANGE_ROWS_MAX_BYTES = 768 << 20


def _kernel(
    # scalar prefetch (SMEM)
    meta_ref,  # (2,) int32: (n_g, cap) — occupied-offset count, value cap
    gocc_ref,  # (K,) int32 — occupied slab offsets, compacted front
    nd_ref,  # (n_tiles,) int32 — per-tile distinct sigma count
    slist_ref,  # (n_tiles * K,) int32 — per-tile distinct sigmas (front),
    #             padded with -1 (never matches; row read clamps to 0)
    kk_ref,  # (1,) int32 — K (slab count), for slist row indexing
    # VMEM
    x_ref,  # (2K, 8, 128) u16 texture block (slab rows doubled)
    sig_ref,  # (8, 128) int32 — per-particle sigma
    phi_ref,  # (K, 1, V) f32 — per-offset mixture tables
    out_ref,  # (8, 128) f32 — per-particle sum of pz^3 over beams
):
    t = pl.program_id(0)
    nd = nd_ref[t]
    sig = sig_ref[...]  # (8, 128)
    cap = meta_ref[1]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, TILE_P), 0)

    def g_body(gi, acc):
        g = gocc_ref[gi]

        def slot_body(j, v):
            slab = slist_ref[t * kk_ref[0] + j]
            rd = x_ref[pl.ds(jnp.maximum(slab, 0) + g, 1)]  # (1, 8, 128)
            return jnp.where(sig == slab, rd[0].astype(jnp.int32), v)

        v = jax.lax.fori_loop(
            0, nd, slot_body, jnp.zeros((8, 128), jnp.int32), unroll=False
        )
        v = jnp.minimum(v, cap)
        v_flat = v.reshape(1, TILE_P)
        onehot = (iota_v == v_flat).astype(jnp.float32)  # (V, TILE_P)
        phi_g = phi_ref[pl.ds(g, 1)].reshape(1, V)
        contr = jax.lax.dot_general(
            phi_g, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # DEFAULT f32 matmuls TRUNCATE operands to bf16 on the MXU —
            # hw diverged from interpret by ~8e-3 without this (PROBES
            # caught it); the one-hot side is bf16-exact but phi is not.
            precision=jax.lax.Precision.HIGHEST,
        )  # (1, TILE_P)
        return acc + contr

    acc = jax.lax.fori_loop(
        0, meta_ref[0], g_body, jnp.zeros((1, TILE_P), jnp.float32),
        unroll=False,
    )
    out_ref[...] = acc.reshape(8, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(meta, gocc, nd_t, slist, kk, x3, sig, phi, interpret=False):
    n_tiles = sig.shape[0] // 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (x3.shape[0], 8, 128), lambda t, *_: (0, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(phi.shape, lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sig.shape[0], 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(meta, gocc, nd_t, slist, kk, x3, sig, phi)


def beam_spread_prepass(omap, spose, scan):
    """Sigma sort, per-tile distinct-slab lists, and the beam->slab-offset
    machinery. `fits` gates only the value-table capacity (range_max/res
    < V) — the slot design itself handles any yaw distribution."""
    k = int(omap.range_image.shape[0])
    m = spose.shape[0]
    m_pad = -(-m // TILE_P) * TILE_P

    ij = omap.world_to_map(spose[:, :2])
    ci = jnp.clip(ij[..., 0], 0, omap.size_x - 1)
    cj = jnp.clip(ij[..., 1], 0, omap.size_y - 1)
    flat = cj * omap.size_x + ci
    bin_inv = jnp.float32(k) / _TWO_PI
    sig = jnp.round(spose[:, 2] * bin_inv).astype(jnp.int32)
    sig = jax.lax.rem(jax.lax.rem(sig, k) + k, k)

    draw = jnp.arange(m, dtype=jnp.int32)
    sig_s, perm, flat_s = jax.lax.sort(
        (sig, draw, flat), num_keys=1, is_stable=True
    )
    if m_pad != m:
        pad = m_pad - m
        sig_s = jnp.concatenate([sig_s, jnp.tile(sig_s[-1:], (pad,))])
        flat_s = jnp.concatenate([flat_s, jnp.tile(flat_s[-1:], (pad,))])

    n_tiles = m_pad // TILE_P
    sig_t = sig_s.reshape(n_tiles, TILE_P)
    # per-tile distinct-sigma compaction: values are sorted within a tile,
    # so first-occurrence flags + a per-row one-hot max assemble the slot
    # lists without any scatter
    uniq = jnp.concatenate(
        [jnp.ones((n_tiles, 1), bool), sig_t[:, 1:] != sig_t[:, :-1]],
        axis=1,
    )
    slot = jnp.cumsum(uniq.astype(jnp.int32), axis=1) - 1  # (n_tiles, TILE_P)
    nd_t = slot[:, -1] + 1
    oh = slot[:, :, None] == jnp.arange(k, dtype=jnp.int32)[None, None, :]
    slist = jnp.max(
        jnp.where(oh, sig_t[:, :, None], -1), axis=1
    ).astype(jnp.int32).reshape(-1)  # (n_tiles * K,), -1 padded

    # beam -> slab offsets, compacted occupied list (one-hot cumsum — the
    # corr_prepass bin-compaction pattern)
    kap = jnp.round(scan.angles.astype(jnp.float32) * bin_inv).astype(jnp.int32)
    kap = jax.lax.rem(jax.lax.rem(kap, k) + k, k)
    ohk = kap[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]  # (B, K)
    occ = jnp.any(ohk, axis=0)
    n_g = jnp.sum(occ).astype(jnp.int32)
    occ_i = occ.astype(jnp.int32)
    dest = jnp.where(
        occ, jnp.cumsum(occ_i) - 1, n_g + jnp.cumsum(1 - occ_i) - 1
    )
    gocc = jnp.zeros((k,), jnp.int32).at[dest].set(
        jnp.arange(k, dtype=jnp.int32))

    fits = (scan.range_max / omap.resolution) < V

    return {
        "perm": perm, "sig_s": sig_s, "flat_s": flat_s,
        "nd_t": nd_t, "slist": slist,
        "gocc": gocc, "n_g": n_g, "kap_onehot": ohk, "fits": fits,
        "m_pad": m_pad, "k": k,
    }


def _phi_tables(omap, params, scan, pre):
    """(K, 1, V) f32: Phi[g, 0, v] = sum over beams with slab offset g of
    pz(obs_b, m(v))^3, m(v) = min(v*res, range_max) — the 4-part beam
    mixture (planar_scanner.cpp:196-225). Unlike the LF models
    (planar_scanner.cpp:281-282), calcBeamModel has NO NaN-beam skip: a NaN
    range makes pz NaN and poisons every particle's p (the node layer passes
    NaN ranges through, node_2d.cpp:553), driving total weight non-positive
    and triggering the uniform-reset path — a preserved reference quirk.
    Here the NaN rides the mixture terms into the Phi contraction (0 * NaN
    is NaN, so every table row goes NaN) and every particle's kernel sum is
    NaN, exactly matching the exact-fallback arm's behavior."""
    obs = scan.ranges.astype(jnp.float32)[:, None]  # (B, 1)
    m_v = jnp.minimum(
        jnp.arange(V, dtype=jnp.float32)[None, :] * omap.resolution,
        scan.range_max,
    )  # (1, V)
    z = obs - m_v
    denom = 2.0 * params.sigma_hit * params.sigma_hit
    pz = params.z_hit * jnp.exp(-(z * z) / denom)
    pz = pz + jnp.where(
        z < 0,
        params.z_short * params.lambda_short
        * jnp.exp(-params.lambda_short * obs),
        0.0,
    )
    pz = pz + jnp.where(obs == scan.range_max, params.z_max, 0.0)
    pz = pz + jnp.where(obs < scan.range_max, params.z_rand / scan.range_max, 0.0)
    terms = pz * pz * pz  # (B, V); NaN beams propagate (see docstring)
    # segment over slab offsets via the prepass one-hot: (K, B) @ (B, V)
    phi = jax.lax.dot_general(
        pre["kap_onehot"].astype(jnp.float32).T, terms,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, V)
    return phi[:, None, :]


def beam_spread_values(omap, params, scan, spose, pre, interpret=False):
    """p_model (M,) for the beam mixture over a spread cloud: 1 + the
    kernel's per-particle sum, un-permuted to draw order. Only call when
    pre["fits"] (wrap in lax.cond against the exact fallback)."""
    k, m_pad = pre["k"], pre["m_pad"]
    m = spose.shape[0]

    # per-particle K-vectors, sigma-sorted: ONE row gather
    rows = jnp.take(omap.range_rows, pre["flat_s"], axis=0)  # (m_pad, K) u16
    # double the slab axis so sigma + kappa never wraps
    rows2 = jnp.concatenate([rows, rows], axis=1)
    x3 = jnp.transpose(rows2).reshape(2 * k, m_pad // 128, 128)

    cap = jnp.minimum(
        jnp.round(scan.range_max / omap.resolution).astype(jnp.int32),
        V - 1,
    )
    meta = jnp.stack([pre["n_g"], cap]).astype(jnp.int32)
    phi = _phi_tables(omap, params, scan, pre)
    sig2 = pre["sig_s"].reshape(m_pad // 128, 128)
    out = _call(meta, pre["gocc"], pre["nd_t"], pre["slist"],
                jnp.full((1,), k, jnp.int32), x3, sig2, phi,
                interpret=interpret)
    sums = out.reshape(-1)[:m_pad]
    return 1.0 + unsort(sums, pre, m)


def unsort(values_sorted, pre, m):
    return jnp.zeros((m,), values_sorted.dtype).at[pre["perm"]].set(
        values_sorted[:m]
    )
