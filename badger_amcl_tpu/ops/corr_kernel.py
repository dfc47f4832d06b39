"""Pallas TPU kernel: stencil-correlation likelihood (correlative scan
matching on a pose lattice).

The windowed one-hot kernel (lf_kernel.py) still does O(M x B) work. This
kernel exploits a deeper structure: on the pose *lattice* (map cells x
quantized yaw), every particle sharing a lattice cell has the same score, and
the score is a sparse correlation of the scan's endpoint stencil with a
per-cell beam-likelihood texture:

    corr[t, dj, di] = sum_b  Psi[(j0 + dj) + oj(t, b), (i0 + di) + oi(t, b)]

with per-(yaw-bin, beam) integer offsets oj/oi = round(r_b * u(theta_t + a_b)
/ res). Building `corr` costs O(T_active x B_valid) shifted-window adds —
*independent of the particle count* — and particles then read their value
with one small gather.

This is the likelihood-field arm of Olson-style correlative scan matching:
lattice rounding replaces exact per-endpoint rounding (each endpoint cell
differs by at most one map cell — below the sigma_hit length scale and far
inside Monte-Carlo tolerance). The exact paths ("pallas" windowed kernel,
"xla") remain available, and a lax.cond falls back to them for spread
clouds, wide yaw ranges, over-long beams, or maps too big for VMEM.

Performance structure (v3):
- The per-tap work is pure data movement: offsets are precomputed *outside*
  the kernel as one vectorized (T_MAX, B) trig pass, packed as
  (weight << 20) | 10-bit (oj, oi) into int32, and read from SMEM — no
  scalar cos/sin/round per tap.
- Occupied yaw bins and valid beams are *compacted* before the kernel, and
  per-bin DUPLICATE offsets merge into one weighted tap (at range r the
  angular beam pitch maps to r*pitch/res cells, so every beam under
  ~res/pitch meters repeats an already-seen lattice offset — 2.85x fewer
  taps on the 720-beam bench scan; the tap's add becomes an FMA). The tap
  loop runs exactly t_n x nu[t] iterations with no branches, 8 independent
  taps per iteration (the load->roll chains overlap; 1-wide measured
  1.56 ms, 8-wide 0.73 ms at 42 bins x 720 beams, undeduped).
- An int8 ratio-quantized texture variant (_kernel_q) cuts tap bytes
  2.7-4x and VMEM-resident copies 8x (2 MB vs 16 MB), but measures ~6%
  SLOWER than the f32 kernel at the flagship shape (tracking likelihood
  1.56 vs 1.47 ms: the tap loop is issue-bound, and the q arm pays an
  extra sublane roll + two bitcasts per tap) — so it is opt-in (backend
  "pallas_corr_q"), for VMEM-constrained compositions, not the default.
  Dedup is the lever that actually moved the flagship: tracking
  likelihood 2.59 -> 1.47 ms (45.4k -> 16.0k taps), steady 1.13 -> 0.93.
- Three window heights are compiled (tight 24 / narrow 32 / standard 64
  rows); lax.cond picks the smallest the particle row span allows — a
  converged cloud's taps then move ~60% fewer bytes per tap.
- The kernel reads a fixed (SLICE_R, SLICE_C) active-region slice of the
  padded texture (2 MB), so map size never limits this path.

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
PWIN_R = 64  # particle-cell window rows (j), standard variant
PWIN_R_NARROW = 32  # narrow variant for converged clouds
PWIN_R_TIGHT = 24  # tight variant (steady tracking spans ~15-20 cells)
PWIN_C = 128  # particle-cell window cols (i)
T_MAX = 64  # max active yaw bins per update
# yaw-bin width is ADAPTIVE: delta = 1/max_range_cells keeps the stencil
# rounding error r*delta/2 at <= half a map cell for every beam of the scan
# at hand (short-range scans get proportionally coarser bins -> fewer taps
# and a wider covered yaw span), clamped to [1/MAX_RANGE_CELLS (the padding
# envelope), 1/MIN_RANGE_CELLS].
MIN_RANGE_CELLS = 16.0
MAX_RANGE_CELLS = 183.0  # = PAD_R - 9, the offset magnitude the padding allows
# The kernel never sees the whole padded texture: a static (SLICE_R,
# SLICE_C) active region around the particle window is dynamic-sliced from
# the HBM-resident padded texture per call (2 MB f32), so MAP SIZE DOES NOT
# LIMIT the corr kernel — a 4096^2 warehouse map costs the same VMEM as the
# bench's 1024^2. Sizes cover the window + both pads + alignment slop:
# rows: PWIN_R + 2*PAD_R + 8-align slop + clamp slop -> 512
# cols: PWIN_C + 2*PAD_C + 127-align slop + clamp slop -> 1024
SLICE_R = 512
SLICE_C = 1024


def _bin_loop(meta_ref, off_ref, tex_ref, corr_ref, *, n_beams, rows):
    """Shared tap loop over compacted yaw bins; `tex_ref` is any
    (8, SLICE_R, SLICE_C) f32 ref of row-preshifted texture copies (a VMEM
    input for _kernel, a DMA'd scratch for _kernel_pre)."""
    load_c = PWIN_C + 128
    row0 = meta_ref[1]
    col0 = meta_ref[2]

    # Register-tile accumulation: the per-bin partial sum rides the inner
    # fori_loop CARRY and hits corr_ref ONCE per yaw bin — the earlier
    # per-tap `corr_ref[t] += block` read-modify-wrote 2x(rows x PWIN_C) f32
    # of VMEM per tap, ~2/3 of the kernel's traffic (the beam kernel's
    # register-tile lesson, measured there first).
    def per_bin(t, _):
        def one_tap(b):
            packed = off_ref[t * n_beams + b]
            w = jax.lax.shift_right_logical(packed, 20)
            oj = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(packed, 12), 22
            )
            oi = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(packed, 22), 22
            )
            sr = row0 + oj
            sc = col0 + oi
            ar = (sr // 8) * 8
            ac = (sc // 128) * 128
            dc = sc - ac
            # the texture arrives as 8 row-preshifted copies: copy d holds
            # tex[r + d] at row r, so an arbitrary row origin becomes an
            # ALIGNED load from copy (sr - ar) — no sublane roll, no margin
            block = tex_ref[sr - ar, pl.ds(pl.multiple_of(ar, 8), rows),
                            pl.ds(pl.multiple_of(ac, 128), load_c)]
            # pltpu.roll requires NON-NEGATIVE shifts; a traced negative
            # amount silently miscompiles (verified on v5e), so the
            # left-roll by dc is its right-roll complement.
            block = pltpu.roll(block, (load_c - dc) % load_c, axis=1)
            # dedup multiplicity: the add becomes an FMA (same VPU cost)
            return w.astype(jnp.float32) * block[:, 0:PWIN_C]

        # W independent taps per iteration: amortizes loop overhead and lets
        # the load->roll chains overlap (1-wide 1.56 ms -> 2-wide 1.22 ->
        # 8-wide 0.83 at 42 bins x 720 beams). The mask-free main loop
        # covers nu//W full batches; a 1-wide dynamic tail loop takes the
        # remainder, so no select runs in the hot loop.
        W = 8
        nu = meta_ref[4 + t]  # per-bin tap count (deduped; == nv without)

        def tapw(k, acc):
            b = W * k
            for d in range(W):
                acc = acc + one_tap(b + d)
            return acc

        acc = jax.lax.fori_loop(
            0, nu // W, tapw,
            jnp.zeros((rows, PWIN_C), jnp.float32), unroll=False,
        )
        acc = jax.lax.fori_loop(
            (nu // W) * W, nu, lambda b, a: a + one_tap(b), acc,
            unroll=False,
        )
        corr_ref[pl.ds(t, 1)] = acc[None, :, :]
        return 0

    jax.lax.fori_loop(0, meta_ref[0], per_bin, 0, unroll=False)


def _kernel(
    # scalar prefetch (SMEM)
    meta_ref,  # (4 + T_MAX,) int32 — (t_n, row0, col0, nv, nu_0..nu_63)
    off_ref,  # (T_MAX * B,) int32 — packed (w << 20)|(oj & 0x3FF) << 10|(oi & 0x3FF)
    # VMEM
    tex_ref,  # (8, SLICE_R, SLICE_C) f32 row-preshifted texture copies
    corr_ref,  # out (T_MAX, rows, PWIN_C) f32
    *,
    n_beams: int,
    rows: int,
):
    corr_ref[...] = jnp.zeros_like(corr_ref)
    _bin_loop(meta_ref, off_ref, tex_ref, corr_ref,
              n_beams=n_beams, rows=rows)


def _kernel_pre(
    # scalar prefetch (SMEM)
    meta_ref,  # (4 + T_MAX,) int32 — as _kernel
    org_ref,  # (2,) int32 — (sj, si) active-region origin in the padded tex
    off_ref,  # (T_MAX * B,) int32 packed taps
    # ANY (compiler keeps the full preshifted texture in HBM — 8 x padded
    # map is far past VMEM)
    pre_ref,  # (8, Hp, Wp) f32 full-texture row-preshifted copies
    corr_ref,  # out (T_MAX, rows, PWIN_C) f32
    tex_vmem,  # scratch (8, SLICE_R, SLICE_C) f32
    sem,  # DMA semaphore
    *,
    n_beams: int,
    rows: int,
):
    """Baked-texture variant: the active region is DMA'd HBM->VMEM with a
    DYNAMIC origin inside the kernel, replacing the per-call HBM->HBM
    preshifted_slices build (16 MB read+write, ~0.3 ms/step at the flagship
    shape) with the HBM->VMEM transfer the kernel needs anyway (~20 us).
    The zero-init of the output overlaps the DMA."""
    # slice_origin aligns sj to 8 and si to 128; Mosaic needs the proof to
    # slice the (8,128)-tiled HBM memref at a traced offset
    sj = pl.multiple_of(org_ref[0], 8)
    si = pl.multiple_of(org_ref[1], 128)
    cp = pltpu.make_async_copy(
        pre_ref.at[:, pl.ds(sj, SLICE_R), pl.ds(si, SLICE_C)],
        tex_vmem,
        sem,
    )
    cp.start()
    corr_ref[...] = jnp.zeros_like(corr_ref)
    cp.wait()
    _bin_loop(meta_ref, off_ref, tex_vmem, corr_ref,
              n_beams=n_beams, rows=rows)


@functools.partial(
    jax.jit, static_argnames=("n_beams", "rows", "interpret")
)
def _corr_call_pre(tex_pre, meta, org, off, n_beams, rows, interpret=False):
    kern = functools.partial(_kernel_pre, n_beams=n_beams, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, SLICE_R, SLICE_C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_MAX, rows, PWIN_C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(meta, org, off, tex_pre)


@functools.partial(
    jax.jit, static_argnames=("n_beams", "rows", "interpret")
)
def _corr_call(tex_pad, meta, off, n_beams, rows, interpret=False):
    kern = functools.partial(_kernel, n_beams=n_beams, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_MAX, rows, PWIN_C), jnp.float32),
        # the 8 preshifted copies (16 MB) exceed the 16 MB scoped-vmem
        # default together with the output table; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(meta, off, tex_pad)


def _kernel_fleet(
    # blocked SMEM inputs (per-robot metadata; Mosaic wants sublane dims
    # divisible by 8, so robots ride in 8-blocks)
    meta_ref,  # (8, 8) int32 — rows: robots; cols: (t_n, row0, col0, nv, ...)
    off_ref,  # (8, T_MAX * B) int32 packed offsets
    tex_ref,  # (1, SLICE_R, SLICE_C) f32 — this robot's active-region slice
    corr_ref,  # out (1, T_MAX, rows, PWIN_C) f32 — this robot's table
    *,
    n_beams: int,
    rows: int,
):
    # NOTE: unlike _kernel, the fleet variant rolls rows in-kernel — per-
    # robot preshifted copies would materialize R x 16 MB of slices, which
    # measured SLOWER than the rolls (295 vs 282 ms at 256 robots).
    load_r = rows + 8
    load_c = PWIN_C + 128
    corr_ref[...] = jnp.zeros_like(corr_ref)
    r8 = pl.program_id(0) % 8
    row0 = meta_ref[r8, 1]
    col0 = meta_ref[r8, 2]
    nv = meta_ref[r8, 3]

    def per_bin(t, _):
        def one_tap(b):
            # same packed format as _kernel ((w << 20) | 10-bit offsets);
            # the fleet prepass runs dedup=False so w == 1 and the weight
            # multiply is skipped (taps are plain adds)
            packed = off_ref[r8, t * n_beams + b]
            oj = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(packed, 12), 22
            )
            oi = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(packed, 22), 22
            )
            sr = row0 + oj
            sc = col0 + oi
            ar = (sr // 8) * 8
            ac = (sc // 128) * 128
            dr = sr - ar
            dc = sc - ac
            block = tex_ref[0, pl.ds(pl.multiple_of(ar, 8), load_r),
                            pl.ds(pl.multiple_of(ac, 128), load_c)]
            # non-negative roll complements (see _kernel)
            block = pltpu.roll(block, (load_r - dr) % load_r, axis=0)
            block = pltpu.roll(block, (load_c - dc) % load_c, axis=1)
            return block[0:rows, 0:PWIN_C]

        # W-wide mask-free main loop + 1-wide dynamic tail (see _kernel)
        W = 8

        def tapw(k, acc):
            b = W * k
            for d in range(W):
                acc = acc + one_tap(b + d)
            return acc

        acc = jax.lax.fori_loop(
            0, nv // W, tapw,
            jnp.zeros((rows, PWIN_C), jnp.float32), unroll=False,
        )
        acc = jax.lax.fori_loop(
            (nv // W) * W, nv, lambda b, a: a + one_tap(b), acc,
            unroll=False,
        )
        corr_ref[0, pl.ds(t, 1)] = acc[None, :, :]
        return 0

    jax.lax.fori_loop(0, meta_ref[r8, 0], per_bin, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("n_beams", "rows", "interpret")
)
def fleet_corr_call(tex_slices, metas, offs, n_beams, rows, interpret=False):
    """Per-robot correlation tables in ONE pallas call, grid over robots.

    tex_slices: (R, SLICE_R, SLICE_C) f32 per-robot active-region slices;
    metas: (R, 4) int32 (t_n, slice-local row0, slice-local col0, nv);
    offs: (R, T_MAX*B) packed offsets (all from a vmapped corr_prepass).
    Returns (R, T_MAX, rows, PWIN_C) f32."""
    r = metas.shape[0]
    r_pad = -(-r // 8) * 8
    metas8 = jnp.zeros((r_pad, 8), jnp.int32)
    metas8 = metas8.at[:r, :4].set(metas)
    # nv must stay >= 1 even for pad robots (loop bound t_n * nv with t_n=0)
    metas8 = metas8.at[:, 3].max(1)
    offs8 = jnp.zeros((r_pad, offs.shape[1]), jnp.int32).at[:r].set(offs)
    if r_pad != r:
        tex_slices = jnp.pad(tex_slices, ((0, r_pad - r), (0, 0), (0, 0)))
    kern = functools.partial(_kernel_fleet, n_beams=n_beams, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(r_pad,),
        in_specs=[
            pl.BlockSpec((8, 8), lambda g: (g // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, offs.shape[1]), lambda g: (g // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, SLICE_R, SLICE_C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T_MAX, rows, PWIN_C), lambda g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, T_MAX, rows, PWIN_C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(metas8, offs8, tex_slices)
    return out[:r]


# --- int8-quantized variant ------------------------------------------------
#
# The tap loop is load-bound: each f32 tap moves (rows, 256) * 4 B. Storing
# psi ratio-quantized to int8 (255 levels between the texture's actual
# [lo, hi] — the same uint8 ratio-quantization contract the reference applies
# to its 3D distances, octomap.cpp:328-332) cuts tap bytes 2.7-4x. The
# quantization step is (hi-lo)/254 — ~0.4% of the psi range per tap, an
# order of magnitude below the corr lattice's own one-cell endpoint rounding
# — and sums of quantized taps reconstruct exactly as
# qstep * acc + nv * qoff (integer accumulation is exact in int32).
#
# Mosaic cannot load int8 at arbitrary sublane offsets (tiling is (32, 128)),
# and pltpu.roll is 32-bit only. The verified spread-kernel pattern applies:
# 4 row-preshifted int8 copies make the window's row origin a multiple of 4
# (copy d holds tex[r + d] at row r, d = sr mod 4), the 32-aligned load adds
# a <= 28-row residual, and a SUBLANE roll of the int32-bitcast view (4 int8
# rows per int32 sublane, columns preserved — CLAUDE.md) fixes it exactly
# (the residual is a multiple of 4). Column origins use the same bitcast
# lane roll as the spread kernel. Building 4 int8 copies also cuts the
# per-step active-region build ~7x vs the f32 kernel's 8 f32 copies.
#
# Row margins: loads are L = rows + 32 int8 rows at a 32-aligned origin, so
# the q texture carries PAD_RQ = 224 row padding (PAD_R + 32) and the copies
# CRQ = 512 rows — see the bound chain in slice_origin_q's docstring.

PAD_RQ = 224  # q-texture row padding: PAD_R + 32 covers the aligned-load over-read
CRQ = 512  # rows per preshifted copy
BASE_RQ = CRQ + 3  # base slice rows the 4 copies are cut from
Q_ROWS = (PWIN_R_NARROW, PWIN_R)  # q variants: narrow 32 / standard 64


def _kernel_q(
    # scalar prefetch (SMEM)
    meta_ref,  # (4 + T_MAX,) int32 — (t_n, row0, col0, nv, nu_0..nu_63)
    off_ref,  # (T_MAX * B,) int32 — packed (w << 20)|(oj & 0x3FF) << 10|(oi & 0x3FF)
    # VMEM
    tex_ref,  # (4, CRQ, SLICE_C) int8 row-preshifted quantized copies
    corr_ref,  # out (T_MAX, rows, PWIN_C) int32
    *,
    n_beams: int,
    rows: int,
):
    load_c = PWIN_C + 128
    L = rows + 32  # 32-aligned load rows (residual sublane offset <= 28)
    L4 = L // 4  # int32-view sublanes
    corr_ref[...] = jnp.zeros_like(corr_ref)
    row0 = meta_ref[1]
    col0 = meta_ref[2]

    def per_bin(t, _):
        def one_tap(b):
            packed = off_ref[t * n_beams + b]
            w = jax.lax.shift_right_logical(packed, 20)
            oj = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(packed, 12), 22
            )
            oi = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(packed, 22), 22
            )
            sr = row0 + oj
            sc = col0 + oi
            d = sr & 3  # preshifted copy: row origin becomes a multiple of 4
            rb = ((sr - d) // 32) * 32
            dr4 = (sr - d - rb) // 4  # residual in int32-view sublanes, 0..7
            ac = (sc // 128) * 128
            dc = sc - ac
            blk = tex_ref[d, pl.ds(pl.multiple_of(rb, 32), L),
                          pl.ds(pl.multiple_of(ac, 128), load_c)]
            w32 = pltpu.bitcast(blk, jnp.int32)  # (L4, load_c), cols preserved
            # pltpu.roll needs NON-NEGATIVE traced amounts (CLAUDE.md):
            # left-rolls are their right-roll complements
            w32 = pltpu.roll(w32, (L4 - dr4) % L4, axis=0)
            w32 = pltpu.roll(w32, (load_c - dc) % load_c, axis=1)
            w8 = pltpu.bitcast(w32, jnp.int8)  # (L, load_c)
            # dedup multiplicity: integer multiply-accumulate stays exact
            return w * w8[0:rows, 0:PWIN_C].astype(jnp.int32)

        # W-wide mask-free main loop + 1-wide dynamic tail (see _kernel)
        W = 8
        nu = meta_ref[4 + t]  # per-bin tap count (deduped; == nv without)

        def tapw(k, acc):
            b = W * k
            for dd in range(W):
                acc = acc + one_tap(b + dd)
            return acc

        acc = jax.lax.fori_loop(
            0, nu // W, tapw,
            jnp.zeros((rows, PWIN_C), jnp.int32), unroll=False,
        )
        acc = jax.lax.fori_loop(
            (nu // W) * W, nu, lambda b, a: a + one_tap(b), acc,
            unroll=False,
        )
        corr_ref[pl.ds(t, 1)] = acc[None, :, :]
        return 0

    jax.lax.fori_loop(0, meta_ref[0], per_bin, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("n_beams", "rows", "interpret")
)
def _corr_call_q(tex4, meta, off, n_beams, rows, interpret=False):
    kern = functools.partial(_kernel_q, n_beams=n_beams, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_MAX, rows, PWIN_C), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(meta, off, tex4)


def map_fits_q(omap) -> bool:
    """Static check for the quantized variant (laxer rows than map_fits:
    the q texture's 224-row padding alone nearly covers BASE_RQ)."""
    return (
        omap.size_y + 2 * PAD_RQ >= BASE_RQ
        and omap.size_x + 2 * PAD_C >= SLICE_C
        and omap.size_y >= PWIN_R
        and omap.size_x >= PWIN_C
    )


def slice_origin_q(tex_q, j0, i0):
    """Aligned origin of the q active-region base slice, clamped inside the
    texture. Bound chain guaranteeing in-copy loads (rb + rows + 32 <= CRQ):
    unclamped row0 <= PAD_RQ + 7 -> sr <= 414 -> rb + L <= 414 + 96 <= 512;
    clamped row0 <= j0 - size_y + BASE_RQ - PAD_RQ with j0 <= size_y - rows
    -> sr <= BASE_RQ - 41 - rows (offsets <= PAD_R - 9 = 183) -> rb + L <=
    BASE_RQ - 9 = CRQ - 6."""
    hp, wp = tex_q.shape
    sj = jnp.clip(j0 & ~7, 0, hp - BASE_RQ)
    si = jnp.clip(i0 & ~127, 0, wp - SLICE_C)
    return sj, si


def quad_slices(tex_q, sj, si):
    """(4, CRQ, SLICE_C) int8 copies where copy d holds tex[r + d] at row r
    — in-kernel row origins become multiples of 4 (one int32-view sublane)."""
    base = jax.lax.dynamic_slice(tex_q, (sj, si), (BASE_RQ, SLICE_C))
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(base, d, CRQ, 0) for d in range(4)]
    )


def build_tex_pad_q(omap, tex_psi, offmap_psi):
    """Quantize the psi texture to int8 and pad with the quantized off-map
    value (planar_scanner.cpp:295-300). Pure jnp — NO device readback (a
    single D2H through the axon tunnel permanently degrades dispatch; the
    scale rides along as a (2,) device array instead of python floats).
    Returns (pad_q int8, qscale (2,) f32 = [qstep, qoff]) with
    sum_b psi == qstep * sum_b q + nv * qoff up to per-tap rounding
    <= qstep/2 (integer accumulation itself is exact)."""
    tex = tex_psi.astype(jnp.float32)
    off = jnp.float32(offmap_psi)
    lo = jnp.minimum(jnp.min(tex), off)
    hi = jnp.maximum(jnp.max(tex), off)
    step = jnp.where(hi > lo, (hi - lo) / 254.0, jnp.float32(1.0))
    q = jnp.clip(jnp.round((tex - lo) / step), 0, 254).astype(jnp.int16) - 127
    q_off = (jnp.clip(jnp.round((off - lo) / step), 0, 254)
             .astype(jnp.int16) - 127)
    pad = jnp.broadcast_to(
        q_off.astype(jnp.int8),
        (omap.size_y + 2 * PAD_RQ, omap.size_x + 2 * PAD_C),
    )
    pad = jax.lax.dynamic_update_slice(
        pad, q.astype(jnp.int8), (PAD_RQ, PAD_C)
    )
    return pad, jnp.stack([step, lo + 127.0 * step])


def corr_values_q(tex_q, qscale, ranges, pre, interpret=False, fold=None):
    """Quantized-texture twin of corr_values: narrow (32) / standard (64)
    row variants (no tight-24 — int8 loads ride 32-row tiles anyway), int32
    accumulation in-kernel, dequantized per particle as
    qstep * acc + nv * qoff (with `fold`, dequantized TABLE-side and fused
    with combine + factor window exactly like corr_values)."""
    n_beams = int(ranges.shape[0])

    def run(rows, j0):
        sj, si = slice_origin_q(tex_q, j0, pre["i0"])
        tex4 = quad_slices(tex_q, sj, si)
        meta = jnp.concatenate([
            jnp.stack(
                [pre["t_n"], j0 + PAD_RQ - sj, pre["i0"] + PAD_C - si,
                 pre["nv"]]
            ).astype(jnp.int32),
            pre["nu"],
        ])
        corr = _corr_call_q(
            tex4, meta, pre["off"], n_beams=n_beams, rows=rows,
            interpret=interpret,
        )
        nv_off = pre["nv"].astype(jnp.float32) * qscale[1]
        if fold is not None:
            s_tbl = corr.astype(jnp.float32) * qscale[0] + nv_off
            return _folded_take(s_tbl, pre, rows, j0, fold)
        acc = jnp.take(corr.reshape(-1), particle_flat(pre, rows, j0))
        return acc.astype(jnp.float32) * qscale[0] + nv_off

    return jax.lax.cond(
        pre["narrow"],
        lambda _: run(PWIN_R_NARROW, pre["j0_narrow"]),
        lambda _: run(PWIN_R, pre["j0"]),
        operand=None,
    )


def map_fits(omap) -> bool:
    """Static check: map large enough for the active-region slice. There is
    NO upper size limit — the kernel reads a fixed slice of the padded
    texture, which lives in HBM at any map size."""
    return (
        omap.size_y + 2 * PAD_R >= SLICE_R + 8
        and omap.size_x + 2 * PAD_C >= SLICE_C
        and omap.size_y >= PWIN_R
        and omap.size_x >= PWIN_C
    )


def slice_origin(tex_pad, j0, i0):
    """Aligned origin of the active-region slice in padded-texture coords,
    clamped inside the texture (base slice is SLICE_R + 8 rows so the 8
    row-preshifted copies can be cut from it). Returns (start_j, start_i)."""
    hp, wp = tex_pad.shape
    sj = jnp.clip(j0 & ~7, 0, hp - (SLICE_R + 8))
    si = jnp.clip(i0 & ~127, 0, wp - SLICE_C)
    return sj, si


# HBM budget for the 8 full-texture preshifted copies (preshift_full).
# 1024^2 maps bake ~75 MB, 2048^2 ~210 MB; a 4096^2 map would take ~680 MB
# and 8192^2 ~2.7 GB — past this cap bake_corr_texture skips the bake and
# corr_values falls back to the per-call preshifted_slices build
# (~0.3 ms/step slower, no HBM blowup).
PRESHIFT_FULL_MAX_BYTES = 256 << 20


def preshift_fits(tex_pad) -> bool:
    hp, wp = tex_pad.shape
    h8 = -(-hp // 8) * 8
    w128 = -(-wp // 128) * 128
    return 8 * h8 * w128 * 4 <= PRESHIFT_FULL_MAX_BYTES


def preshift_full(tex_pad, offmap_psi):
    """(8, H8, W128) full-texture row-preshifted copies — the one-shot bake
    twin of `preshifted_slices`: copy d holds tex_pad[r + d] at row r.
    Lives in HBM (8x the padded map, ~75 MB at 1024^2); the kernel DMAs its
    (8, SLICE_R, SLICE_C) active region with a dynamic origin per call
    (_kernel_pre), so no per-step HBM->HBM slice build remains.

    Rows are padded up to a multiple of 8 (+8 shift margin) and cols to a
    multiple of 128 with the off-map psi value: `slice_origin_pre`'s clamp
    bounds (H8 - SLICE_R, W128 - SLICE_C) are then themselves 8/128-aligned
    — the in-kernel DMA slices an (8,128)-tiled HBM memref, and Mosaic
    requires PROVABLY aligned offsets (pl.multiple_of on an unaligned clamp
    would silently read the wrong rows). The pad cells are never read
    semantically: particle windows and |offsets| < PAD_R/PAD_C keep reads
    inside the true texture."""
    hp, wp = tex_pad.shape
    h8 = -(-hp // 8) * 8
    w128 = -(-wp // 128) * 128
    tex8 = jnp.full((h8 + 8, w128), offmap_psi, tex_pad.dtype)
    tex8 = jax.lax.dynamic_update_slice(tex8, tex_pad, (0, 0))
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(tex8, d, h8, 0) for d in range(8)]
    )


def slice_origin_pre(tex_pre, j0, i0):
    """Active-region origin for the pre-DMA path, computed against the
    ALIGNED full-preshift shape so the clamped origin stays 8/128-aligned
    (see preshift_full). The bounds sit >= the classic slice_origin's, so
    the windows the kernel reads keep the same in-slice fit margins."""
    _, h8, w128 = tex_pre.shape
    sj = jnp.clip(j0 & ~7, 0, h8 - SLICE_R)
    si = jnp.clip(i0 & ~127, 0, w128 - SLICE_C)
    return sj, si


def preshifted_slices(tex_pad, sj, si):
    """(8, SLICE_R, SLICE_C) copies where copy d holds tex[r + d] at row r
    — arbitrary row origins become ALIGNED loads from copy (sr mod 8), so
    the kernel needs no sublane roll and no row alignment margin."""
    base = jax.lax.dynamic_slice(tex_pad, (sj, si), (SLICE_R + 8, SLICE_C))
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(base, d, SLICE_R, 0) for d in range(8)]
    )


def corr_prepass(omap, spose, ranges, angles, valid, dedup=False):
    """Lattice geometry: particle cells & window, compacted yaw bins and
    beams, packed stencil offsets, dynamic fits flags. All fused XLA
    vector work; nothing (M, B)-sized.

    With dedup=True (static), per-bin duplicate stencil offsets are merged
    into one weighted tap: at range r the angular beam pitch maps to
    r * pitch / res cells, so every beam under ~res/pitch meters rounds to
    an already-seen lattice offset (2.85x fewer taps on the 720-beam bench
    scan). Taps are value-identical (the psi sum is reassociated only).
    The fleet path keeps dedup=False: its prepass is vmapped and batched
    sorts lower poorly on TPU (CLAUDE.md)."""
    res = omap.resolution
    ij = omap.world_to_map(spose[:, :2])
    ci = jnp.clip(ij[..., 0], 0, omap.size_x - 1)
    cj = jnp.clip(ij[..., 1], 0, omap.size_y - 1)
    i0 = jnp.min(ci)
    j0 = jnp.min(cj)
    row_span = jnp.max(cj) - j0
    span_ok = (jnp.max(ci) - i0 < PWIN_C) & (row_span < PWIN_R)
    narrow_ok = span_ok & (row_span < PWIN_R_NARROW) & (
        omap.size_y >= PWIN_R_NARROW
    )
    tight_ok = span_ok & (row_span < PWIN_R_TIGHT) & (
        omap.size_y >= PWIN_R_TIGHT
    )
    # each variant clips from the RAW window origin — deriving the narrow/
    # tight origins from the 64-row-clipped one would pin top-edge windows
    # 40+ rows below the particles (caught by test_corr_at_map_edges)
    j0_raw = j0
    i0 = jnp.clip(i0, 0, max(omap.size_x - PWIN_C, 0))
    j0 = jnp.clip(j0_raw, 0, max(omap.size_y - PWIN_R, 0))
    j0_n = jnp.clip(j0_raw, 0, max(omap.size_y - PWIN_R_NARROW, 0))
    j0_t = jnp.clip(j0_raw, 0, max(omap.size_y - PWIN_R_TIGHT, 0))

    # max stencil offset magnitude is bounded by the longest valid range
    max_cells = jnp.max(jnp.where(valid, ranges, 0.0)) / res
    range_ok = (max_cells < (PAD_C - 129)) & (max_cells < (PAD_R - 9))

    dtheta = 1.0 / jnp.clip(max_cells, MIN_RANGE_CELLS, MAX_RANGE_CELLS)
    t_m = jnp.round(spose[:, 2] / dtheta).astype(jnp.int32)
    t_min = jnp.min(t_m)
    t_count = jnp.max(t_m) - t_min + 1
    yaw_ok = t_count <= T_MAX

    # yaw-bin occupancy -> compacted list of occupied bins (empty Gaussian
    # tails and multimodal gaps are never iterated in-kernel). Stable
    # occupied-first permutations come from cumsum + tiny scatters, not
    # argsort — vmapped argsorts (the fleet path) lower poorly on TPU.
    t_rel = jnp.clip(t_m - t_min, 0, T_MAX - 1)
    # bin occupancy + per-particle compacted slot as fused one-hot
    # reductions over the tiny bin axis — an M-sized scatter + an M-sized
    # table gather here cost ~50 ms across a 256-robot fleet
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

    # beam compaction: valid beams first (beam order is irrelevant to the sum)
    nv = jnp.sum(valid).astype(jnp.int32)
    nb = valid.shape[0]
    vi = valid.astype(jnp.int32)
    b_dest = jnp.where(
        valid, jnp.cumsum(vi) - 1, nv + jnp.cumsum(1 - vi) - 1
    ).astype(jnp.int32)
    b_order = jnp.zeros((nb,), jnp.int32).at[b_dest].set(
        jnp.arange(nb, dtype=jnp.int32)
    )
    ranges_c = ranges.astype(jnp.float32)[b_order]
    angles_c = angles.astype(jnp.float32)[b_order]
    # zero the compacted TAIL (invalid beams): defensive — the kernels stop
    # at nv, but sane tail offsets cost nothing and keep any future static-
    # bound variant from reading NaN-derived garbage origins
    tail_ok = jnp.arange(nb, dtype=jnp.int32) < nv
    ranges_c = jnp.where(tail_ok, ranges_c, 0.0)
    angles_c = jnp.where(tail_ok, angles_c, 0.0)

    # packed integer offsets for every (compacted bin, compacted beam):
    # one vectorized (T_MAX, B) trig pass replaces per-tap scalar trig.
    # Packing: (weight << 20) | ((oj & 0x3FF) << 10) | (oi & 0x3FF) —
    # 10-bit signed offsets (|o| <= 183 < 512 by range_ok) + a 12-bit tap
    # multiplicity (<= B <= 4095).
    theta = (
        (t_min + t_order[:, None]).astype(jnp.float32) * dtheta
        + angles_c[None, :]
    )
    inv_res = jnp.float32(1.0 / res)
    oi = jnp.round(ranges_c[None, :] * jnp.cos(theta) * inv_res).astype(jnp.int32)
    oj = jnp.round(ranges_c[None, :] * jnp.sin(theta) * inv_res).astype(jnp.int32)
    oo = jnp.left_shift(oj & 0x3FF, 10) | (oi & 0x3FF)

    if not dedup:
        off = jnp.left_shift(jnp.int32(1), 20) | oo
        nu = jnp.full((T_MAX,), nv, jnp.int32)
    else:
        # merge per-bin duplicate offsets into one weighted tap: sort each
        # bin's offsets, run-length-encode with cummax/cummin scans, then a
        # second stable sort compacts unique taps to the front (gather-free
        # — M-sized gathers are the one thing TPUs do slowly)
        sent = jnp.int32(0x1FFFFF)  # > any 20-bit payload; sorts last
        live = tail_ok[None, :]  # compacted-beam slots < nv
        x = jnp.sort(jnp.where(live, oo, sent), axis=1)
        bsz = x.shape[1]
        idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        real = x != sent
        uniq = (
            jnp.concatenate(
                [jnp.ones_like(real[:, :1]),
                 x[:, 1:] != x[:, :-1]], axis=1,
            )
            & real
        )
        # first/last index of each equal run, via forward/reverse scans
        first = jax.lax.cummax(jnp.where(uniq, idx, -1), axis=1)
        bnext = jnp.concatenate(
            [x[:, :-1] != x[:, 1:], jnp.ones_like(real[:, :1])], axis=1
        )
        last = jax.lax.cummin(
            jnp.where(bnext, idx, bsz), axis=1, reverse=True
        )
        w = jnp.where(uniq, last - first + 1, 0)
        # sentinel slots pack to 0 (the raw sentinel overlaps the weight
        # field; a defensively-read tail slot must contribute nothing)
        packed = jnp.where(real, jnp.left_shift(w, 20) | x, 0)
        key2 = jnp.where(uniq, 0, 1).astype(jnp.int32)
        _, off2 = jax.lax.sort((key2, packed), dimension=1, num_keys=1,
                               is_stable=True)
        off = off2
        nu = jnp.sum(uniq, axis=1).astype(jnp.int32)
        # per-bin tap counts ride bin-compacted order (bins t >= t_n were
        # never populated; their nu is 0 by construction since all their
        # slots hold the sentinel)... but oo was computed for ALL T_MAX
        # compacted bins (t_order covers the full range), so zero the tail
        # explicitly to keep the kernel's per-bin loop bounds honest.
        nu = jnp.where(
            jnp.arange(T_MAX, dtype=jnp.int32) < t_n, nu, 0
        )

    return {
        "ci": ci, "cj": cj, "i0": i0, "j0": j0, "j0_narrow": j0_n,
        "j0_tight": j0_t,
        "t_slot": t_slot, "t_n": t_n, "nv": nv, "nu": nu,
        "off": off.reshape(-1),
        "fits": span_ok & yaw_ok & range_ok,
        "narrow": narrow_ok & yaw_ok & range_ok,
        "tight": tight_ok & yaw_ok & range_ok,
    }


def build_tex_pad(omap, tex_psi, offmap_psi):
    """Pad the per-cell psi texture: the margin is painted with the off-map
    psi value (psi(max_distance), planar_scanner.cpp:295-300). One-shot per
    (map, params) when baked via sensors.planar.bake_corr_texture."""
    tex_pad = jnp.zeros(
        (omap.size_y + 2 * PAD_R, omap.size_x + 2 * PAD_C), jnp.float32
    )
    tex_pad = tex_pad + offmap_psi.astype(jnp.float32)
    return jax.lax.dynamic_update_slice(
        tex_pad, tex_psi.astype(jnp.float32), (PAD_R, PAD_C)
    )


def particle_flat(pre, rows, j0):
    """Flat index of each particle's lattice cell in a (T_MAX, rows,
    PWIN_C) correlation table."""
    dj = jnp.clip(pre["cj"] - j0, 0, rows - 1)
    di = jnp.clip(pre["ci"] - pre["i0"], 0, PWIN_C - 1)
    return (pre["t_slot"] * rows + dj) * PWIN_C + di


def _folded_take(corr_s, pre, rows, j0, fold):
    """Fused read: apply the model's combine and the per-cell recalcWeight
    factor TABLE-side (both elementwise over the tiny (T_MAX, rows, PWIN_C)
    table), then ONE per-particle take returns p*factor directly — removing
    the separate windowed factor read (~0.4 ms/step at 50k, PERF.md). The
    table-side combine is exact: take picks a single element, so
    take(combine(tbl)*fwin) == combine(take(tbl)) * fwin[cell] bit-for-bit.

    Particles outside the map need the off-map factor instead of the
    clipped border cell's (recalcWeight, planar_scanner.cpp:646-650), so
    the fused arm only runs when every particle is on-map; otherwise the
    classic two-read path runs (a real branch — this cond is never vmapped;
    the fleet layer keeps its own batched factor path)."""
    flat_idx = particle_flat(pre, rows, j0)

    def folded(_):
        c2 = fold["combine"](corr_s) * fold["window"](rows, j0, pre["i0"])[None]
        return jnp.take(c2.reshape(-1), flat_idx)

    def generic(_):
        p = fold["combine"](jnp.take(corr_s.reshape(-1), flat_idx))
        return p * fold["fallback_mf"]()

    return jax.lax.cond(fold["all_valid"], folded, generic, operand=None)


def _corr_table(tex_pad, pre, n_beams, rows, j0, interpret, tex_pre):
    """Run the correlation kernel for one window variant: returns the raw
    (T_MAX * rows, PWIN_C) psi-sum table (shared by `corr_values` and
    `corr_cells`)."""
    if tex_pre is not None:
        sj, si = slice_origin_pre(tex_pre, j0, pre["i0"])
    else:
        sj, si = slice_origin(tex_pad, j0, pre["i0"])
    meta = jnp.concatenate([
        jnp.stack(
            [pre["t_n"], j0 + PAD_R - sj, pre["i0"] + PAD_C - si,
             pre["nv"]]
        ).astype(jnp.int32),
        pre["nu"],
    ])
    if tex_pre is not None:
        org = jnp.stack([sj, si]).astype(jnp.int32)
        return _corr_call_pre(
            tex_pre, meta, org, pre["off"], n_beams=n_beams,
            rows=rows, interpret=interpret,
        )
    tex_s = preshifted_slices(tex_pad, sj, si)
    return _corr_call(
        tex_s, meta, pre["off"], n_beams=n_beams, rows=rows,
        interpret=interpret,
    )


def _window_cond_tree(pre, run):
    """Dispatch run(rows, j0) over the tight/narrow/standard window
    variants (one shape out — run must return identically-shaped pytrees
    for every variant)."""
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


def corr_values(omap, tex_pad, spose, ranges, angles, valid, pre,
                interpret=False, fold=None, tex_pre=None):
    """Build the correlation table and gather each particle's value.

    tex_pad: padded psi texture from `build_tex_pad`. Returns (M,) f32 of
    sum_b psi at each particle's lattice pose — or, with `fold`, the final
    per-particle p * recalcWeight-factor in one fused take (see
    `_folded_take`). fold keys: combine (elementwise table map s -> p),
    window ((rows, j0, i0) -> (rows, PWIN_C) f32 factor window in map
    coords), all_valid (scalar bool), fallback_mf (() -> (M,) factors).

    tex_pre ((8, Hp, Wp), from `preshift_full`, baked once per map):
    the kernel DMAs the active region HBM->VMEM in-kernel instead of the
    per-call HBM->HBM preshifted-slice build (~0.3 ms/step saved)."""
    n_beams = int(ranges.shape[0])

    def run(rows, j0):
        corr = _corr_table(tex_pad, pre, n_beams, rows, j0, interpret,
                           tex_pre)
        if fold is not None:
            return _folded_take(corr, pre, rows, j0, fold)
        return jnp.take(corr.reshape(-1), particle_flat(pre, rows, j0))

    return _window_cond_tree(pre, run)


# Flat capacity of the cell-contract table (the standard window variant's
# size; narrow/tight tables are zero-padded up to it so every lax.cond arm
# returns one static shape).
T_FLAT_CELLS = T_MAX * PWIN_R * PWIN_C


def corr_cells(omap, tex_pad, spose, ranges, angles, valid, pre,
               interpret=False, fold=None, tex_pre=None):
    """Cell-space variant of `corr_values` + fold: returns
    (tbl (T_FLAT_CELLS,) f32, key (M,) int32, ok bool) — the folded
    per-cell p * recalcWeight-factor table and each particle's flat lattice
    cell key, WITHOUT the per-particle take (the single largest per-step
    cost at 50k particles, PERF.md "Floor accounting"). Feed to
    pf.filter.sensor_resample_cells, which samples cells by mass and
    members uniformly within a cell (distribution-identical when active
    weights are uniform — particles sharing a lattice cell see identical
    likelihood and factor, so they are exchangeable).

    ok requires fold["all_valid"]: off-map particles take per-particle
    fallback factors (recalcWeight, planar_scanner.cpp:646-650), which are
    not cell-constant — such steps use the pick-level path instead.
    `fold` is mandatory here (the contract folds factors table-side)."""
    n_beams = int(ranges.shape[0])

    def run(rows, j0):
        corr = _corr_table(tex_pad, pre, n_beams, rows, j0, interpret,
                           tex_pre)
        c2 = fold["combine"](corr) * fold["window"](rows, j0, pre["i0"])[None]
        flat = c2.reshape(-1)
        tbl = jnp.zeros((T_FLAT_CELLS,), jnp.float32)
        tbl = jax.lax.dynamic_update_slice(tbl, flat, (0,))
        return tbl, particle_flat(pre, rows, j0)

    tbl, key = _window_cond_tree(pre, run)
    return tbl, key, pre["fits"] & fold["all_valid"]
