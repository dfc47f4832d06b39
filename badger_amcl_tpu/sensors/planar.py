"""Planar (2D laser) measurement models.

All four models of the reference's `PlanarScanner`
(src/amcl/sensors/planar_scanner.cpp) as batched `(N, B)` array programs:

- BEAM                      <- calcBeamModel (planar_scanner.cpp:168-234)
- LIKELIHOOD_FIELD          <- calcLikelihoodFieldModel (:236-323)
- LIKELIHOOD_FIELD_PROB     <- calcLikelihoodFieldModelProb incl. beam
                               skipping (:325-533)
- LIKELIHOOD_FIELD_GOMPERTZ <- calcLikelihoodFieldModelGompertz (:540-640)

plus the off-map / non-free-space weight correction
(recalcWeight, :642-682) and the scanner-mount composition
(coordAdd, :693-701).

The reference's doubly nested particle x beam loops (hot loop #2,
SURVEY.md §3.1) become broadcasted trig + one batched gather from the
distance-field texture; the beam model calls the vectorized Bresenham bundle
in sensors/raycast.py. Beam skipping's per-particle temp buffers
(planar_scanner.cpp:367-395) collapse into reductions over the (N, B) pz
matrix that is materialized anyway.

Beam decimation (step subsampling to max_beams) is *host-side scan prep* in
this design (node/scan_prep.py) so the kernels see static beam counts.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from badger_amcl_tpu.maps.occupancy_2d import CellState, OccupancyMap2D
from badger_amcl_tpu.sensors import raycast
from badger_amcl_tpu.utils.angles import normalize_angle


class PlanarScanParams(struct.PyTreeNode):
    """Measurement-model parameters (setModel* setters,
    planar_scanner.cpp:55-121). All leaves are dynamic so live reconfigure
    does not recompile; the model *type* is a static argument to
    `planar_likelihood`."""

    z_hit: jnp.ndarray = struct.field(default=0.95)
    z_short: jnp.ndarray = struct.field(default=0.1)
    z_max: jnp.ndarray = struct.field(default=0.05)
    z_rand: jnp.ndarray = struct.field(default=0.05)
    sigma_hit: jnp.ndarray = struct.field(default=0.2)
    lambda_short: jnp.ndarray = struct.field(default=0.1)
    # Gompertz squashing (setModelLikelihoodFieldGompertz, :94-113)
    gompertz_a: jnp.ndarray = struct.field(default=1.0)
    gompertz_b: jnp.ndarray = struct.field(default=1.0)
    gompertz_c: jnp.ndarray = struct.field(default=1.0)
    input_shift: jnp.ndarray = struct.field(default=0.0)
    input_scale: jnp.ndarray = struct.field(default=1.0)
    output_shift: jnp.ndarray = struct.field(default=0.0)
    # map factors (setMapFactors, :115-121)
    off_map_factor: jnp.ndarray = struct.field(default=1.0)
    non_free_space_factor: jnp.ndarray = struct.field(default=1.0)
    non_free_space_radius: jnp.ndarray = struct.field(default=0.0)
    # beam skipping (setModelLikelihoodFieldProb, :77-92)
    beam_skip_distance: jnp.ndarray = struct.field(default=0.5)
    beam_skip_threshold: jnp.ndarray = struct.field(default=0.3)
    beam_skip_error_threshold: jnp.ndarray = struct.field(default=0.9)
    # scanner mount pose in the base frame (setPlanarScannerPose, :535-538)
    scanner_pose: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((3,), jnp.float32)
    )


class PlanarScan(struct.PyTreeNode):
    """Decimated scan (PlanarData, planar_scanner.h): ranges/angles (B,) in
    the base frame, range_max scalar. Padding entries use range == range_max
    (ignored by every LF-family model; the beam model sees them as max-range
    readings, which is exactly what the node's range clamping produces)."""

    ranges: jnp.ndarray
    angles: jnp.ndarray
    range_max: jnp.ndarray


def coord_add(a, b):
    """Compose local pose a onto global pose(s) b (coordAdd,
    planar_scanner.cpp:693-701). b: (..., 3)."""
    bx, by, bth = b[..., 0], b[..., 1], b[..., 2]
    c, s = jnp.cos(bth), jnp.sin(bth)
    x = bx + a[0] * c - a[1] * s
    y = by + a[0] * s + a[1] * c
    th = normalize_angle(bth + a[2])
    return jnp.stack([x, y, th], axis=-1)


def apply_gompertz(params: PlanarScanParams, p):
    """applyGompertz (planar_scanner.cpp:540-550)."""
    p = p * params.input_scale + params.input_shift
    p = params.gompertz_a * jnp.exp(-params.gompertz_b * jnp.exp(-params.gompertz_c * p))
    return p + params.output_shift


def _beam_endpoints_dist(omap, scan, spose, backend="xla"):
    """Common LF-family front half: beam endpoints -> map cells -> distance
    gather. Returns (z (N, B) meters, valid_beam (N->B,) mask).

    backend "pallas" routes the gather through the windowed one-hot MXU
    kernel (ops/lf_kernel.py) with an automatic fallback to the XLA gather
    when the particle cloud is too spread for the window; "xla" is the
    exact float32 reference path."""
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    if backend in ("pallas", "pallas_interpret"):
        from badger_amcl_tpu.ops import lf_kernel

        zt = lf_kernel.lf_distances_t(
            omap, spose, scan.ranges, scan.angles,
            interpret=(backend == "pallas_interpret"),
        )
        return zt, valid
    # XLA path computed directly in (B, N) orientation so no backend needs a
    # transpose downstream
    ranges = scan.ranges[:, None]
    angles = scan.angles[:, None]
    th = spose[None, :, 2] + angles
    hx = spose[None, :, 0] + ranges * jnp.cos(th)
    hy = spose[None, :, 1] + ranges * jnp.sin(th)
    ij = omap.world_to_map(jnp.stack([hx, hy], axis=-1))
    zt = omap.distance_at(ij)  # off-map -> max_distance (planar_scanner.cpp:295-300)
    return zt, valid


def _corr_psi_fn(model: str, params: PlanarScanParams, range_max):
    """Per-cell beam likelihood psi(distance) for each LF-family model —
    the texture the stencil-correlation kernel sums over beams."""
    denom = 2.0 * params.sigma_hit * params.sigma_hit
    if model == "likelihood_field":
        def psi(d):
            pz = params.z_hit * jnp.exp(-(d * d) / denom) + params.z_rand / range_max
            return pz * pz * pz
    elif model == "likelihood_field_prob":
        def psi(d):
            pz = params.z_hit * jnp.exp(-(d * d) / denom) + params.z_rand / range_max
            return jnp.log(pz)
    elif model == "likelihood_field_gompertz":
        def psi(d):
            return params.z_hit * jnp.exp(-(d * d) / denom) + params.z_rand
    else:  # pragma: no cover
        raise ValueError(f"no corr psi for model {model!r}")
    return psi


CORR_MODELS = ("likelihood_field", "likelihood_field_prob",
               "likelihood_field_gompertz")


def psi_fingerprint(model: str, params: PlanarScanParams, range_max):
    """Everything the baked psi texture embeds: a texture is only valid for
    a scan/params combination whose fingerprint matches EXACTLY (a stale
    range_max or reconfigured mixture must force a re-bake, not silently
    evaluate with baked constants). Returns None when range_max is traced
    (can't fingerprint inside jit — callers then take the fresh-bake path)."""
    try:
        return (model, float(range_max), float(params.z_hit),
                float(params.z_rand), float(params.sigma_hit))
    except Exception:  # traced under jit: no concrete fingerprint
        return None


def corr_combine(model: str, params: PlanarScanParams, s, n_valid):
    """Map the corr kernel's per-particle psi sum to the model's p
    (the lambda each model hands _corr_dispatch, shared with the fleet
    batched path)."""
    if model == "likelihood_field":
        return 1.0 + s
    if model == "likelihood_field_prob":
        return jnp.exp(s)
    if model == "likelihood_field_gompertz":
        p = apply_gompertz(params, s / jnp.maximum(n_valid, 1))
        return jnp.where(n_valid > 0, p, 1.0)
    raise ValueError(f"no corr combine for model {model!r}")  # pragma: no cover


def bake_corr_texture(omap: OccupancyMap2D, params: PlanarScanParams,
                      range_max: float, model: str) -> OccupancyMap2D:
    """Pre-bake the padded psi texture for the stencil-correlation kernel —
    one-shot per (map, sensor params), exactly like the reference's one-shot
    distance-LUT bake (occupancy_map.cpp:138-160). Saves ~1 ms/step of
    padding + transcendental work at 1024². The node layer re-bakes on map
    receipt and reconfigure; callers changing params manually must re-bake
    (a stale texture silently reflects the old params)."""
    import dataclasses

    from badger_amcl_tpu.ops import corr_kernel

    if (model not in CORR_MODELS or omap.distances is None
            or not corr_kernel.map_fits(omap)):
        return dataclasses.replace(omap, corr_psi_pad=None, corr_psi_key=None,
                                   corr_psi_pre=None,
                                   corr_psi_pad_q=None, corr_psi_q=None)
    key = psi_fingerprint(model, params, range_max)
    if key is None:  # traced params can't be fingerprinted — don't bake
        return dataclasses.replace(omap, corr_psi_pad=None, corr_psi_key=None,
                                   corr_psi_pre=None,
                                   corr_psi_pad_q=None, corr_psi_q=None)
    psi = _corr_psi_fn(model, params, jnp.float32(range_max))
    tex_psi = psi(omap.distances)
    offmap_psi = psi(jnp.float32(omap.max_distance_to_object))
    pad = corr_kernel.build_tex_pad(omap, tex_psi, offmap_psi)
    # int8 ratio-quantized twin (the 2D analogue of the reference's uint8
    # 3D distance quantization, octomap.cpp:328-332): 8x less VMEM per
    # kernel call, opt-in via the pallas_corr_q backends (see
    # _corr_dispatch for the measured tradeoff). The prob model stays
    # f32-only: its psi is log pz and exp(sum) amplifies correlated
    # quantization rounding.
    pad_q, qscale = None, None
    if model != "likelihood_field_prob" and corr_kernel.map_fits_q(omap):
        pad_q, qscale = corr_kernel.build_tex_pad_q(omap, tex_psi, offmap_psi)
    # full-texture preshifted copies: the corr kernel DMAs its active
    # region from these in-kernel (dynamic origin), removing the per-call
    # HBM->HBM slice build (~0.3 ms/step). 8x the padded map in HBM, so
    # gated on PRESHIFT_FULL_MAX_BYTES (a 4096^2 map would bake ~680 MB);
    # past the cap tex_pre stays None and corr_values uses the per-call
    # preshifted_slices build.
    pre = None
    if corr_kernel.preshift_fits(pad):
        pre = corr_kernel.preshift_full(pad, offmap_psi)
    return dataclasses.replace(omap, corr_psi_pad=pad, corr_psi_key=key,
                               corr_psi_pre=pre,
                               corr_psi_pad_q=pad_q, corr_psi_q=qscale)


def _no_cells(m):
    """Empty cell-contract triple (tbl, key, ok=False) for paths where the
    cell-space resampling contract cannot run (envelope exceeded, off-map
    particles, unsupported model/backend) — the caller's pick-level arm
    handles those steps."""
    from badger_amcl_tpu.ops import corr_kernel

    return (jnp.zeros((corr_kernel.T_FLAT_CELLS,), jnp.float32),
            jnp.zeros((m,), jnp.int32), jnp.array(False))


def _corr_dispatch(omap, scan, spose, model, params, combine_fn,
                   fallback_fn, interpret, quantized=False,
                   fold_poses=None, want_cells=False):
    """Shared stencil-correlation dispatch for the LF-family models:
    the psi texture maps distance to per-cell beam likelihood, combine_fn
    turns (sum_psi (M,), valid count) into p (M,); falls back to
    `fallback_fn()` when the cloud/yaw/range exceeds the lattice kernel's
    envelope (ops/corr_kernel.py). A texture pre-baked for this model
    (bake_corr_texture) skips the per-step pad + psi build.

    fold_poses (robot poses, (M, 3)): when given, the recalcWeight factor
    (map_factors) is FOLDED into the kernel's table read — one fused take
    returns p * factor per particle (ops/corr_kernel._folded_take). The
    caller must then feed the result to sensor_update with map_factor=None
    (exactly equivalent: see pf.filter.sensor_update) and make fallback_fn
    fold the factors itself."""
    import jax

    from badger_amcl_tpu.ops import corr_kernel

    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    if want_cells:
        # cell-space contract (corr_kernel.corr_cells): requires the fold
        # machinery and the f32 kernel; callers guarantee both statically
        assert fold_poses is not None and not quantized
        if not corr_kernel.map_fits(omap):
            return _no_cells(spose.shape[0])
    elif not corr_kernel.map_fits(omap):
        return fallback_fn()
    fold = None
    if fold_poses is not None:
        factor_tex = _factor_texture(omap, params)
        ij_f = omap.world_to_map(fold_poses[:, :2])
        nv_beams = jnp.sum(valid)
        fold = {
            "combine": lambda s: combine_fn(s, nv_beams),
            "window": lambda rows, j0, i0: jax.lax.dynamic_slice(
                factor_tex, (j0, i0), (rows, corr_kernel.PWIN_C)),
            "all_valid": jnp.all(omap.is_valid(ij_f)),
            "fallback_mf": lambda: map_factors(omap, params, fold_poses),
        }
    # dedup merges per-bin duplicate lattice offsets into weighted taps
    # (2.85x fewer on the 720-beam bench scan; value-identical). Duplicates
    # only exist where the angular beam pitch at range rounds inside one
    # cell, so the win scales with beam density — and the prepass sort is
    # a FIXED cost that dominated the 180-beam reference-scale config
    # (3.8 -> 5.7 ms measured). Gate on beam count: >= 360 beams.
    dedup = int(scan.ranges.shape[0]) >= 360
    pre = corr_kernel.corr_prepass(omap, spose, scan.ranges, scan.angles,
                                   valid, dedup=dedup)

    if want_cells:
        want = psi_fingerprint(model, params, scan.range_max)
        baked = (omap.corr_psi_pad is not None and want is not None
                 and omap.corr_psi_key == want)
        tex_pre = None
        if baked:
            tex_pad = omap.corr_psi_pad
            tex_pre = omap.corr_psi_pre
        else:
            psi_fn = _corr_psi_fn(model, params, scan.range_max)
            tex_pad = corr_kernel.build_tex_pad(
                omap, psi_fn(omap.distances),
                psi_fn(jnp.float32(omap.max_distance_to_object)),
            )

        def fast_cells(_):
            return corr_kernel.corr_cells(
                omap, tex_pad, spose, scan.ranges, scan.angles, valid, pre,
                interpret=interpret, fold=fold, tex_pre=tex_pre,
            )

        def slow_cells(_):
            return _no_cells(spose.shape[0])

        return jax.lax.cond(pre["fits"], fast_cells, slow_cells,
                            operand=None)

    def fast(_):
        want = psi_fingerprint(model, params, scan.range_max)
        baked = (omap.corr_psi_pad is not None and want is not None
                 and omap.corr_psi_key == want)
        if quantized and baked and omap.corr_psi_pad_q is not None:
            # int8-quantized kernel (opt-in via the *_q backends): 2.7-4x
            # fewer tap bytes but measured ~6% SLOWER than the f32 kernel
            # at the flagship shape (the tap loop is issue-bound and the q
            # arm pays an extra sublane roll + bitcasts per tap), so the
            # default path stays f32; q trades that for 8x less VMEM per
            # call (2 MB vs 16 MB of preshifted copies).
            s = corr_kernel.corr_values_q(
                omap.corr_psi_pad_q, omap.corr_psi_q, scan.ranges, pre,
                interpret=interpret, fold=fold,
            )
            return s if fold is not None else combine_fn(s, jnp.sum(valid))
        tex_pre = None
        if baked:
            tex_pad = omap.corr_psi_pad
            tex_pre = omap.corr_psi_pre
        else:
            psi_fn = _corr_psi_fn(model, params, scan.range_max)
            tex_pad = corr_kernel.build_tex_pad(
                omap, psi_fn(omap.distances),
                psi_fn(jnp.float32(omap.max_distance_to_object)),
            )
        s = corr_kernel.corr_values(
            omap, tex_pad, spose, scan.ranges, scan.angles, valid, pre,
            interpret=interpret, fold=fold, tex_pre=tex_pre,
        )
        return s if fold is not None else combine_fn(s, jnp.sum(valid))

    def slow(_):
        return fallback_fn()

    return jax.lax.cond(pre["fits"], fast, slow, operand=None)


def _spread_dispatch(omap, scan, spose, term_fn, finalize_fn, fallback_fn,
                     interpret):
    """Yaw-binned sorted-tile windowed path for spread clouds (global
    localization): term_fn maps elementwise beam distances -> per-beam
    likelihood terms, which the kernel tiers + the bounded escape arm sum
    per particle (beam reductions are order-invariant; the sum is
    un-permuted before finalize_fn maps it to p). Falls back only when the
    escape capacity overflows (deeply map-wide clouds) or the texture
    doesn't fit VMEM (ops/spread_kernel.py)."""
    import jax

    from badger_amcl_tpu.ops import spread_kernel

    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    if omap.distances is None or not spread_kernel.tex_fits(omap):
        return fallback_fn()
    # small clouds: the exact per-element gather beats the kernel — a
    # sparse spread cloud tiers mostly into the CAP_PAIRS_MAX escape arm
    # (measured 19 ms for a 1000 x 180 KLD-sweep config whose exact
    # fallback costs 1.4 ms; the tiled design needs enough particles per
    # (yaw bin, block) to form dense tiles).
    m = int(spose.shape[0])
    b = int(scan.ranges.shape[0])
    if m < 8192 and m * b < 4_000_000:
        return fallback_fn()
    pre = spread_kernel.spread_prepass(
        omap, spose, scan.ranges, scan.angles, valid
    )

    def fast(_):
        s = spread_kernel.spread_term_sums(
            omap, spose, scan.ranges, scan.angles, valid, pre, term_fn,
            interpret=interpret,
        )
        return finalize_fn(spread_kernel.unsort(s, pre))

    def slow(_):
        return fallback_fn()

    return jax.lax.cond(pre["fits"], fast, slow, operand=None)


def _lf_combine(params, scan, zt, valid):
    """LF mixture + p = 1 + sum pz^3 over valid beams, zt in (B, M)."""
    pz3 = _lf_term(params, scan)(zt)
    return 1.0 + jnp.sum(jnp.where(valid[:, None], pz3, 0.0), axis=0)


def _lf_term(params, scan):
    """Elementwise LF beam term pz^3 (the spread path's term_fn)."""
    def term(z):
        denom = 2.0 * params.sigma_hit * params.sigma_hit
        pz = params.z_hit * jnp.exp(-(z * z) / denom) \
            + params.z_rand / scan.range_max
        return pz * pz * pz

    return term


def _fold_mf(omap, params, fold_poses):
    """Fallback-arm factor fold: when the corr fast path folds recalcWeight
    factors into its table read (fold_poses given), every fallback arm must
    return p * factor too — one shape for the whole lax.cond tree."""
    if fold_poses is None:
        return lambda p: p
    return lambda p: p * map_factors(omap, params, fold_poses)


def _lf_model(omap, params, scan, spose, backend="xla", quantized=False,
              fold_poses=None):
    """calcLikelihoodFieldModel (planar_scanner.cpp:236-323):
    pz = z_hit exp(-z^2/2s^2) + z_rand/range_max; p = 1 + sum pz^3 over
    valid beams (max-range and NaN beams skipped)."""
    if backend in ("pallas_corr", "pallas_corr_interpret"):
        interp = backend == "pallas_corr_interpret"
        fb = "pallas_interpret" if interp else "pallas"
        mulf = _fold_mf(omap, params, fold_poses)
        return _corr_dispatch(
            omap, scan, spose, "likelihood_field", params,
            lambda s, cnt: 1.0 + s,
            lambda: mulf(_spread_dispatch(
                omap, scan, spose,
                _lf_term(params, scan),
                lambda s: 1.0 + s,
                lambda: _lf_model(omap, params, scan, spose, fb),
                interpret=interp,
            )),
            interpret=interp, quantized=quantized, fold_poses=fold_poses,
        )
    zt, valid = _beam_endpoints_dist(omap, scan, spose, backend)
    return _lf_combine(params, scan, zt, valid)


def _lf_gompertz_model(omap, params, scan, spose, backend="xla",
                       quantized=False, fold_poses=None):
    """calcLikelihoodFieldModelGompertz (planar_scanner.cpp:552-640):
    per-particle *mean* pz (note z_rand added raw, no /range_max) through the
    Gompertz squash; no valid beams -> p = 1."""
    def combine_zt(zt, valid):
        denom = 2.0 * params.sigma_hit * params.sigma_hit
        pz = params.z_hit * jnp.exp(-(zt * zt) / denom) + params.z_rand
        count = jnp.sum(valid)
        sum_pz = jnp.sum(jnp.where(valid[:, None], pz, 0.0), axis=0)
        p = apply_gompertz(params, sum_pz / jnp.maximum(count, 1))
        return jnp.where(count > 0, p, 1.0)

    if backend in ("pallas_corr", "pallas_corr_interpret"):
        def combine(s, cnt):
            p = apply_gompertz(params, s / jnp.maximum(cnt, 1))
            return jnp.where(cnt > 0, p, 1.0)

        interp = backend == "pallas_corr_interpret"
        fb = "pallas_interpret" if interp else "pallas"
        valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
        count = jnp.sum(valid)
        mulf = _fold_mf(omap, params, fold_poses)

        def term(z):
            denom = 2.0 * params.sigma_hit * params.sigma_hit
            # NOTE z_rand added raw, no /range_max (planar_scanner.cpp:597)
            return params.z_hit * jnp.exp(-(z * z) / denom) + params.z_rand

        def finalize(s):
            p = apply_gompertz(params, s / jnp.maximum(count, 1))
            return jnp.where(count > 0, p, 1.0)

        return _corr_dispatch(
            omap, scan, spose, "likelihood_field_gompertz", params, combine,
            lambda: mulf(_spread_dispatch(
                omap, scan, spose, term, finalize,
                lambda: _lf_gompertz_model(omap, params, scan, spose, fb),
                interpret=interp,
            )),
            interpret=interp, quantized=quantized, fold_poses=fold_poses,
        )
    zt, valid = _beam_endpoints_dist(omap, scan, spose, backend)
    return combine_zt(zt, valid)


def _lf_prob_model(omap, params, scan, spose, active, n_active, converged, do_beamskip,
                   backend="xla", fold_poses=None, return_log=False):
    """calcLikelihoodFieldModelProb (planar_scanner.cpp:325-533), log-space
    product over valid beams, optional beam skipping.

    return_log (static): return LOG p instead of p — the log-space-resident
    pipeline (pf.filter.sensor_update_log) that keeps the prob model usable
    at TPU beam counts, where exp(sum of ~720 log pz) underflows f32 for
    every particle and the filter would uniform-reset forever. The default
    exp path stays reference-exact.

    Beam skipping (static `do_beamskip`; additionally gated on filter
    convergence, :361-364): beams for which fewer than beam_skip_threshold of
    the particles see the map within beam_skip_distance are masked for
    everyone; if too many beams get masked (>= max_beams *
    error_threshold), integrate all beams instead (:482-530). Invalid
    (max-range/NaN) beams carry pz = 0 in the temp matrix exactly like the
    reference's cleared temp buffers, so the error fallback reproduces its
    zero-weight collapse."""
    if backend in ("pallas_corr", "pallas_corr_interpret") and not do_beamskip:
        def term(z):
            denom = 2.0 * params.sigma_hit * params.sigma_hit
            pz = params.z_hit * jnp.exp(-(z * z) / denom) \
                + params.z_rand / scan.range_max
            return jnp.log(pz)

        interp = backend == "pallas_corr_interpret"
        fb = "pallas_interpret" if interp else "pallas"
        mulf = _fold_mf(omap, params, fold_poses)
        # log variant: the corr table / spread sums already hold sum of
        # log pz — just skip the exp (identity combine/finalize)
        out_map = (lambda s, cnt: s) if return_log else (
            lambda s, cnt: jnp.exp(s))
        fin = (lambda s: s) if return_log else jnp.exp
        return _corr_dispatch(
            omap, scan, spose, "likelihood_field_prob", params,
            out_map,
            lambda: mulf(_spread_dispatch(
                omap, scan, spose, term, fin,
                lambda: _lf_prob_model(omap, params, scan, spose, active,
                                       n_active, converged, do_beamskip, fb,
                                       return_log=return_log),
                interpret=interp,
            )),
            interpret=interp, fold_poses=fold_poses,
        )
    if backend in ("pallas_corr", "pallas_corr_interpret"):
        backend = "pallas" if backend == "pallas_corr" else "pallas_interpret"
    zt, valid = _beam_endpoints_dist(omap, scan, spose, backend)
    denom = 2.0 * params.sigma_hit * params.sigma_hit
    pz = params.z_hit * jnp.exp(-(zt * zt) / denom) + params.z_rand / scan.range_max
    logpz = jnp.log(pz)
    if not do_beamskip:
        log_p = jnp.sum(jnp.where(valid[:, None], logpz, 0.0), axis=0)
        return log_p if return_log else jnp.exp(log_p)

    b = scan.ranges.shape[0]
    # in-map test for the obs_count increment (:441-453): only beams whose
    # endpoint lands on the map count toward agreement
    ranges = scan.ranges[:, None]
    th = spose[None, :, 2] + scan.angles[:, None]
    hx = spose[None, :, 0] + ranges * jnp.cos(th)
    hy = spose[None, :, 1] + ranges * jnp.sin(th)
    in_map = omap.is_valid(omap.world_to_map(jnp.stack([hx, hy], axis=-1)))
    agrees = in_map & (zt < params.beam_skip_distance) & valid[:, None] & active[None, :]
    obs_count = jnp.sum(agrees, axis=1).astype(jnp.float32)
    obs_mask = obs_count / jnp.maximum(n_active.astype(jnp.float32), 1.0) > (
        params.beam_skip_threshold
    )
    skipped = jnp.sum(~obs_mask)
    error = skipped >= b * params.beam_skip_error_threshold
    # second pass (:512-529); invalid beams have temp pz == 0 -> log 0 = -inf
    pz_temp = jnp.where(valid[:, None], pz, 0.0)
    use_beam = error | obs_mask[:, None]
    log_p = jnp.sum(jnp.where(use_beam, jnp.log(pz_temp), 0.0), axis=0)
    log_p_all = jnp.where(converged, log_p, jnp.sum(jnp.where(valid[:, None], logpz, 0.0), axis=0))
    return log_p_all if return_log else jnp.exp(log_p_all)


def _beam_model(omap, params, scan, spose, backend="xla"):
    """calcBeamModel (planar_scanner.cpp:168-234): per-beam map raycast plus
    the 4-part hit/short/max/rand mixture; p = 1 + sum pz^3 over *all* beams
    (the beam model has no NaN/max-range skip).

    backend "pallas_corr" + a baked range image (OccupancyMap2D.
    with_range_image) routes through the lattice beam kernel
    (ops/beam_kernel.py) — an approximate fast mode; the exact Bresenham
    bundle is the default and the fallback."""
    if (
        backend in ("pallas_corr", "pallas_corr_interpret")
        and omap.range_image is not None
    ):
        import jax

        from badger_amcl_tpu.ops import beam_kernel

        if beam_kernel.ri_fits(omap):
            pre = beam_kernel.beam_prepass(omap, spose, scan.range_max)
            interp = backend == "pallas_corr_interpret"

            def fast(_):
                return beam_kernel.beam_corr_values(
                    omap, params, scan, spose, pre, interpret=interp
                )

            def slow(_):
                # spread cloud: the sigma-sorted per-cell-row kernel
                # (ops/beam_spread_kernel.py) when the transposed range
                # rows are baked; exact Bresenham otherwise. This is the
                # beam-model global-localization path (node.cpp:847-868
                # over planar_scanner.cpp:168-234).
                if omap.range_rows is None:
                    return _beam_model(omap, params, scan, spose, "xla")
                from badger_amcl_tpu.ops import beam_spread_kernel

                spre = beam_spread_kernel.beam_spread_prepass(
                    omap, spose, scan)
                return jax.lax.cond(
                    spre["fits"],
                    lambda _: beam_spread_kernel.beam_spread_values(
                        omap, params, scan, spose, spre, interpret=interp),
                    lambda _: _beam_model(omap, params, scan, spose, "xla"),
                    operand=None,
                )

            return jax.lax.cond(pre["fits"], fast, slow, operand=None)
    map_range = raycast.calc_range(
        omap,
        spose[:, 0:1],
        spose[:, 1:2],
        spose[:, 2:3] + scan.angles[None, :],
        scan.range_max,
    )
    obs = scan.ranges[None, :]
    zerr = obs - map_range
    denom = 2.0 * params.sigma_hit * params.sigma_hit
    pz = params.z_hit * jnp.exp(-(zerr * zerr) / denom)
    pz += jnp.where(
        zerr < 0, params.z_short * params.lambda_short * jnp.exp(-params.lambda_short * obs), 0.0
    )
    pz += jnp.where(obs == scan.range_max, params.z_max, 0.0)
    pz += jnp.where(obs < scan.range_max, params.z_rand / scan.range_max, 0.0)
    return 1.0 + jnp.sum(pz * pz * pz, axis=1)


def factor_fingerprint(params: PlanarScanParams):
    """Everything the baked factor texture embeds (off_map_factor is applied
    per-particle outside the texture). None when traced (can't fingerprint)."""
    try:
        return (float(params.non_free_space_factor),
                float(params.non_free_space_radius))
    except Exception:
        return None


def _factor_texture(omap: OccupancyMap2D, params: PlanarScanParams):
    """The recalcWeight per-cell factor texture: cell state and distance
    fused elementwise so each particle costs ONE read (not two). Uses the
    baked copy (bake_factor_texture) when its fingerprint matches."""
    want = factor_fingerprint(params)
    if omap.factor_tex is not None and want is not None \
            and omap.factor_key == want:
        return omap.factor_tex
    nf = params.non_free_space_factor
    interp = jnp.where(
        omap.distances < params.non_free_space_radius,
        nf + (omap.distances / jnp.maximum(params.non_free_space_radius, 1e-30))
        * (1.0 - nf),
        1.0,
    )
    return jnp.where(
        omap.cells != jnp.int8(CellState.FREE), nf, interp
    ).astype(jnp.float32)


def bake_factor_texture(omap: OccupancyMap2D,
                        params: PlanarScanParams) -> OccupancyMap2D:
    """Pre-bake the recalcWeight factor texture — one-shot per (map, params)
    like the psi bake. The node layer re-bakes on map receipt/reconfigure."""
    import dataclasses

    if omap.distances is None:
        return dataclasses.replace(omap, factor_tex=None, factor_key=None)
    key = factor_fingerprint(params)
    if key is None:
        return dataclasses.replace(omap, factor_tex=None, factor_key=None)
    tex = _factor_texture(
        dataclasses.replace(omap, factor_tex=None, factor_key=None), params)
    return dataclasses.replace(omap, factor_tex=tex, factor_key=key)


# factor window for the tight-cloud one-hot read (map_factors fast path)
FWIN_R = 32
FWIN_C = 128


def map_factors(omap: OccupancyMap2D, params: PlanarScanParams, poses):
    """recalcWeight (planar_scanner.cpp:642-682): multiplicative penalty per
    particle — off-map, non-free-space, or radius-interpolated.

    Two paths, identical results:
    - tight clouds (all particle cells inside one FWIN_R x FWIN_C window —
      every tracking step): dynamic-slice the window and read it with a
      one-hot row matmul + lane col-pick; M-sized gathers from small tables
      lower to ~7.5 ns/element scalar loops on TPU (PERF.md) and this
      replaces the single biggest non-kernel block of the tracking step.
    - otherwise: the classic per-particle texture gather.
    The one-hot matmul runs at Precision.HIGHEST: TPU DEFAULT truncates the
    factor values to bf16 (the mxu_gather lesson) and both paths must agree
    bit-for-bit."""
    import jax

    factor_tex = _factor_texture(omap, params)
    ij = omap.world_to_map(poses[:, :2])
    valid = omap.is_valid(ij)
    ci = jnp.clip(ij[..., 0], 0, omap.size_x - 1)
    cj = jnp.clip(ij[..., 1], 0, omap.size_y - 1)

    def classic(_):
        f = jnp.take(factor_tex.reshape(-1), cj * omap.size_x + ci)
        return jnp.where(valid, f, params.off_map_factor)

    if (poses.ndim != 2 or omap.size_y < FWIN_R or omap.size_x < FWIN_C):
        return classic(None)

    i0 = jnp.clip(jnp.min(ci), 0, omap.size_x - FWIN_C)
    j0 = jnp.clip(jnp.min(cj), 0, omap.size_y - FWIN_R)
    fits = (jnp.max(ci) - i0 < FWIN_C) & (jnp.max(cj) - j0 < FWIN_R)

    def windowed(_):
        win = jax.lax.dynamic_slice(factor_tex, (j0, i0), (FWIN_R, FWIN_C))

        dj = cj - j0
        di = ci - i0
        ohr = (dj[:, None] == jnp.arange(FWIN_R, dtype=dj.dtype)[None, :])
        rows = jax.lax.dot_general(
            ohr.astype(jnp.float32), win,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (M, FWIN_C)
        ohc = di[:, None] == jnp.arange(FWIN_C, dtype=di.dtype)[None, :]
        f = jnp.sum(jnp.where(ohc, rows, 0.0), axis=1)
        return jnp.where(valid, f, params.off_map_factor)

    return jax.lax.cond(fits, windowed, classic, operand=None)


def planar_likelihood(
    omap: OccupancyMap2D,
    params: PlanarScanParams,
    scan: PlanarScan,
    poses: jnp.ndarray,
    active: jnp.ndarray,
    n_active: jnp.ndarray,
    model: str,
    converged=False,
    do_beamskip: bool = False,
    backend: str = "xla",
    fold_factors: bool = False,
    prob_log_space: bool = False,
):
    """applyModelToSampleSet (planar_scanner.cpp:141-164): returns
    (p_model (N,), map_factor (N,)) to feed pf.sensor_update. `model`,
    `do_beamskip` and `backend` ("xla" | "pallas" | "pallas_interpret" |
    "pallas_corr" | "pallas_corr_q" | *_interpret) are static. The *_q
    backends opt in to the int8-quantized corr texture (slightly slower at
    the flagship shape, 8x less VMEM per call — see _corr_dispatch).
    prob_log_space (static, likelihood_field_prob only): return LOG p for
    the log-space-resident weight pipeline (pf.filter.sensor_update_log) —
    the variant that holds 720 beams without f32 underflow; factors are
    then never folded (log p adds, it does not multiply).
    With fold_factors=True (static) and a corr backend, the map factor is
    folded into p and the returned map_factor is None — single-robot
    callers feeding sensor_update should fold (saves the separate windowed
    factor read); callers that consume p and mf separately must not."""
    quantized = backend in ("pallas_corr_q", "pallas_corr_q_interpret")
    if quantized:
        backend = ("pallas_corr_interpret"
                   if backend.endswith("_interpret") else "pallas_corr")
    # Factor folding (static): on the corr backends the recalcWeight factor
    # is folded into the kernel's table read (one fused take returns
    # p * factor; ops/corr_kernel._folded_take) and mf comes back None —
    # pf.filter.sensor_update(state, p, None) is exactly equivalent to
    # (state, p', mf) with p = p' * mf (see its docstring). Callers that
    # need the split (the fleet layer batches factors itself) pass
    # fold_factors=False.
    fold = (
        fold_factors
        and backend in ("pallas_corr", "pallas_corr_interpret")
        and (
            model in ("likelihood_field", "likelihood_field_gompertz")
            or (model == "likelihood_field_prob" and not do_beamskip
                and not prob_log_space)  # log p folds additively, not by *
        )
    )
    fold_poses = poses if fold else None
    spose = coord_add(params.scanner_pose, poses)
    if model == "beam":
        p = _beam_model(omap, params, scan, spose, backend)
    elif model == "likelihood_field":
        p = _lf_model(omap, params, scan, spose, backend, quantized,
                      fold_poses=fold_poses)
    elif model == "likelihood_field_prob":
        p = _lf_prob_model(
            omap, params, scan, spose, active, n_active, converged, do_beamskip,
            backend, fold_poses=fold_poses, return_log=prob_log_space,
        )
    elif model == "likelihood_field_gompertz":
        p = _lf_gompertz_model(omap, params, scan, spose, backend, quantized,
                               fold_poses=fold_poses)
    else:  # pragma: no cover
        raise ValueError(f"unknown planar model {model!r}")
    if fold:
        return p, None
    return p, map_factors(omap, params, poses)


# Models whose table-side combine is supported by the cell-space resampling
# contract (the same set that supports factor folding, minus beamskip).
CELL_MODELS = ("likelihood_field", "likelihood_field_gompertz",
               "likelihood_field_prob")


def planar_likelihood_cells(
    omap: OccupancyMap2D,
    params: PlanarScanParams,
    scan: PlanarScan,
    poses: jnp.ndarray,
    model: str,
    backend: str = "pallas_corr",
):
    """Cell-space variant of `planar_likelihood` for the cell resampling
    contract (pf.filter.sensor_resample_cells): returns
    (tbl (T_FLAT_CELLS,) f32, key (M,) int32, ok bool) — the folded
    per-lattice-cell p * recalcWeight-factor table and each particle's flat
    cell key, with NO per-particle take. ok=False (traced) whenever the
    corr fast path cannot serve this step (cloud outside the lattice
    envelope, any off-map particle); the caller then runs the classic
    pick-level step instead. `model` must be in CELL_MODELS and `backend` a
    corr backend — static misuse raises."""
    if backend not in ("pallas_corr", "pallas_corr_interpret"):
        raise ValueError(f"cell contract requires a corr backend, got {backend!r}")
    if model not in CELL_MODELS:
        raise ValueError(f"cell contract unsupported for model {model!r}")
    interp = backend == "pallas_corr_interpret"
    spose = coord_add(params.scanner_pose, poses)
    if model == "likelihood_field":
        combine = lambda s, cnt: 1.0 + s  # noqa: E731
    elif model == "likelihood_field_gompertz":
        def combine(s, cnt):
            p = apply_gompertz(params, s / jnp.maximum(cnt, 1))
            return jnp.where(cnt > 0, p, 1.0)
    else:  # likelihood_field_prob (log-space sum table, no beamskip)
        combine = lambda s, cnt: jnp.exp(s)  # noqa: E731
    return _corr_dispatch(
        omap, scan, spose, model, params, combine,
        fallback_fn=None, interpret=interp, fold_poses=poses,
        want_cells=True,
    )
