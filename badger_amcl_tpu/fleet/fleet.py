"""Fleet-scale batching: many robots, one program, a TPU mesh.

New capability beyond the reference (whose multi-robot story is "run one ROS
node per robot", SURVEY.md §2): the full MCL step is vmapped over a robot
axis and sharded over a `jax.sharding.Mesh` with `shard_map`. Each robot
carries its own PRNG key, map is replicated (fleets share a facility map),
scans/poses/pools are sharded along the fleet axis. No collectives are
needed in the hot path — robots are independent — so scaling is embarrassingly
parallel over ICI; cross-robot aggregation (fleet health stats) is one psum.

Targets BASELINE.json config 5: 256 robots x 10k particles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from badger_amcl_tpu import mcl
from badger_amcl_tpu.pf import filter as pf_filter
from badger_amcl_tpu.pf.filter import ResampleModel
from badger_amcl_tpu.pf.types import PFParams
from badger_amcl_tpu.sensors import odom as odom_models


def fleet_init(params: PFParams, key: jax.Array, means, covs,
               alpha_slow=0.001, alpha_fast=0.1):
    """Stacked MCLState for R robots: means (R, 3), covs (R, 3, 3)."""
    r = means.shape[0]
    keys = jax.random.split(key, r)
    return jax.vmap(
        lambda k, m, c: pf_filter.init_with_gaussian(params, k, m, c, alpha_slow, alpha_fast)
    )(keys, jnp.asarray(means, jnp.float32), jnp.asarray(covs, jnp.float32))


def fleet_step(
    states,
    omap,
    scan_params,
    scans,
    pools,
    odom_poses,
    odom_deltas,
    absolute_motions,
    alphas,
    params: PFParams,
    odom_model: odom_models.OdomModel = odom_models.OdomModel.DIFF,
    laser_model: str = "likelihood_field",
    resample_model: ResampleModel = ResampleModel.MULTINOMIAL,
    backend: str = "xla",
):
    """One full MCL step for every robot. Leading axis R on states, scans,
    pools, odometry; map and model parameters broadcast.

    backend "xla": everything vmapped. Pallas backends: motion/resample
    stay vmapped; the measurement stage runs through the batched-robot corr
    kernel (_fleet_likelihood) — one pallas call with the robot axis on the
    grid — with a lax.map-of-kernels fallback outside its envelope.

    Fleet configs should set PFParams.stats_max_clusters (e.g. 128): under
    vmap the cluster-stats lax.cond lowers to select and BOTH branches
    execute, so the exact segment_sum fallback costs ~180 ms across 256
    robots while never being taken."""
    if backend == "xla":
        step = functools.partial(
            mcl.mcl_step_2d,
            params=params,
            odom_model=odom_model,
            laser_model=laser_model,
            resample_model=resample_model,
            do_resample=True,
        )
        return jax.vmap(
            step, in_axes=(0, None, None, 0, 0, 0, 0, 0, None)
        )(states, omap, scan_params, scans, pools, odom_poses, odom_deltas,
          absolute_motions, alphas)

    from badger_amcl_tpu.pf import filter as pf_filter

    states = jax.vmap(
        lambda st, op, od, am: odom_models.motion_update(
            st, odom_model, alphas, op, od, am
        ),
        in_axes=(0, 0, 0, 0),
    )(states, odom_poses, odom_deltas, absolute_motions)

    p, mf = _fleet_likelihood(
        omap, scan_params, scans, states, laser_model, backend
    )
    states = jax.vmap(pf_filter.sensor_update)(states, p, mf)
    if resample_model == ResampleModel.MULTINOMIAL:
        # composite-key batched resample: the vmapped per-robot grid
        # machinery was 150 of the 270 ms fleet step (PERF.md round-5
        # fleet breakdown); pick-for-pick equivalent (test_fleet.py)
        return pf_filter.fleet_resample(states, params, pools)
    return jax.vmap(
        lambda st, pool: pf_filter.resample(st, params, pool, resample_model)
    )(states, pools)


def _fleet_likelihood(omap, scan_params, scans, states, laser_model, backend):
    """Fleet measurement stage for the Pallas backends.

    Fast path: ALL robots' likelihoods in ONE batched-robot corr kernel
    (grid over robots; prepass vmapped; per-particle table reads and the
    recalcWeight factors batched across the whole fleet) — replacing the
    sequential `lax.map` of per-robot kernel calls that dominated round 1's
    fleet step. Falls back to the lax.map path (with its own per-robot
    fallbacks) when any robot exceeds the lattice envelope, the map lacks a
    baked psi texture for this model, or the model is not LF-family."""
    from badger_amcl_tpu.sensors.planar import (
        CORR_MODELS, coord_add, corr_combine, map_factors, planar_likelihood,
    )

    def slow():
        def one_robot(args):
            st, scan = args
            return planar_likelihood(
                omap, scan_params, scan, st.poses, st.active_mask, st.n_active,
                laser_model, converged=st.converged, backend=backend,
            )

        return jax.lax.map(one_robot, (states, scans))

    from badger_amcl_tpu.ops import corr_kernel
    from badger_amcl_tpu.sensors.planar import psi_fingerprint

    # the baked psi embeds range_max and the mixture params: require every
    # robot's range_max to equal the baked one (heterogeneous fleets fall
    # back rather than silently evaluating with stale baked constants)
    try:
        range_maxes = {float(rm) for rm in scans.range_max}
    except Exception:  # traced: cannot verify the bake — fall back
        range_maxes = None
    want = (
        psi_fingerprint(laser_model, scan_params, next(iter(range_maxes)))
        if range_maxes is not None and len(range_maxes) == 1 else None
    )
    if (
        backend not in ("pallas_corr", "pallas_corr_interpret")
        or laser_model not in CORR_MODELS
        or omap.corr_psi_pad is None
        or want is None
        or omap.corr_psi_key != want
        or not corr_kernel.map_fits(omap)
    ):
        return slow()
    interpret = backend == "pallas_corr_interpret"

    spose = coord_add(scan_params.scanner_pose, states.poses)  # (R, N, 3)
    valid = (scans.ranges < scans.range_max[:, None]) & ~jnp.isnan(scans.ranges)
    pre = jax.vmap(
        lambda sp, r, a, v: corr_kernel.corr_prepass(omap, sp, r, a, v)
    )(spose, scans.ranges, scans.angles, valid)
    fits_all = jnp.all(pre["fits"])
    narrow_all = jnp.all(pre["narrow"])
    tight_all = jnp.all(pre["tight"])
    n_beams = int(scans.ranges.shape[1])

    # recalcWeight factors for the whole fleet in one batched gather
    r_, n_ = states.poses.shape[:2]
    mf = map_factors(
        omap, scan_params, states.poses.reshape(r_ * n_, 3)
    ).reshape(r_, n_)

    def run(rows, j0_key):
        j0 = pre[j0_key]
        tex_pad = omap.corr_psi_pad
        sj, si = jax.vmap(
            lambda j, i: corr_kernel.slice_origin(tex_pad, j, i)
        )(j0, pre["i0"])
        tex_slices = jax.vmap(
            lambda a, b: jax.lax.dynamic_slice(
                tex_pad, (a, b),
                (corr_kernel.SLICE_R, corr_kernel.SLICE_C))
        )(sj, si)
        metas = jnp.stack(
            [pre["t_n"], j0 + corr_kernel.PAD_R - sj,
             pre["i0"] + corr_kernel.PAD_C - si,
             jnp.maximum(pre["nv"], 1)], axis=1,
        ).astype(jnp.int32)
        tables = corr_kernel.fleet_corr_call(
            tex_slices, metas, pre["off"], n_beams=n_beams, rows=rows,
            interpret=interpret,
        )  # (R, T_MAX, rows, PWIN_C)
        flats = jax.vmap(
            lambda cj, ci, ts, i0_r, j0_r: (
                (ts * rows + jnp.clip(cj - j0_r, 0, rows - 1))
                * corr_kernel.PWIN_C
                + jnp.clip(ci - i0_r, 0, corr_kernel.PWIN_C - 1)
            )
        )(pre["cj"], pre["ci"], pre["t_slot"], pre["i0"], j0)
        s = jnp.take_along_axis(
            tables.reshape(r_, -1), flats, axis=1
        )  # (R, N)
        nv = jnp.sum(valid, axis=1)  # (R,)
        return corr_combine(laser_model, scan_params, s, nv[:, None])

    def fast(_):
        return jax.lax.cond(
            tight_all,
            lambda __: run(corr_kernel.PWIN_R_TIGHT, "j0_tight"),
            lambda __: jax.lax.cond(
                narrow_all,
                lambda ___: run(corr_kernel.PWIN_R_NARROW, "j0_narrow"),
                lambda ___: run(corr_kernel.PWIN_R, "j0"),
                operand=None,
            ),
            operand=None,
        )

    p = jax.lax.cond(fits_all, fast, lambda _: slow()[0], operand=None)
    return p, mf


def fleet_reinit_masked(states, mask, pose_pools, params: PFParams,
                        alpha_slow=0.001, alpha_fast=0.1):
    """Global localization for a SUBSET of a (possibly sharded) fleet.

    Robots where `mask` (R,) is True are re-initialized from their row of
    `pose_pools` (R, M, 3) — the batched initWithPoseFn of the reference's
    global-localization service (node.cpp:870-883, particle_filter.cpp:
    136-162) — while the other robots' states (including PRNG keys) are
    left untouched. Implemented as a pure per-leaf where-select over the
    stacked state pytree, so it runs unchanged under shard_map with `mask`
    and `pose_pools` sharded along the fleet axis (no collectives).

    Masked robots consume one PRNG split; unmasked keep their old key, so
    an unmasked robot's trajectory is bit-identical to a run where the
    reinit never happened."""
    keys = jax.vmap(lambda k: jax.random.split(k)[0])(states.key)
    fresh = jax.vmap(
        lambda k, p: pf_filter.init_with_poses(
            params, k, p, alpha_slow, alpha_fast)
    )(keys, jnp.asarray(pose_pools, jnp.float32))

    def sel(old, new):
        m = mask.reshape(mask.shape + (1,) * (old.ndim - 1))
        return jnp.where(m, new, old)

    return jax.tree.map(sel, states, fresh)


def make_fleet_step(params: PFParams, odom_model=odom_models.OdomModel.DIFF,
                    laser_model="likelihood_field",
                    resample_model=ResampleModel.MULTINOMIAL,
                    backend: str = "xla"):
    """Jitted single-host fleet step."""
    return jax.jit(
        functools.partial(
            fleet_step, params=params, odom_model=odom_model,
            laser_model=laser_model, resample_model=resample_model,
            backend=backend,
        )
    )


def make_sharded_fleet_step(
    mesh: Mesh,
    params: PFParams,
    axis: str = "fleet",
    odom_model=odom_models.OdomModel.DIFF,
    laser_model="likelihood_field",
    resample_model=ResampleModel.MULTINOMIAL,
    backend: str = "xla",
):
    """The multi-chip fleet step: robots sharded along `axis`, map replicated.

    Robots are independent, so the per-shard program is just the local vmapped
    step; XLA lays the fleet axis out over ICI with zero hot-path collectives.
    Requires the robot count to divide the mesh axis size.
    """
    local = functools.partial(
        fleet_step, params=params, odom_model=odom_model,
        laser_model=laser_model, resample_model=resample_model,
        backend=backend,
    )
    sharded = P(axis)
    replicated = P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(sharded, replicated, replicated, sharded, sharded,
                  sharded, sharded, sharded, replicated),
        out_specs=sharded,
        check_vma=False,
    )
    return jax.jit(fn)


def fleet_health(states, mesh: Optional[Mesh] = None, axis: str = "fleet"):
    """Cross-fleet aggregate: per-robot (converged, n_active, max cluster
    weight) plus fleet means — the one place a collective appears.
    Works on sharded or local states."""
    def summarize(states):
        w = jnp.max(states.stats.cluster_weights, axis=-1)
        return {
            "converged_frac": jnp.mean(states.converged.astype(jnp.float32)),
            "mean_active": jnp.mean(states.n_active.astype(jnp.float32)),
            "mean_top_weight": jnp.mean(w),
        }

    if mesh is None:
        return jax.jit(summarize)(states)

    def local(states):
        w = jnp.max(states.stats.cluster_weights, axis=-1)
        n = states.converged.shape[0]
        conv = jax.lax.psum(jnp.sum(states.converged.astype(jnp.float32)), axis)
        act = jax.lax.psum(jnp.sum(states.n_active.astype(jnp.float32)), axis)
        topw = jax.lax.psum(jnp.sum(w), axis)
        total = jax.lax.psum(jnp.float32(n), axis)
        return {
            "converged_frac": conv / total,
            "mean_active": act / total,
            "mean_top_weight": topw / total,
        }

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis),), out_specs=P(),
                   check_vma=False)
    return jax.jit(fn)(states)
