"""Per-phase timing of the flagship step on the real chip.

Times each sub-phase of sensor_resample_step (corr backend) independently
with dependency-chained loops (beware loop-invariant hoisting, CLAUDE.md),
so PERF.md's cost model rests on measurements, not estimates.

Run ONE at a time on the tunneled TPU: `python benchmarks/profile_phases.py`.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, state0, iters=100):
    """Device time per call by TWO-POINT chained measurement.

    The chain runs inside ONE jit'd fori_loop (each phase fn is
    state -> state, so the data dependency defeats loop-invariant
    hoisting). Timing the SAME chain at iters and 4*iters and taking the
    slope cancels the tunnel's FIXED per-dispatch cost — measured at
    ~25 ms in a fresh process and growing to ~100 ms late in a long one
    (benchmarks/probe_floor.py), which at a single iters=100 read would
    inflate every number by 0.25-1.0 ms/iter."""
    import jax

    import jax.numpy as jnp

    @jax.jit
    def chain_loop(s, n):
        # n is TRACED: one compilation serves both iteration counts
        return jax.lax.fori_loop(0, n, lambda i, t: fn(t), s)

    lo, hi = jnp.int32(iters), jnp.int32(4 * iters)
    s = chain_loop(state0, lo)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = chain_loop(s, lo)
    jax.block_until_ready(s)
    w_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = chain_loop(s, hi)
    jax.block_until_ready(s)
    w_hi = time.perf_counter() - t0
    return (w_hi - w_lo) / (3 * iters) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=50000)
    ap.add_argument("--beams", type=int, default=720)
    ap.add_argument("--map-cells", type=int, default=1024)
    ap.add_argument("--regime", default="tracking",
                    choices=["steady", "tracking", "spread"])
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu import mcl
    from badger_amcl_tpu.ops import corr_kernel, mxu_gather
    from badger_amcl_tpu.pf import cluster as pf_cluster
    from badger_amcl_tpu.pf import filter as pf_filter
    from badger_amcl_tpu.pf import kld
    from badger_amcl_tpu.sensors import planar

    cov = {"steady": (0.004, 0.004, 0.0004),
           "tracking": (0.02, 0.02, 0.002),
           "spread": (2.0, 2.0, 1.0)}[args.regime]
    omap, params, state, scan, scan_params, pool = _build_setup(
        args.particles, args.beams, args.map_cells,
        pose_cov=cov, min_particles=args.particles,
    )
    backend = mcl.default_backend()
    out = {"regime": args.regime, "backend": backend,
           "device": str(jax.devices()[0])}

    def chain(s, v):
        return s.replace(poses=s.poses + (v * 1e-12)[:, None])

    # -- full step & likelihood (the bench numbers, for cross-checking)
    out["full_step_ms"] = timed(
        lambda s: mcl.sensor_resample_step_jit(
            s, omap, scan_params, scan, pool, params, backend=backend),
        state, args.iters)
    out["likelihood_ms"] = timed(
        jax.jit(lambda s: chain(s, mcl.likelihood_only(
            s, omap, scan_params, scan, backend=backend))),
        state, args.iters)

    # -- corr pieces
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)

    @jax.jit
    def prepass_only(s):
        pre = corr_kernel.corr_prepass(omap, s.poses, scan.ranges, scan.angles, valid)
        return chain(s, pre["ci"].astype(jnp.float32))

    out["corr_prepass_ms"] = timed(prepass_only, state, args.iters)

    @jax.jit
    def texpad_only(s):
        denom0 = 2.0 * scan_params.sigma_hit * scan_params.sigma_hit

        def psi(d):
            pz = scan_params.z_hit * jnp.exp(-(d * d) / denom0) \
                + scan_params.z_rand / scan.range_max
            return pz * pz * pz

        tex_pad = jnp.zeros(
            (omap.size_y + 2 * corr_kernel.PAD_R,
             omap.size_x + 2 * corr_kernel.PAD_C), jnp.float32)
        tex_pad = tex_pad + psi(jnp.float32(omap.max_distance_to_object))
        # chain the state in so the build can't be hoisted
        tex_pad = jax.lax.dynamic_update_slice(
            tex_pad, psi(omap.distances) + s.poses[0, 0] * 1e-20,
            (corr_kernel.PAD_R, corr_kernel.PAD_C))
        return s.replace(
            poses=s.poses + tex_pad[corr_kernel.PAD_R, corr_kernel.PAD_C] * 1e-20
        )

    out["texpad_psi_ms"] = timed(texpad_only, state, args.iters)

    @jax.jit
    def mapfactors_only(s):
        return chain(s, planar.map_factors(omap, scan_params, s.poses))

    out["map_factors_ms"] = timed(mapfactors_only, state, args.iters)

    # -- filter pieces
    p_fake = jnp.ones((args.particles,), jnp.float32)

    @jax.jit
    def sensorupdate_only(s):
        s2 = pf_filter.sensor_update(s, p_fake + s.poses[:, 0] * 1e-20, None)
        return s2

    out["sensor_update_ms"] = timed(sensorupdate_only, state, args.iters)

    @jax.jit
    def stats_only(s):
        st = pf_cluster.compute_cluster_stats(
            s.poses, s.weights, s.active_mask, params)
        return chain(s, st.particle_cluster.astype(jnp.float32))

    out["cluster_stats_ms"] = timed(stats_only, state, args.iters)

    @jax.jit
    def resample_only(s):
        return pf_filter.resample(s, params, pool)

    out["resample_incl_stats_ms"] = timed(resample_only, state, args.iters)

    @jax.jit
    def pick_only(s):
        r = jax.random.uniform(s.key, (args.particles,))
        idx = pf_filter._pick_indices(s.weights, r)
        return chain(s, idx.astype(jnp.float32))

    out["pick_indices_ms"] = timed(pick_only, state, args.iters)

    @jax.jit
    def gatherrows_only(s):
        r = jax.random.uniform(s.key, (args.particles,))
        idx = pf_filter._pick_indices(s.weights, r)
        picked = mxu_gather.gather_rows(s.poses, idx)
        return chain(s, picked[:, 0])

    out["pick_plus_gather_rows_ms"] = timed(gatherrows_only, state, args.iters)

    @jax.jit
    def firstocc_only(s):
        ones = jnp.ones((args.particles,), bool)
        _, flat = kld.grid_cells(kld.bin_keys(s.poses), ones, params.hist_shape)
        is_new = kld.first_occurrence_flags(flat, ones, params.hist_shape)
        return chain(s, is_new.astype(jnp.float32))

    out["kld_first_occurrence_ms"] = timed(firstocc_only, state, args.iters)

    # -- irreducible-floor probes (PERF.md floor accounting): what a step
    # could not avoid even with zero likelihood/filter math.

    @jax.jit
    def noop_only(s):
        # measures the chained fori_loop's per-iteration floor (loop
        # carry shuffling + elementwise touch of the (M,3) state)
        return s.replace(poses=s.poses * 1.0000000001)

    out["floor_noop_chain_ms"] = timed(noop_only, state, args.iters)

    @jax.jit
    def sort_only(s):
        # ONE 2-operand 50k stable sort — the unit cost the filter core's
        # sort-based formulations are built from
        k = (s.poses[:, 0] * 1e6).astype(jnp.int32)
        v = jnp.arange(args.particles, dtype=jnp.int32)
        ks, vs = jax.lax.sort((k, v), num_keys=1, is_stable=True)
        return chain(s, vs.astype(jnp.float32))

    out["floor_one_sort_ms"] = timed(sort_only, state, args.iters)

    @jax.jit
    def fusedresample_only(s):
        new_poses, new_count, rank_p, cc = (
            pf_filter._resample_multinomial_fused(
                s, params, jnp.float32(0.0), pool, s.key))
        return s.replace(poses=new_poses + rank_p[:, None] * 1e-20)

    out["fused_resample_core_ms"] = timed(fusedresample_only, state, args.iters)

    # -- cell-contract phases (round 5): the pinned full step and the
    # fused cell-space sensor+resample alone
    poses0 = state.poses

    @jax.jit
    def fullstep_cell(s):
        s2 = mcl.sensor_resample_step_jit(
            s, omap, scan_params, scan, pool, params, backend=backend,
            resample_contract="cell")
        return s2.replace(
            poses=poses0 + jnp.mean(s2.poses) * 1e-12,
            weights=jnp.full_like(s2.weights, 1.0 / args.particles),
            n_active=jnp.int32(args.particles))

    out["full_step_cell_ms"] = timed(fullstep_cell, state, args.iters)

    @jax.jit
    def fullstep_pick_pinned(s):
        s2 = mcl.sensor_resample_step_jit(
            s, omap, scan_params, scan, pool, params, backend=backend,
            resample_contract="pick")
        return s2.replace(
            poses=poses0 + jnp.mean(s2.poses) * 1e-12,
            weights=jnp.full_like(s2.weights, 1.0 / args.particles),
            n_active=jnp.int32(args.particles))

    out["full_step_pick_pinned_ms"] = timed(fullstep_pick_pinned, state,
                                            args.iters)

    tbl0, key0, ok0 = jax.jit(
        lambda ps: planar.planar_likelihood_cells(
            omap, scan_params, scan, ps, "likelihood_field", backend)
    )(state.poses)
    jax.block_until_ready(key0)

    @jax.jit
    def cells_likelihood_only(s):
        tbl, key_m, ok = planar.planar_likelihood_cells(
            omap, scan_params, scan, s.poses, "likelihood_field", backend)
        return chain(s, key_m.astype(jnp.float32) * 1e-6 + tbl[0])

    out["cells_likelihood_ms"] = timed(cells_likelihood_only, state,
                                       args.iters)

    @jax.jit
    def cellresample_only(s):
        s2 = pf_filter.sensor_resample_cells(
            s, params, pool, tbl0, key0, ok0, lambda: s)
        return s2.replace(
            poses=poses0 + jnp.mean(s2.poses) * 1e-12,
            weights=jnp.full_like(s2.weights, 1.0 / args.particles),
            n_active=jnp.int32(args.particles))

    out["cell_resample_ms"] = timed(cellresample_only, state, args.iters)

    # corr kernel call alone (prepass hoisted OUT of the chain): the tap
    # loop + in-kernel DMA + table read, nothing else
    pre0 = jax.jit(
        lambda ps: corr_kernel.corr_prepass(
            omap, ps, scan.ranges, scan.angles, valid,
            dedup=int(scan.ranges.shape[0]) >= 360)
    )(state.poses)
    jax.block_until_ready(pre0["off"])
    if omap.corr_psi_pad is not None:
        @jax.jit
        def kernel_only(s):
            v = corr_kernel.corr_values(
                omap, omap.corr_psi_pad, s.poses, scan.ranges, scan.angles,
                valid, pre0, tex_pre=omap.corr_psi_pre)
            return chain(s, v)

        out["corr_kernel_plus_read_ms"] = timed(kernel_only, state, args.iters)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
