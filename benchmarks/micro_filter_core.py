"""Round-3 filter-core decision bench: sorted vs grid vs cond cluster ranks.

Measures, per regime (tracking / spread), with the in-jit fori chain
(CLAUDE.md timing rules) AND per-program compile wall time:
  - ranks_grid / ranks_sorted / ranks_cond  (the per-particle cluster-rank
    formulations in pf/cluster.py)
  - cluster_stats (full, with the production cond)
  - full_step (mcl.sensor_resample_step_jit)

One TPU job at a time. ~8 compiles; budget ~10 min.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, state0, iters=100):
    import jax

    @jax.jit
    def chain_loop(s):
        return jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s)

    t0 = time.perf_counter()
    s = chain_loop(state0)
    jax.block_until_ready(s)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = chain_loop(s)
    jax.block_until_ready(s)
    run_ms = (time.perf_counter() - t0) / iters * 1e3
    return run_ms, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=50000)
    ap.add_argument("--beams", type=int, default=720)
    ap.add_argument("--map-cells", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--regimes", default="tracking,spread")
    ap.add_argument("--what", default="ranks,stats,step")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu import mcl
    from badger_amcl_tpu.pf import cluster as pf_cluster
    from badger_amcl_tpu.pf import filter as pf_filter
    from badger_amcl_tpu.pf import kld

    covs = {"steady": (0.004, 0.004, 0.0004),
            "tracking": (0.02, 0.02, 0.002),
            "spread": (2.0, 2.0, 1.0)}
    what = set(args.what.split(","))
    out = {"device": str(jax.devices()[0])}

    for regime in args.regimes.split(","):
        omap, params, state, scan, scan_params, pool = _build_setup(
            args.particles, args.beams, args.map_cells,
            pose_cov=covs[regime], min_particles=args.particles,
        )
        shape = params.hist_shape
        r = {}

        def chain(s, v):
            return s.replace(poses=s.poses + (v * 1e-12)[:, None])

        if "ranks" in what:
            def ranks_grid(s):
                _, flat = kld.grid_cells(
                    kld.bin_keys(s.poses), s.active_mask, shape)
                rank_p, cc = pf_cluster._ranks_grid_path(
                    flat, s.active_mask, shape)
                return chain(s, rank_p.astype(jnp.float32) + cc)

            def ranks_sorted(s):
                _, flat = kld.grid_cells(
                    kld.bin_keys(s.poses), s.active_mask, shape)
                sb = kld.sort_by_bin(flat, s.active_mask)
                rank_p, cc = pf_cluster._ranks_sorted_path(sb, shape)
                return chain(s, rank_p.astype(jnp.float32) + cc)

            def ranks_cond(s):
                _, flat = kld.grid_cells(
                    kld.bin_keys(s.poses), s.active_mask, shape)
                sb = kld.sort_by_bin(flat, s.active_mask)
                u_count = jnp.sum(sb[3]).astype(jnp.int32)
                rank_p, cc = jax.lax.cond(
                    u_count <= pf_cluster.MAX_UNIQUE_BINS,
                    lambda _: pf_cluster._ranks_sorted_path(sb, shape),
                    lambda _: pf_cluster._ranks_grid_path(
                        flat, s.active_mask, shape),
                    operand=None)
                return chain(s, rank_p.astype(jnp.float32) + cc)

            for name, fn in (("ranks_grid", ranks_grid),
                             ("ranks_sorted", ranks_sorted),
                             ("ranks_cond", ranks_cond)):
                ms, cs = timed(fn, state, args.iters)
                r[name + "_ms"] = round(ms, 3)
                r[name + "_compile_s"] = round(cs, 1)

        if "stats" in what:
            def stats_full(s):
                st = pf_cluster.compute_cluster_stats(
                    s.poses, s.weights, s.active_mask, params)
                return chain(s, st.particle_cluster.astype(jnp.float32))

            ms, cs = timed(stats_full, state, args.iters)
            r["cluster_stats_ms"] = round(ms, 3)
            r["cluster_stats_compile_s"] = round(cs, 1)

        if "step" in what:
            backend = mcl.default_backend()
            ms, cs = timed(
                lambda s: mcl.sensor_resample_step_jit(
                    s, omap, scan_params, scan, pool, params,
                    backend=backend),
                state, args.iters)
            r["full_step_ms"] = round(ms, 3)
            r["full_step_compile_s"] = round(cs, 1)

        if "resample" in what:
            def resample_only(s):
                return pf_filter.resample(s, params, pool)

            ms, cs = timed(resample_only, state, args.iters)
            r["resample_ms"] = round(ms, 3)
            r["resample_compile_s"] = round(cs, 1)

        out[regime] = r
        print(json.dumps({regime: r}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
