"""Why does the chained spread step cost 243 ms/iter?

Checks which dispatch branch (corr fast / spread kernel / XLA fallback)
actually runs as the state evolves through a chain of full steps, and
times the likelihood alone in a fori chain from the evolved states.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu import mcl
    from badger_amcl_tpu.ops import corr_kernel, spread_kernel

    omap, params, state, scan, scan_params, pool = _build_setup(
        50000, 720, 1024, pose_cov=(2.0, 2.0, 1.0), min_particles=50000,
    )
    backend = mcl.default_backend()
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)

    step = jax.jit(lambda s: mcl.sensor_resample_step_jit(
        s, omap, scan_params, scan, pool, params, backend=backend))

    @jax.jit
    def fits_of(s):
        pre_c = corr_kernel.corr_prepass(
            omap, s.poses, scan.ranges, scan.angles, valid)
        pre_s = spread_kernel.spread_prepass(
            omap, s.poses, scan.ranges, scan.angles, valid)
        return (pre_c["fits"], pre_s["fits"],
                jnp.std(s.poses[:, 0]), jnp.std(s.poses[:, 2]),
                jnp.sum(jnp.isnan(s.poses)), jnp.sum(s.weights))

    out = {}
    s = state
    trace = []
    for i in range(42):
        if i in (0, 1, 2, 5, 10, 20, 40):
            cf, sf, sx, sth, nn, sw = [float(v) for v in fits_of(s)]
            trace.append({"iter": i, "corr_fits": cf, "spread_fits": sf,
                          "std_x": round(sx, 3), "std_th": round(sth, 3),
                          "nans": nn, "sum_w": round(sw, 4)})
            print(json.dumps(trace[-1]), flush=True)
        s = step(s)
    out["trace"] = trace

    # time the full step in a fori chain from state AND from evolved s
    def timed(fn, x0, iters=100):
        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, iters, lambda i, v: fn(v), x)
        y = loop(x0)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        y = loop(y)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / iters * 1e3

    out["step_chain_from_fresh_ms"] = round(timed(step, state), 2)
    out["step_chain_from_evolved_ms"] = round(timed(step, s), 2)

    @jax.jit
    def like(s):
        p = mcl.likelihood_only(s, omap, scan_params, scan, backend=backend)
        return s.replace(poses=s.poses + (p * 1e-12)[:, None])

    out["like_chain_from_fresh_ms"] = round(timed(like, state), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
