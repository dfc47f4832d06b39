"""Spread-kernel pass split: what do the batched and std passes each cost?

Runs the two pallas passes with forced flags (all-batched / all-std /
real flags) on the bench spread setup, in-jit fori chains (CLAUDE.md
timing rules). Also times the prepass and the XLA fallback for reference.
One TPU job at a time.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, x0, iters=10):
    import jax

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: fn(v), x)

    t0 = time.perf_counter()
    y = loop(x0)
    jax.block_until_ready(y)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    y = loop(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=50000)
    ap.add_argument("--beams", type=int, default=720)
    ap.add_argument("--map-cells", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--long-ranges", action="store_true",
                    help="uncapped realistic scan (1.5-7.9 m)")
    ap.add_argument("--what", default="batched,std,real,prepass")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu.ops import spread_kernel as sk

    omap, params, state, scan, scan_params, pool = _build_setup(
        args.particles, args.beams, args.map_cells,
        pose_cov=(2.0, 2.0, 1.0), min_particles=args.particles,
    )
    ranges = scan.ranges
    if args.long_ranges:
        ranges = jnp.clip(
            4.0 + 3.5 * jnp.sin(scan.angles * 3.0), 0.2, 7.9
        ).astype(jnp.float32)
    angles = scan.angles
    valid = ranges < 8.0
    what = set(args.what.split(","))

    geom = sk._geom(omap)
    tex8 = jnp.round(
        omap.distances * (sk.QLEVELS / omap.max_distance_to_object)
    ).astype(jnp.int8)

    pre = jax.jit(sk.spread_prepass)(omap, state.poses, ranges, angles, valid)
    jax.block_until_ready(pre)
    flags = pre["flags"]
    n_tiles = pre["n_tiles"]
    out = {
        "device": str(jax.devices()[0]),
        "long_ranges": bool(args.long_ranges),
        "fits": bool(pre["fits"]),
        "frac_batched": float(jnp.mean(flags[:n_tiles])),
        "n_tiles": int(n_tiles),
    }
    print(json.dumps(out), flush=True)

    spose_s = pre["spose_s"]

    def run_with(callee, fl, org):
        def fn(s):
            o = callee(geom, tex8, s, ranges, angles, fl, org)
            # chain: fold one output row back into the pose array
            return s.at[:, 0].add(o[0] * 1e-12)
        return fn

    ones = jnp.ones_like(flags)
    zeros = jnp.zeros_like(flags)
    cases = []
    if "batched" in what:
        cases += [("batched_all", sk._batched_call, ones, pre["origins_narrow"]),
                  ("batched_skip", sk._batched_call, zeros, pre["origins_narrow"])]
    if "std" in what:
        cases += [("std_all", sk._std_call, zeros, pre["origins"]),
                  ("std_skip", sk._std_call, ones, pre["origins"])]
    if "real" in what:
        cases += [("batched_real", sk._batched_call, flags, pre["origins_narrow"]),
                  ("std_real", sk._std_call, flags, pre["origins"])]

    for name, callee, fl, org in cases:
        ms, cs = timed(run_with(callee, fl, org), spose_s, args.iters)
        out[name + "_ms"] = round(ms, 2)
        out[name + "_compile_s"] = round(cs, 1)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)

    if "prepass" in what:
        def pp(s):
            p = sk.spread_prepass(omap, s, ranges, angles, valid)
            return s.at[:, 0].add(p["flags"][0] * 1e-12)
        ms, cs = timed(pp, state.poses, args.iters)
        out["prepass_ms"] = round(ms, 2)
        out["prepass_compile_s"] = round(cs, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
