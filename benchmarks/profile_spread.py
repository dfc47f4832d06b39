"""Spread-kernel pass split (v3 tiered kernel): what do the tiers cost?

Runs the tiered pallas kernel with forced flags (all-tier0 / all-tier1 /
real) on the bench spread setup, in-jit fori chains (CLAUDE.md timing
rules). Also times the prepass and the escape arm. One TPU job at a time.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, x0, iters=100):
    """Interleaved two-point chained slope (benchmarks/timing.py)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: fn(v), x)

    lo, hi = jnp.int32(iters), jnp.int32(4 * iters)
    t0 = _t.perf_counter()
    y = loop(x0, lo)
    jax.block_until_ready(y)
    compile_s = _t.perf_counter() - t0

    def run(n):
        nonlocal y
        t0 = _t.perf_counter()
        y = loop(y, n)
        jax.block_until_ready(y)
        return _t.perf_counter() - t0

    w = [run(lo), run(hi), run(hi), run(lo)]
    return ((w[1] + w[2]) - (w[0] + w[3])) / 2.0 / (3 * iters) * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=50000)
    ap.add_argument("--beams", type=int, default=720)
    ap.add_argument("--map-cells", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--long-ranges", action="store_true",
                    help="uncapped realistic scan (1.5-7.9 m)")
    ap.add_argument("--what", default="t0,t1,real,prepass,sums")
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
    tex8 = sk.quantized_tex(omap)
    term = lambda z: z * z

    pre = jax.jit(sk.spread_prepass)(omap, state.poses, ranges, angles, valid)
    jax.block_until_ready(pre["flags"])
    # jit turns the dict's static python ints into device scalars; restore
    # them (inside the production jit they stay trace-time constants)
    for k in ("n_tiles", "g_groups", "m_pad"):
        pre[k] = int(pre[k])
    import numpy as np

    fl = np.asarray(pre["flags"][: pre["n_tiles"]])
    out = {
        "device": str(jax.devices()[0]),
        "long_ranges": bool(args.long_ranges),
        "fits": bool(pre["fits"]),
        "n_tiles": int(pre["n_tiles"]),
        "tier0_pairs": int((fl == 0).sum()),
        "tier_mid_pairs": int((fl == 1).sum()),
        "tier2_pairs": int((fl == 2).sum()),
        "giant_pairs": int((fl == 3).sum()),
        "escape_pairs": int((fl == sk.ESCAPE).sum()),
    }
    print(json.dumps(out), flush=True)

    spose_s = pre["spose_s"]

    def run_with(fl_arr):
        def fn(s):
            o = sk._tiered_call(geom, tex8, s, ranges, angles, fl_arr,
                                pre["org0"], pre["orgm"], pre["org1"],
                                pre["org2"])
            # chain: fold one output row back into the pose array
            return s.at[:, 0].add(o[0] * 1e-12)
        return fn

    cases = []
    if "t0" in what:
        cases.append(("tier0_all", jnp.zeros_like(pre["flags"])))
    if "t1" in what:
        cases.append(("tier1_all", jnp.ones_like(pre["flags"])))
    if "real" in what:
        cases.append(("real", pre["flags"]))
    for name, fl_arr in cases:
        ms, cs = timed(run_with(fl_arr), spose_s, args.iters)
        out[name + "_ms"] = round(ms, 2)
        out[name + "_compile_s"] = round(cs, 1)
        print(json.dumps({name: out[name + "_ms"]}), flush=True)

    if "prepass" in what:
        def pp(s):
            p = sk.spread_prepass(omap, s, ranges, angles, valid)
            return s.at[:, 0].add(p["flags"][0, 0].astype(jnp.float32) * 1e-12)
        ms, cs = timed(pp, state.poses, args.iters)
        out["prepass_ms"] = round(ms, 2)
        out["prepass_compile_s"] = round(cs, 1)

    if "sums" in what:
        def sums(s):
            t = sk.spread_term_sums(omap, s, ranges, angles, valid, pre, term)
            return s.at[:, 0].add(t[: s.shape[0]] * 1e-12)
        ms, cs = timed(sums, state.poses, args.iters)
        out["term_sums_ms"] = round(ms, 2)
        out["term_sums_compile_s"] = round(cs, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
