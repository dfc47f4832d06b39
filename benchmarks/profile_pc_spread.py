"""3D spread kernel timing at global-localization scale (50k x 256).

Uniform full-yaw particle cloud over a warehouse-slice voxel map; times
the full term-sums chain (prepass excluded/included) with the in-jit fori
chain (CLAUDE.md timing rules). One TPU job at a time.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, x0, iters=100):
    """Interleaved two-point chained slope (benchmarks/timing.py)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: fn(v), x)

    lo, hi = jnp.int32(iters), jnp.int32(4 * iters)
    t0 = time.perf_counter()
    y = loop(x0, lo)
    jax.block_until_ready(y)
    cs = time.perf_counter() - t0

    def run(n):
        nonlocal y
        t0 = time.perf_counter()
        y = loop(y, n)
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    w = [run(lo), run(hi), run(hi), run(lo)]
    return ((w[1] + w[2]) - (w[0] + w[3])) / 2.0 / (3 * iters) * 1e3, cs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=50000)
    ap.add_argument("--points", type=int, default=256)
    ap.add_argument("--half", type=float, default=1.5,
                    help="cloud half-extent (m) around the map center")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from badger_amcl_tpu.maps import OctoMap3D
    from badger_amcl_tpu.ops import pc_spread_kernel as psk
    from badger_amcl_tpu.sensors.point_cloud import (
        PointCloudParams, point_cloud_likelihood,
    )

    rng = np.random.default_rng(2)
    pts = []
    n, nz = 400, 20  # 20 m x 20 m x 1 m @ 5 cm -> (20, 400, 400) = 3.2 MB
    for k in range(nz):
        z = (k + 0.5) * 0.05
        for i in range(0, n, 2):
            x = (i + 0.5) * 0.05
            pts += [[x, 0.025, z], [x, 20 - 0.025, z],
                    [0.025, x, z], [20 - 0.025, x, z]]
    for _ in range(30):
        cx, cy = rng.uniform(2, 18, 2)
        for k in range(nz):
            pts.append([cx, cy, (k + 0.5) * 0.05])
    omap = OctoMap3D.from_occupied_points(
        np.array(pts), 0.05, 0.4, metric_min=(0, 0, 0),
        metric_max=(20, 20, 1.0),
    ).with_distance_field()

    b = args.points
    ang = rng.uniform(-np.pi, np.pi, b)
    r = rng.uniform(0.5, 3.0, b)
    z = rng.uniform(0.1, 0.9, b)
    cld = jnp.asarray(
        np.stack([r * np.cos(ang), r * np.sin(ang), z], axis=1), jnp.float32
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    poses = jnp.concatenate([
        10.0 + jax.random.uniform(k1, (args.particles, 2),
                                  minval=-args.half, maxval=args.half),
        jax.random.uniform(k2, (args.particles, 1), minval=-3.14, maxval=3.14),
    ], axis=1).astype(jnp.float32)

    pre = jax.jit(psk.pc_spread_prepass)(omap, poses, cld)
    jax.block_until_ready(pre["flags"])
    for k in ("n_tiles", "g_groups", "m_pad"):
        pre[k] = int(pre[k])
    pre["pts"]["budget"] = int(pre["pts"]["budget"])
    fl = np.asarray(pre["flags"][: pre["n_tiles"]])
    out = {
        "device": str(jax.devices()[0]),
        "particles": args.particles, "points": b, "half_m": args.half,
        "fits": bool(pre["fits"]),
        "tier0": int((fl == 0).sum()), "tier1": int((fl == 1).sum()),
        "tier2": int((fl == 2).sum()), "escape": int((fl == 3).sum()),
    }
    print(json.dumps(out), flush=True)

    term = lambda zz: zz * zz

    def sums_with(fl_arr, zero_escape=False):
        pre2 = dict(pre)
        pre2["flags"] = fl_arr
        if zero_escape:
            pre2["n_escape"] = jnp.zeros_like(pre["n_escape"])

        def fn(s):
            t = psk.pc_spread_term_sums(omap, s, cld, pre2, term)
            return s.at[:, 0].add(t[: s.shape[0]] * 1e-12)

        return fn

    ms, cs = timed(sums_with(pre["flags"]), poses, args.iters)
    out["term_sums_ms"] = round(ms, 2)
    out["term_sums_compile_s"] = round(cs, 1)
    # forced-lower-bound: every pair in the smallest window tier (the 2D
    # kernel's tier-occupancy methodology, PERF.md spread section)
    ms, cs = timed(
        sums_with(jnp.zeros_like(pre["flags"]), zero_escape=True),
        poses, args.iters)
    out["tier0_all_ms"] = round(ms, 2)

    def pp(s):
        p = psk.pc_spread_prepass(omap, s, cld)
        return s.at[:, 0].add(p["flags"][0, 0].astype(jnp.float32) * 1e-12)

    ms, cs = timed(pp, poses, args.iters)
    out["prepass_ms"] = round(ms, 2)

    params = PointCloudParams()

    def full(s):
        p, mf = point_cloud_likelihood(
            omap, params, cld, s, "likelihood_field", backend="pallas"
        )
        return s.at[:, 0].add(p * 1e-12)

    ms, cs = timed(full, poses, args.iters)
    out["full_likelihood_ms"] = round(ms, 2)
    out["full_compile_s"] = round(cs, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
