"""Isolate the chained-timing floor: what does a fori_loop iteration cost
when the body does (almost) nothing?

Separates (a) per-dispatch fixed cost (tunnel), (b) per-iteration loop
overhead, (c) carry-size dependence (the MCLState pytree is ~5 MB; a while
loop that copies modified carries would pay HBM traffic per iteration).
Run alone on the TPU."""

import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, x0, iters):
    import jax

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: fn(v), x)

    y = loop(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup

    omap, params, state, scan, scan_params, pool = _build_setup(
        50000, 720, 1024, pose_cov=(0.02, 0.02, 0.002), min_particles=50000)

    out = {"device": str(jax.devices()[0])}

    # tiny carry: one (8,128) array
    tiny = jnp.ones((8, 128), jnp.float32)
    for iters in (100, 400):
        out[f"tiny_carry_iters{iters}_ms"] = timed(
            lambda v: v * 1.0000001, tiny, iters)

    # poses-only carry (600 KB)
    for iters in (100, 400):
        out[f"poses_carry_iters{iters}_ms"] = timed(
            lambda v: v * 1.0000001, state.poses, iters)

    # full MCLState carry, poses-only touch (the profile_phases noop)
    for iters in (100, 400):
        out[f"state_carry_iters{iters}_ms"] = timed(
            lambda s: s.replace(poses=s.poses * 1.0000001), state, iters)

    # full MCLState carry, touch everything mutable the real step touches
    def touch_all(s):
        return s.replace(
            poses=s.poses * 1.0000001,
            weights=s.weights * 1.0000001,
            n_active=s.n_active + 0,
        )

    out["state_touch3_iters100_ms"] = timed(touch_all, state, 100)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
