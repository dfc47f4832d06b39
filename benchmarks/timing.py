"""Shared two-point chained-slope timer for the axon tunnel.

The tunnel charges a FIXED per-dispatch penalty after the first D2H
readback — ~25 ms in a fresh process growing to ~100 ms late in a long one
(benchmarks/probe_floor.py). Timing the SAME compiled chain at iters and
4*iters with a TRACED trip count and taking the slope cancels any fixed
cost; interleaving the measurements lo, hi, hi, lo and averaging each pair
additionally cancels LINEAR drift of that penalty across the four
dispatches (advisor round-4 finding: a lo-then-hi ordering leaves a
+drift/(3*iters) bias, material at iters=5 on multi-hundred-ms fleet
steps).
"""

import time


def timed_ms(fn, x, iters=5):
    """Device ms per fn application. fn must be state -> state (the data
    dependency defeats loop-invariant hoisting)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(v, n):
        return jax.lax.fori_loop(0, n, lambda i, t: fn(t), v)

    lo, hi = jnp.int32(iters), jnp.int32(4 * iters)

    y = loop(x, lo)  # compile + warm
    jax.block_until_ready(y)

    def run(n):
        nonlocal y
        t0 = time.perf_counter()
        y = loop(y, n)
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    w_lo1 = run(lo)
    w_hi1 = run(hi)
    w_hi2 = run(hi)
    w_lo2 = run(lo)
    return ((w_hi1 + w_hi2) - (w_lo1 + w_lo2)) / 2.0 / (3 * iters) * 1e3
