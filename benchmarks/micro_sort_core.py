"""Microbenchmarks for the sorted filter-core design (round 3).

Question: can the per-particle bin-grid scatter/gathers (≈3 ms of the
5.8 ms tracking step) be replaced by multi-operand stable sorts + segment
broadcasts? Measures each candidate primitive at the flagship 50k scale,
in-jit fori_loop with a data dependency (CLAUDE.md timing rules).
"""

import json
import sys
import time

sys.path.insert(0, ".")


def timed_fori(make_body, x0, iters=30):
    import jax

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: make_body(v), x)

    y = loop(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = loop(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    out = {"device": str(jax.devices()[0])}
    key = jax.random.PRNGKey(0)
    m = 50_000
    n_cells = 128 * 128 * 40

    keys0 = jax.random.randint(key, (m,), 0, 1 << 18, jnp.int32)
    idx0 = jnp.arange(m, dtype=jnp.int32)

    # 1. stable 2-operand sort (key + draw idx)
    def sort2(k):
        ks, isrt = jax.lax.sort((k, idx0), num_keys=1, is_stable=True)
        return k + isrt
    out["sort2_stable_50k_ms"] = timed_fori(sort2, keys0)

    # 1b. 4-operand stable sort (key + idx + 2 payloads)
    pay = jax.random.normal(key, (m,), jnp.float32)
    def sort4(k):
        ks, isrt, p1, p2 = jax.lax.sort((k, idx0, pay, pay), num_keys=1,
                                        is_stable=True)
        return k + isrt + p1.astype(jnp.int32)
    out["sort4_stable_50k_ms"] = timed_fori(sort4, keys0)

    # 2. full first-occurrence via two sorts + cumsum (draw-order flags)
    def first_occ_sorted(k):
        ks, isrt = jax.lax.sort((k, idx0), num_keys=1, is_stable=True)
        segstart = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (ks[1:] != ks[:-1]).astype(jnp.int32)])
        _, flags = jax.lax.sort((isrt, segstart), num_keys=1, is_stable=True)
        kn = jnp.cumsum(flags)
        return k + kn
    out["first_occ_sorted_ms"] = timed_fori(first_occ_sorted, keys0)

    # 3. current first-occurrence: scatter-min + gather on the 655k grid
    def first_occ_grid(k):
        kk = jnp.clip(k, 0, n_cells - 1)
        grid = jnp.full((n_cells,), 1 << 30, jnp.int32).at[kk].min(idx0)
        flags = (grid[kk] == idx0).astype(jnp.int32)
        return k + jnp.cumsum(flags)
    out["first_occ_grid_ms"] = timed_fori(first_occ_grid, keys0)

    # 4. segment broadcast: value per segment-rank -> per particle via
    # chunked one-hot (table 4096, query 50k)
    table = jax.random.normal(key, (4096,), jnp.float32)
    seg = jax.random.randint(key, (m,), 0, 4096, jnp.int32)
    def seg_bcast(s):
        t2 = table.reshape(32, 128)
        ci = s // 128
        oh = (ci[:, None] == jnp.arange(32, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
        rows = jax.lax.dot_general(
            oh, t2, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        within = s - ci * 128
        inner = (within[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :])
        v = jnp.sum(jnp.where(inner, rows, 0.0), axis=1)
        return s + v.astype(jnp.int32)
    out["seg_broadcast_4096_ms"] = timed_fori(seg_bcast, seg)

    # 5. small scatter (4096 entries into 655k grid) — unique-bin occupancy
    small_idx = jax.random.randint(key, (4096,), 0, n_cells, jnp.int32)
    def small_scatter(s):
        occ = jnp.zeros((n_cells,), jnp.int32).at[s].set(1)
        return (s + occ[0]) % n_cells
    out["scatter_4096_into_655k_ms"] = timed_fori(small_scatter, small_idx)

    # 6. current 50k occupancy scatter for comparison
    def big_scatter(k):
        kk = jnp.clip(k, 0, n_cells - 1)
        occ = jnp.zeros((n_cells,), jnp.int32).at[kk].set(1)
        return (k + occ[0]) % (1 << 18)
    out["scatter_50k_into_655k_ms"] = timed_fori(big_scatter, keys0)

    # 7. small gather: 4096 labels from the 655k grid
    grid_vals = jax.random.randint(key, (n_cells,), 0, 1 << 20, jnp.int32)
    def small_gather(s):
        v = grid_vals[s]
        return (s + v) % n_cells
    out["gather_4096_from_655k_ms"] = timed_fori(small_gather, small_idx)

    # 8. cummax segment broadcast alternative (no table): propagate values
    # to the right within sorted segments via associative scan
    def seg_cummax(k):
        ks, isrt = jax.lax.sort((k, idx0), num_keys=1, is_stable=True)
        segstart = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (ks[1:] != ks[:-1]).astype(jnp.int32)])
        segid = jnp.cumsum(segstart)
        val = jnp.where(segstart == 1, ks, -(1 << 30))
        prop = jax.lax.associative_scan(jnp.maximum, val)
        return k + prop + segid
    out["seg_cummax_50k_ms"] = timed_fori(seg_cummax, keys0)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
