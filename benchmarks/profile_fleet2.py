"""Fleet resample-stage internals on the real chip."""

import json
import sys
import time

sys.path.insert(0, ".")


from benchmarks.timing import timed_ms


def timed(fn, x, iters=5):
    """Interleaved two-point slope (benchmarks/timing.py) — cancels the
    tunnel's fixed per-dispatch cost AND its linear drift (advisor r4)."""
    return timed_ms(fn, x, iters=iters)

def main():
    import jax
    import jax.numpy as jnp

    from badger_amcl_tpu.fleet import fleet_init
    from badger_amcl_tpu.ops import mxu_gather
    from badger_amcl_tpu.pf import cluster as pf_cluster
    from badger_amcl_tpu.pf import filter as pf_filter
    from badger_amcl_tpu.pf import kld
    from badger_amcl_tpu.pf.types import PFParams

    r, n = 256, 10000
    params = PFParams(min_samples=n // 100, max_samples=n, hist_x=32, hist_y=32,
                      stats_max_clusters=128)
    key = jax.random.PRNGKey(0)
    means = 0.1 * jax.random.normal(key, (r, 3))
    covs = jnp.tile(jnp.diag(jnp.array([0.02, 0.02, 0.002])), (r, 1, 1))
    states = fleet_init(params, key, means, covs)
    pools = jnp.zeros((r, n, 3))
    out = {}

    def chain(s, v):
        return s.replace(poses=s.poses + (v * 1e-12)[:, :, None])

    def pick_only(s):
        ks = jax.vmap(lambda k: jax.random.split(k)[0])(s.key)
        rr = jax.vmap(lambda k: jax.random.uniform(k, (n,)))(ks)
        idx = jax.vmap(pf_filter._pick_indices)(s.weights, rr)
        return chain(s, idx.astype(jnp.float32))

    out["pick_ms"] = timed(pick_only, states)

    def pickgather_ms(s):
        ks = jax.vmap(lambda k: jax.random.split(k)[0])(s.key)
        rr = jax.vmap(lambda k: jax.random.uniform(k, (n,)))(ks)
        idx = jax.vmap(pf_filter._pick_indices)(s.weights, rr)
        picked = jax.vmap(mxu_gather.gather_rows)(s.poses, idx)
        return chain(s, picked[:, :, 0])

    out["pick_plus_gather_ms"] = timed(pickgather_ms, states)

    def firstocc_only(s):
        ones = jnp.ones((n,), bool)

        def one(poses):
            _, flat = kld.grid_cells(kld.bin_keys(poses), ones, params.hist_shape)
            return kld.first_occurrence_flags(flat, ones, params.hist_shape)

        return chain(s, jax.vmap(one)(s.poses).astype(jnp.float32))

    out["kld_firstocc_ms"] = timed(firstocc_only, states)

    def stats_only(s):
        st = jax.vmap(
            lambda p, w, na: pf_cluster.compute_cluster_stats(
                p, w, jnp.arange(n) < na, params)
        )(s.poses, s.weights, s.n_active)
        return chain(s, st.particle_cluster.astype(jnp.float32))

    out["cluster_stats_ms"] = timed(stats_only, states)

    def resample_full(s):
        return jax.vmap(
            lambda st, pool: pf_filter.resample(st, params, pool)
        )(s, pools)

    out["resample_full_vmapped_ms"] = timed(resample_full, states)

    def resample_composite(s):
        return pf_filter.fleet_resample(s, params, pools)

    out["resample_full_composite_ms"] = timed(resample_composite, states)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
