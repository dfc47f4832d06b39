"""Fleet step phase timing on the real chip (256 x 10k x 180 default)."""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=256)
    ap.add_argument("--particles", type=int, default=10000)
    ap.add_argument("--beams", type=int, default=180)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu.fleet import fleet_init
    from badger_amcl_tpu.fleet.fleet import _fleet_likelihood
    from badger_amcl_tpu.ops import corr_kernel
    from badger_amcl_tpu.pf import filter as pf_filter
    from badger_amcl_tpu.pf.types import PFParams
    from badger_amcl_tpu.sensors import odom as odom_models
    from badger_amcl_tpu.sensors.planar import PlanarScan, coord_add, map_factors

    r, n, b = args.robots, args.particles, args.beams
    omap, _, _, scan, sp, _ = _build_setup(64, b, 1024)
    params = PFParams(min_samples=n // 100, max_samples=n, hist_x=32, hist_y=32,
                      stats_max_clusters=128)
    key = jax.random.PRNGKey(0)
    means = 0.1 * jax.random.normal(key, (r, 3))
    covs = jnp.tile(jnp.diag(jnp.array([0.02, 0.02, 0.002])), (r, 1, 1))
    states = fleet_init(params, key, means, covs)
    scans = PlanarScan(
        ranges=jnp.tile(scan.ranges, (r, 1)),
        angles=jnp.tile(scan.angles, (r, 1)),
        range_max=jnp.full((r,), float(scan.range_max)),
    )
    pools = jnp.zeros((r, n, 3))
    odp = jnp.zeros((r, 3))
    odd = jnp.tile(jnp.array([0.05, 0.0, 0.01]), (r, 1))
    alphas = jnp.full((5,), 0.05)
    out = {}

    def chain(s, v):
        return s.replace(poses=s.poses + (v * 1e-12)[:, :, None])

    out["motion_ms"] = timed(
        lambda s: jax.vmap(
            lambda st, op, od: odom_models.motion_update(
                st, odom_models.OdomModel.DIFF, alphas, op, od, od)
        )(s, odp, odd), states)

    out["likelihood_ms"] = timed(
        lambda s: chain(s, _fleet_likelihood(
            omap, sp, scans, s, "likelihood_field", "pallas_corr")[0]),
        states)

    valid = (scans.ranges < scans.range_max[:, None]) & ~jnp.isnan(scans.ranges)

    def prepass_only(s):
        spose = coord_add(sp.scanner_pose, s.poses)
        pre = jax.vmap(
            lambda spp, rr, aa, vv: corr_kernel.corr_prepass(omap, spp, rr, aa, vv)
        )(spose, scans.ranges, scans.angles, valid)
        return chain(s, pre["t_slot"].astype(jnp.float32))

    out["prepass_ms"] = timed(prepass_only, states)

    spose0 = coord_add(sp.scanner_pose, states.poses)
    pre0 = jax.vmap(
        lambda spp, rr, aa, vv: corr_kernel.corr_prepass(omap, spp, rr, aa, vv)
    )(spose0, scans.ranges, scans.angles, valid)
    import numpy as np

    print("# fits", bool(jnp.all(pre0["fits"])), "narrow",
          bool(jnp.all(pre0["narrow"])),
          "mean t_n", float(jnp.mean(pre0["t_n"])),
          "mean nv", float(jnp.mean(pre0["nv"])))

    metas = jnp.stack(
        [pre0["t_n"], pre0["j0_narrow"] + corr_kernel.PAD_R,
         pre0["i0"] + corr_kernel.PAD_C, jnp.maximum(pre0["nv"], 1)], axis=1,
    ).astype(jnp.int32)

    def kernel_only(s):
        tables = corr_kernel.fleet_corr_call(
            omap.corr_psi_pad, metas, pre0["off"], n_beams=b,
            rows=corr_kernel.PWIN_R_NARROW)
        return chain(s, tables[:, 0, 0, :1] * jnp.ones((1, n)))

    out["fleet_kernel_only_ms"] = timed(kernel_only, states)

    def mf_only(s):
        mfv = map_factors(omap, sp, s.poses.reshape(r * n, 3)).reshape(r, n)
        return chain(s, mfv)

    out["map_factors_ms"] = timed(mf_only, states)

    out["sensor_update_ms"] = timed(
        lambda s: jax.vmap(pf_filter.sensor_update)(
            s, jnp.ones((r, n)) + s.poses[:, :, 0] * 1e-20, None), states)

    out["resample_ms"] = timed(
        lambda s: jax.vmap(
            lambda st, pool: pf_filter.resample(st, params, pool)
        )(s, pools), states)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
