"""On-chip backend parity: pallas_corr (and its spread path) vs exact XLA.

Runs on the real TPU. For each bench regime and LF-family model, feeds the
SAME state/scan/pool/key through the fast backend and the exact f32 XLA
path and reports posterior-level divergence — the quantities MCL publishes:

- TV distance between the normalized weight distributions after the
  sensor update (the likelihood's only effect on the filter)
- weighted mean pose / covariance deltas
- max-weight cluster mean + weight deltas after a full
  sensor+KLD-resample step (identical PRNG keys, so resampling variates
  match; remaining differences are backend-induced)

Compiled once per (model, backend) and reused across regimes (regimes only
change array VALUES). Prints one JSON blob; PARITY.md records the table.
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

REGIMES = (
    ("steady", (0.004, 0.004, 0.0004)),
    ("tracking", (0.02, 0.02, 0.002)),
    ("spread", (2.0, 2.0, 1.0)),
)


def _posterior_stats(pf_filter, np, state, s1, full):
    """The published posterior quantities for one backend run."""
    w = np.asarray(s1.weights, np.float64)
    poses = np.asarray(state.poses, np.float64)
    mean = (w[:, None] * poses).sum(0)
    d = poses - mean
    covm = (w[:, None, None] * d[:, :, None] * d[:, None, :]).sum(0)
    wmax, cmean = pf_filter.max_weight_cluster(full.stats)
    return dict(
        w=w, mean=mean, cov=covm,
        cluster_w=float(wmax), cluster_mean=np.asarray(cmean),
        n_active=int(full.n_active),
    )


def _compare(np, a, b):
    return {
        "weight_tv": float(0.5 * np.abs(a["w"] - b["w"]).sum()),
        "mean_dxy_m": float(np.hypot(*(a["mean"][:2] - b["mean"][:2]))),
        "mean_dyaw_rad": float(abs(a["mean"][2] - b["mean"][2])),
        "cov_rel_fro": float(
            np.linalg.norm(a["cov"] - b["cov"])
            / max(np.linalg.norm(a["cov"]), 1e-12)),
        "cluster_mean_dxy_m": float(
            np.hypot(*(a["cluster_mean"][:2] - b["cluster_mean"][:2]))),
        "cluster_w_delta": float(abs(a["cluster_w"] - b["cluster_w"])),
        "kld_n_active": (a["n_active"], b["n_active"]),
    }


def run():
    import dataclasses

    import jax
    import numpy as np

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu import mcl
    from badger_amcl_tpu.pf import filter as pf_filter
    from badger_amcl_tpu.sensors.planar import bake_corr_texture, planar_likelihood

    @functools.partial(jax.jit, static_argnames=("model", "backend"))
    def sensor_only(state, omap, scan_params, scan, model, backend):
        p, mf = planar_likelihood(
            omap, scan_params, scan, state.poses, state.active_mask,
            state.n_active, model, converged=state.converged, backend=backend,
        )
        return pf_filter.sensor_update(state, p, mf)

    results = {}
    for model in ("likelihood_field", "likelihood_field_prob",
                  "likelihood_field_gompertz"):
        # 720 beams underflow the prob model's log-space product to the
        # zero-total uniform reset (the reference's doubles underflow at
        # e^-710 too — it runs prob with max_beams ~30-60), so parity for
        # prob is measured at a realistic beam count.
        beams = 60 if model == "likelihood_field_prob" else 720
        for regime, cov in REGIMES:
            # the cloud sits ~2 m from the west wall so the fixed scan is
            # discriminative (at the empty map center every endpoint reads
            # max_distance and all weights go uniform — degenerate parity)
            mean = (-23.0, 0.0, 2.6)
            omap, params, state, scan, scan_params, pool = _build_setup(
                50_000, beams, 1024, pose_cov=cov, min_particles=50_000,
                pose_mean=mean,
            )
            omap = dataclasses.replace(
                omap, corr_psi_pad=None, corr_psi_key=None)
            omap = bake_corr_texture(omap, scan_params, 8.0, model)
            # the scan must be CONSISTENT with the map or no particle
            # matches and the prob model's log-product underflows the whole
            # set to the zero-total uniform reset: raycast it from the true
            # pose (what a real sensor would return)
            from badger_amcl_tpu.sensors import raycast
            import jax.numpy as jnp

            mean_a = jnp.asarray(mean, jnp.float32)
            rc = raycast.calc_range(
                omap, mean_a[0:1], mean_a[1:2],
                (mean_a[2] + scan.angles)[None, :], scan.range_max,
            )[0]
            scan = scan.replace(ranges=jnp.clip(rc, 0.2, 7.9).astype(jnp.float32))

            post = {}
            for backend in ("xla", "pallas_corr"):
                s1 = sensor_only(state, omap, scan_params, scan, model, backend)
                full = mcl.sensor_resample_step_jit(
                    state, omap, scan_params, scan, pool, params,
                    laser_model=model, backend=backend,
                )
                post[backend] = _posterior_stats(pf_filter, np, state, s1, full)
            out = _compare(np, post["xla"], post["pallas_corr"])
            results[f"{regime}/{model}"] = out
            print(f"# {regime}/{model}: {out}", flush=True)
    return results


def run_3d():
    """The same posterior-divergence table for the 3D backends on chip:
    pallas (windowed voxel kernel -> pc_spread sorted-tile kernel cascade,
    point_cloud_likelihood) vs exact XLA voxel gather. Matches the 3D
    reference hot path point_cloud_scanner.cpp:132-203 over octomap.cpp:
    315-350 storage."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from badger_amcl_tpu.maps import OctoMap3D
    from badger_amcl_tpu.pf import PFParams, init_with_gaussian, sensor_update
    from badger_amcl_tpu.pf import filter as pf_filter
    from badger_amcl_tpu.sensors.point_cloud import (
        PointCloudParams, point_cloud_likelihood,
    )

    # a structured 20 x 20 x 1 m scene: border walls + columns (occupied
    # voxels), so clouds raycast-equivalent sampling is discriminative
    rng = np.random.default_rng(3)
    occ = []
    zz = np.arange(0.05, 1.0, 0.05)
    for t in np.arange(0.05, 20.0, 0.05):
        for z in zz[::3]:
            occ += [(t, 0.1, z), (t, 19.9, z), (0.1, t, z), (19.9, t, z)]
    for _ in range(14):
        cx, cy = rng.uniform(2, 18, 2)
        for dx in np.arange(-0.2, 0.25, 0.05):
            for dy in np.arange(-0.2, 0.25, 0.05):
                for z in zz[::2]:
                    occ.append((cx + dx, cy + dy, z))
    occ = np.asarray(occ, np.float32)
    omap = OctoMap3D.from_occupied_points(
        occ, 0.05, 0.36, metric_min=(0, 0, 0), metric_max=(20, 20, 1.0)
    ).with_distance_field()

    # cloud CONSISTENT with the map: occupied points near the true pose,
    # expressed in the base frame (what a real depth sensor would return)
    true_pose = np.array([6.0, 8.0, 0.7])
    d = np.linalg.norm(occ[:, :2] - true_pose[:2], axis=1)
    near = occ[(d > 0.5) & (d < 6.0)]
    sel = near[rng.choice(len(near), 256, replace=False)]
    c, s = np.cos(-true_pose[2]), np.sin(-true_pose[2])
    rel = sel[:, :2] - true_pose[:2]
    base_xy = np.stack([c * rel[:, 0] - s * rel[:, 1],
                        s * rel[:, 0] + c * rel[:, 1]], axis=1)
    cloud = jnp.asarray(
        np.concatenate([base_xy, sel[:, 2:3]], axis=1), jnp.float32)
    pc_params = PointCloudParams()
    n = 50_000
    params = PFParams(min_samples=n, max_samples=n)
    pool = jnp.zeros((n, 3))

    @functools.partial(jax.jit, static_argnames=("model", "backend"))
    def steps(state, model, backend):
        p, mf = point_cloud_likelihood(
            omap, pc_params, cloud, state.poses, model, backend)
        s1 = sensor_update(state, p, mf)
        full = pf_filter.resample(s1, params, pool)
        return s1, full

    results = {}
    for model in ("likelihood_field", "likelihood_field_gompertz"):
        for regime, cov in REGIMES:
            state = init_with_gaussian(
                params, jax.random.PRNGKey(0), jnp.asarray(true_pose),
                jnp.diag(jnp.asarray(cov, jnp.float32)),
            )
            post = {}
            for backend in ("xla", "pallas"):
                s1, full = steps(state, model, backend)
                post[backend] = _posterior_stats(pf_filter, np, state, s1, full)
            out = _compare(np, post["xla"], post["pallas"])
            results[f"3d/{regime}/{model}"] = out
            print(f"# 3d/{regime}/{model}: {out}", flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="2d,3d", help="comma list: 2d,3d")
    args = ap.parse_args()
    results = {}
    if "2d" in args.what.split(","):
        results.update(run())
    if "3d" in args.what.split(","):
        results.update(run_3d())
    print(json.dumps(results, indent=1))
