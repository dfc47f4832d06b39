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

import functools
import json
import sys

sys.path.insert(0, ".")

REGIMES = (
    ("steady", (0.004, 0.004, 0.0004)),
    ("tracking", (0.02, 0.02, 0.002)),
    ("spread", (2.0, 2.0, 1.0)),
)


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
                w = np.asarray(s1.weights, np.float64)
                poses = np.asarray(state.poses, np.float64)
                mean = (w[:, None] * poses).sum(0)
                d = poses - mean
                covm = (w[:, None, None] * d[:, :, None] * d[:, None, :]).sum(0)
                full = mcl.sensor_resample_step_jit(
                    state, omap, scan_params, scan, pool, params,
                    laser_model=model, backend=backend,
                )
                wmax, cmean = pf_filter.max_weight_cluster(full.stats)
                post[backend] = dict(
                    w=w, mean=mean, cov=covm,
                    cluster_w=float(wmax), cluster_mean=np.asarray(cmean),
                    n_active=int(full.n_active),
                )
            a, b = post["xla"], post["pallas_corr"]
            out = {
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
            results[f"{regime}/{model}"] = out
            print(f"# {regime}/{model}: {out}", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    run()
