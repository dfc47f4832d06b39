"""Fused single-robot MCL step — the framework's "forward pass".

One jitted function covering the reference's full per-scan hot path
(SURVEY.md §3.1): motion update -> measurement update -> KLD resample ->
cluster statistics -> convergence. This is the unit the benchmarks measure
and the fleet layer vmaps/shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from badger_amcl_tpu.maps.occupancy_2d import OccupancyMap2D
from badger_amcl_tpu.pf import filter as pf_filter
from badger_amcl_tpu.pf.filter import ResampleModel
from badger_amcl_tpu.pf.types import MCLState, PFParams
from badger_amcl_tpu.sensors import odom as odom_models
from badger_amcl_tpu.sensors.planar import (
    PlanarScan,
    PlanarScanParams,
    planar_likelihood,
    planar_likelihood_cells,
)


def mcl_step_2d(
    state: MCLState,
    omap: OccupancyMap2D,
    scan_params: PlanarScanParams,
    scan: PlanarScan,
    random_pose_pool: jnp.ndarray,
    odom_pose: jnp.ndarray,
    odom_delta: jnp.ndarray,
    absolute_motion: jnp.ndarray,
    alphas: jnp.ndarray,
    params: PFParams,
    odom_model: odom_models.OdomModel = odom_models.OdomModel.DIFF,
    laser_model: str = "likelihood_field",
    resample_model: ResampleModel = ResampleModel.MULTINOMIAL,
    do_resample: bool = True,
    do_beamskip: bool = False,
    backend: str = "xla",
) -> MCLState:
    """One full 2D MCL step. Static args: params, odom_model, laser_model,
    resample_model, do_resample, do_beamskip, backend."""
    state = odom_models.motion_update(
        state, odom_model, tuple(alphas) if isinstance(alphas, (list, tuple)) else alphas,
        odom_pose, odom_delta, absolute_motion,
    )
    p, mf = planar_likelihood(
        omap, scan_params, scan, state.poses, state.active_mask, state.n_active,
        laser_model, converged=state.converged, do_beamskip=do_beamskip,
        backend=backend, fold_factors=True,
    )
    state = pf_filter.sensor_update(state, p, mf)
    if do_resample:
        state = pf_filter.resample(state, params, random_pose_pool, resample_model)
    return state


mcl_step_2d_jit = jax.jit(
    mcl_step_2d,
    static_argnames=(
        "params", "odom_model", "laser_model", "resample_model",
        "do_resample", "do_beamskip", "backend",
    ),
)


def sensor_resample_step(
    state: MCLState,
    omap: OccupancyMap2D,
    scan_params: PlanarScanParams,
    scan: PlanarScan,
    random_pose_pool: jnp.ndarray,
    params: PFParams,
    laser_model: str = "likelihood_field",
    resample_model: ResampleModel = ResampleModel.MULTINOMIAL,
    backend: str = "xla",
    resample_contract: str = "pick",
) -> MCLState:
    """The BASELINE.md benchmark unit: sensor update + KLD resample (no
    motion model), matching 'full sensor-update + KLD-resample step'.

    resample_contract (static): "pick" — the reference-exact per-particle
    multinomial/systematic picks (default); "cell" — the cell-space
    multinomial contract (pf.filter.sensor_resample_cells):
    distribution-identical sampling that reads per-occupied-lattice-cell
    instead of per-particle (the measured ~0.8 ms/step platform floor of
    pick-level resampling at 50k, PERF.md). "cell" requires a corr backend
    + multinomial + a CELL_MODELS laser model, and transparently runs the
    pick-level path on any step whose cloud leaves the cell envelope."""
    if resample_contract == "cell":
        if resample_model != ResampleModel.MULTINOMIAL:
            raise ValueError("cell contract requires multinomial resampling")
        tbl, key_m, ok = planar_likelihood_cells(
            omap, scan_params, scan, state.poses, laser_model, backend
        )

        def classic(ated=None):
            p, mf = planar_likelihood(
                omap, scan_params, scan, state.poses, state.active_mask,
                state.n_active, laser_model, converged=state.converged,
                do_beamskip=False, backend=backend, fold_factors=True,
            )
            s2 = pf_filter.sensor_update(state, p, mf)
            return pf_filter.resample(
                s2, params, random_pose_pool, resample_model)

        return pf_filter.sensor_resample_cells(
            state, params, random_pose_pool, tbl, key_m, ok, classic
        )
    p, mf = planar_likelihood(
        omap, scan_params, scan, state.poses, state.active_mask, state.n_active,
        laser_model, converged=state.converged, do_beamskip=False,
        backend=backend, fold_factors=True,
    )
    state = pf_filter.sensor_update(state, p, mf)
    return pf_filter.resample(state, params, random_pose_pool, resample_model)


sensor_resample_step_jit = jax.jit(
    sensor_resample_step,
    static_argnames=("params", "laser_model", "resample_model", "backend",
                     "resample_contract"),
)


def likelihood_only(
    state: MCLState,
    omap: OccupancyMap2D,
    scan_params: PlanarScanParams,
    scan: PlanarScan,
    laser_model: str = "likelihood_field",
    backend: str = "xla",
):
    """Just the particle x beam likelihood evaluation — the evals/sec metric."""
    p, mf = planar_likelihood(
        omap, scan_params, scan, state.poses, state.active_mask, state.n_active,
        laser_model, converged=state.converged, do_beamskip=False,
        backend=backend, fold_factors=True,
    )
    return p if mf is None else p * mf


likelihood_only_jit = jax.jit(
    likelihood_only, static_argnames=("laser_model", "backend")
)


def default_backend() -> str:
    """"pallas_corr" (stencil-correlation fast mode with automatic exact
    fallbacks) on TPU-family backends, "xla" elsewhere. Force "pallas"
    (windowed, exact up to bf16 texture) or "xla" (exact f32) via
    AMCLConfig.compute_backend when bit-level parity matters more than
    speed."""
    import jax

    return "pallas_corr" if jax.default_backend() in ("tpu", "axon") else "xla"
