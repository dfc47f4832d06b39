"""Range image + lattice beam kernel vs the exact Bresenham beam model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from badger_amcl_tpu.maps import CellState, OccupancyMap2D
from badger_amcl_tpu.maps.range_image import build_range_image
from badger_amcl_tpu.ops import beam_kernel
from badger_amcl_tpu.sensors.planar import PlanarScan, PlanarScanParams, planar_likelihood
from badger_amcl_tpu.sensors.raycast import calc_range


@pytest.fixture(scope="module")
def beam_map():
    rng = np.random.default_rng(6)
    n = 320
    cells = np.full((n, n), int(CellState.FREE), np.int8)
    cells[0:2, :] = cells[-2:, :] = int(CellState.OCCUPIED)
    cells[:, 0:2] = cells[:, -2:] = int(CellState.OCCUPIED)
    for _ in range(12):
        cx, cy = rng.integers(20, n - 28, 2)
        cells[cy : cy + 6, cx : cx + 6] = int(CellState.OCCUPIED)
    m = OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)
    return m.with_range_image(n_angles=256)


def test_range_image_matches_raycast(beam_map):
    """Range image values vs exact calcRange over random poses/angles:
    agreement within the angle-bin + resampling tolerance."""
    k_angles = beam_map.range_image.shape[0]
    rng = np.random.default_rng(1)
    n = 300
    # sample FREE cells away from walls
    ii = rng.integers(30, 290, n)
    jj = rng.integers(30, 290, n)
    ks = rng.integers(0, k_angles, n)
    thetas = 2 * np.pi * ks / k_angles
    world = np.asarray(beam_map.map_to_world(jnp.stack([jnp.asarray(ii), jnp.asarray(jj)], axis=1)))
    exact = np.asarray(calc_range(
        beam_map, jnp.asarray(world[:, 0]), jnp.asarray(world[:, 1]),
        jnp.asarray(thetas, jnp.float32), 16.0,
    ))
    ri = np.asarray(beam_map.range_image)
    got = ri[ks, jj, ii] * beam_map.resolution
    free_mask = np.asarray(beam_map.cells)[jj, ii] == int(CellState.FREE)
    err = np.abs(np.minimum(got, 16.0) - exact)[free_mask]
    # discontinuities (grazing corners) produce outliers; the bulk must agree
    assert np.median(err) <= 0.1, np.median(err)
    assert (err < 0.3).mean() > 0.85, (err < 0.3).mean()


@pytest.mark.slow
def test_beam_kernel_estimator_agreement(beam_map):
    """Lattice beam kernel vs exact beam model: per-particle deviations are
    bounded-ish; the weighted-mean estimator must agree."""
    key = jax.random.PRNGKey(0)
    n = 400
    poses = jnp.concatenate(
        [0.12 * jax.random.normal(key, (n, 2)), 0.04 * jax.random.normal(key, (n, 1))],
        axis=1,
    ).astype(jnp.float32)
    b = 48
    angles = jnp.linspace(-2.0, 2.0, b).astype(jnp.float32)
    # realistic observations: raycast from the cloud center
    obs = calc_range(beam_map, jnp.zeros(b), jnp.zeros(b), angles, 8.0)
    scan = PlanarScan(ranges=jnp.asarray(obs), angles=angles, range_max=jnp.float32(8.0))
    params = PlanarScanParams()
    act = jnp.ones((n,), bool)
    p_x, _ = planar_likelihood(beam_map, params, scan, poses, act, jnp.int32(n), "beam")
    p_k, _ = planar_likelihood(beam_map, params, scan, poses, act, jnp.int32(n), "beam",
                               backend="pallas_corr_interpret")
    px, pk = np.asarray(p_x, np.float64), np.asarray(p_k, np.float64)
    assert not np.allclose(px, pk)  # the fast path actually ran
    wx, wk = px / px.sum(), pk / pk.sum()
    mean_x = (wx[:, None] * np.asarray(poses)).sum(0)
    mean_k = (wk[:, None] * np.asarray(poses)).sum(0)
    np.testing.assert_allclose(mean_k[:2], mean_x[:2], atol=0.02)


@pytest.mark.slow
def test_beam_kernel_spread_routes_to_spread_kernel(beam_map):
    """A spread cloud exceeds the lattice kernel's envelope; since round 4
    it routes to the sigma-sorted spread kernel (ops/beam_spread_kernel.py)
    instead of the exact Bresenham bundle — values agree with the exact
    model to slab-quantization tolerance (NOT bit-equal; the exact path
    stays the contract when no range_rows bake exists, covered by
    test_no_range_image_uses_exact_path)."""
    key = jax.random.PRNGKey(2)
    poses = jnp.concatenate(
        [jax.random.uniform(key, (100, 2), minval=-7, maxval=7),
         jax.random.uniform(key, (100, 1), minval=-3, maxval=3)],
        axis=1,
    ).astype(jnp.float32)
    pre = beam_kernel.beam_prepass(beam_map, poses)
    assert not bool(pre["fits"])
    assert beam_map.range_rows is not None
    b = 32
    angles = jnp.linspace(-1.5, 1.5, b).astype(jnp.float32)
    scan = PlanarScan(ranges=jnp.full((b,), 2.0), angles=angles,
                      range_max=jnp.float32(8.0))
    act = jnp.ones((100,), bool)
    p_k, _ = planar_likelihood(beam_map, PlanarScanParams(), scan, poses, act,
                               jnp.int32(100), "beam", backend="pallas_corr_interpret")
    p_x, _ = planar_likelihood(beam_map, PlanarScanParams(), scan, poses, act,
                               jnp.int32(100), "beam")
    pk, px = np.asarray(p_k, np.float64), np.asarray(p_x, np.float64)
    # engaged (not the exact path) but close to it
    assert not np.allclose(pk, px, rtol=1e-6)
    assert np.corrcoef(pk, px)[0, 1] > 0.9
    rel = np.abs(pk - px) / np.maximum(px, 1.0)
    assert np.median(rel) < 0.15, np.median(rel)


def test_no_range_image_uses_exact_path(box_map):
    """Without a baked range image the corr backend must silently use the
    exact Bresenham path."""
    poses = jnp.zeros((10, 3), jnp.float32)
    b = 16
    angles = jnp.linspace(-1.0, 1.0, b).astype(jnp.float32)
    scan = PlanarScan(ranges=jnp.full((b,), 1.0), angles=angles,
                      range_max=jnp.float32(5.0))
    act = jnp.ones((10,), bool)
    p_k, _ = planar_likelihood(box_map, PlanarScanParams(), scan, poses, act,
                               jnp.int32(10), "beam", backend="pallas_corr_interpret")
    p_x, _ = planar_likelihood(box_map, PlanarScanParams(), scan, poses, act,
                               jnp.int32(10), "beam")
    np.testing.assert_array_equal(np.asarray(p_k), np.asarray(p_x))


# --- spread-cloud beam kernel (ops/beam_spread_kernel.py) -------------------


@pytest.mark.slow
def test_beam_spread_kernel_matches_slab_reference(beam_map):
    """The sigma-sorted spread kernel must reproduce, to f32 reassociation
    tolerance, the direct sigma+kappa slab formulation it implements:
    p = 1 + sum_b pz(obs_b, min(RI[(sigma_p + kappa_b) % K, j_p, i_p]*res,
    rmax))^3 (the beam-model GL path, planar_scanner.cpp:168-234)."""
    from badger_amcl_tpu.ops import beam_spread_kernel as bsk

    m, b = 12288, 60
    rng = np.random.default_rng(9)
    poses = np.stack([
        rng.uniform(-7.0, 7.0, m), rng.uniform(-7.0, 7.0, m),
        rng.uniform(-np.pi, np.pi, m)], axis=1).astype(np.float32)
    spose = jnp.asarray(poses)
    angles = jnp.linspace(-2.2, 2.2, b).astype(jnp.float32)
    true_r = calc_range(beam_map, jnp.float32(1.0), jnp.float32(-2.0),
                        angles + 0.4, 8.0)
    ranges = jnp.clip(true_r, 0.2, 8.0).astype(jnp.float32)
    scan = PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(8.0))
    params = PlanarScanParams()

    pre = bsk.beam_spread_prepass(beam_map, spose, scan)
    assert bool(pre["fits"]), "uniform spread cloud must fit the span window"
    got = np.asarray(bsk.beam_spread_values(
        beam_map, params, scan, spose, pre, interpret=True))

    # direct reference with the SAME slab rounding
    k = int(beam_map.range_image.shape[0])
    ri = np.asarray(beam_map.range_image)
    ij = np.asarray(beam_map.world_to_map(spose[:, :2]))
    ci = np.clip(ij[:, 0], 0, beam_map.size_x - 1)
    cj = np.clip(ij[:, 1], 0, beam_map.size_y - 1)
    bin_inv = k / (2 * np.pi)
    sig = np.mod(np.round(poses[:, 2] * bin_inv).astype(np.int64), k)
    kap = np.mod(np.round(np.asarray(angles) * bin_inv).astype(np.int64), k)
    slabs = np.mod(sig[:, None] + kap[None, :], k)  # (M, B)
    v = ri[slabs, cj[:, None], ci[:, None]].astype(np.float64)
    map_r = np.minimum(v * beam_map.resolution, 8.0)
    obs = np.asarray(ranges, np.float64)[None, :]
    z = obs - map_r
    p0 = np.asarray(params.z_hit) * np.exp(-(z * z) / (2 * float(params.sigma_hit) ** 2))
    p0 += np.where(z < 0, float(params.z_short) * float(params.lambda_short)
                   * np.exp(-float(params.lambda_short) * obs), 0.0)
    p0 += np.where(obs == 8.0, float(params.z_max), 0.0)
    p0 += np.where(obs < 8.0, float(params.z_rand) / 8.0, 0.0)
    ref = 1.0 + (p0 ** 3).sum(axis=1)

    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_beam_spread_engages_in_dispatch(beam_map):
    """A big spread cloud through planar_likelihood(beam) must route to the
    spread kernel (values match the slab formulation, NOT the exact path —
    which stays the contract for small clouds) and agree with the exact
    Bresenham model at the estimator level."""
    from badger_amcl_tpu.sensors.planar import planar_likelihood

    m, b = 12288, 48
    rng = np.random.default_rng(4)
    poses = np.stack([
        rng.uniform(-7.0, 7.0, m), rng.uniform(-7.0, 7.0, m),
        rng.uniform(-np.pi, np.pi, m)], axis=1).astype(np.float32)
    spose = jnp.asarray(poses)
    angles = jnp.linspace(-2.0, 2.0, b).astype(jnp.float32)
    true_r = calc_range(beam_map, jnp.float32(0.5), jnp.float32(1.0),
                        angles - 1.0, 8.0)
    scan = PlanarScan(ranges=jnp.clip(true_r, 0.2, 8.0).astype(jnp.float32),
                      angles=angles, range_max=jnp.float32(8.0))
    act = jnp.ones((m,), bool)
    p_k, _ = planar_likelihood(beam_map, PlanarScanParams(), scan, spose, act,
                               jnp.int32(m), "beam",
                               backend="pallas_corr_interpret")
    p_x, _ = planar_likelihood(beam_map, PlanarScanParams(), scan, spose, act,
                               jnp.int32(m), "beam")
    pk = np.asarray(p_k, np.float64)
    px = np.asarray(p_x, np.float64)
    # estimator-level: posterior means close, high correlation
    wk, wx = pk / pk.sum(), px / px.sum()
    mk = (wk[:, None] * poses).sum(0)
    mx = (wx[:, None] * poses).sum(0)
    assert np.hypot(*(mk[:2] - mx[:2])) < 0.25, (mk, mx)
    c = np.corrcoef(pk, px)[0, 1]
    assert c > 0.95, c


def test_beam_spread_nan_beam_poisons_all_particles(beam_map):
    """Preserved reference quirk: calcBeamModel has NO NaN-beam skip
    (planar_scanner.cpp:168-234; the NaN skip at :281-282 is the LF models'),
    so a NaN range poisons p for every particle and drives the filter's
    zero-total uniform reset. The spread kernel arm must match its exact
    fallback arm here (advisor round-4 medium finding)."""
    from badger_amcl_tpu.ops import beam_spread_kernel as bsk

    m, b = 256, 24
    rng = np.random.default_rng(3)
    poses = np.stack([
        rng.uniform(-7.0, 7.0, m), rng.uniform(-7.0, 7.0, m),
        rng.uniform(-np.pi, np.pi, m)], axis=1).astype(np.float32)
    spose = jnp.asarray(poses)
    angles = jnp.linspace(-2.0, 2.0, b).astype(jnp.float32)
    ranges = np.full((b,), 3.0, np.float32)
    ranges[7] = np.nan
    scan = PlanarScan(ranges=jnp.asarray(ranges), angles=angles,
                      range_max=jnp.float32(8.0))
    pre = bsk.beam_spread_prepass(beam_map, spose, scan)
    got = np.asarray(bsk.beam_spread_values(
        beam_map, PlanarScanParams(), scan, spose, pre, interpret=True))
    assert np.all(np.isnan(got)), "NaN beam must poison every particle"
