"""int8-quantized stencil-correlation kernel (ops/corr_kernel.py _kernel_q).

Contract: sum_b psi reconstructed as qstep * acc + nv * qoff with per-tap
rounding <= qstep/2 (int32 accumulation is exact), so the q kernel must
match the f32 corr kernel within nv * qstep / 2. The quantization is the 2D
twin of the reference's uint8 3D distance quantization (octomap.cpp:328-332).

Runs in interpreter mode on CPU (tests/conftest.py); the on-hardware value
contract is covered by benchmarks/probe_kernels.py's corr_q probe.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from badger_amcl_tpu.maps import CellState, OccupancyMap2D
from badger_amcl_tpu.ops import corr_kernel
from badger_amcl_tpu.sensors.planar import (
    PlanarScan, PlanarScanParams, bake_corr_texture, planar_likelihood,
)


@pytest.fixture(scope="module")
def big_map():
    rng = np.random.default_rng(11)
    n = 448
    cells = np.full((n, n), int(CellState.FREE), np.int8)
    cells[0:2, :] = cells[-2:, :] = int(CellState.OCCUPIED)
    cells[:, 0:2] = cells[:, -2:] = int(CellState.OCCUPIED)
    for _ in range(12):
        cx, cy = rng.integers(20, n - 28, 2)
        cells[cy : cy + 6, cx : cx + 6] = int(CellState.OCCUPIED)
    return OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)


def _scan(b=64, range_max=6.0):
    angles = jnp.linspace(-2.2, 2.2, b).astype(jnp.float32)
    ranges = jnp.clip(2.0 + jnp.sin(angles * 5.0), 0.3, range_max - 0.1)
    return PlanarScan(ranges=ranges, angles=angles,
                      range_max=jnp.float32(range_max))


def _poses(n, seed, center=(0.0, 0.0), xy_sig=0.15, yaw_sig=0.04):
    key = jax.random.PRNGKey(seed)
    return jnp.concatenate(
        [jnp.array(center) + xy_sig * jax.random.normal(key, (n, 2)),
         yaw_sig * jax.random.normal(key, (n, 1))],
        axis=1,
    ).astype(jnp.float32)


def _q_vs_f32(omap_b, poses, scan):
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = corr_kernel.corr_prepass(
        omap_b, poses, scan.ranges, scan.angles, valid)
    assert bool(pre["fits"])
    s32 = corr_kernel.corr_values(
        omap_b, omap_b.corr_psi_pad, poses, scan.ranges, scan.angles,
        valid, pre, interpret=True,
    )
    sq = corr_kernel.corr_values_q(
        omap_b.corr_psi_pad_q, omap_b.corr_psi_q, scan.ranges, pre,
        interpret=True,
    )
    qstep = float(omap_b.corr_psi_q[0])
    nv = int(pre["nv"])
    bound = nv * qstep * 0.5 * 1.01 + 1e-5
    diff = np.abs(np.asarray(sq, np.float64) - np.asarray(s32, np.float64))
    return diff, bound


def test_q_kernel_matches_f32_within_quantization(big_map):
    params = PlanarScanParams()
    scan = _scan()
    omap_b = bake_corr_texture(big_map, params, float(scan.range_max),
                               "likelihood_field")
    assert omap_b.corr_psi_pad_q is not None
    diff, bound = _q_vs_f32(omap_b, _poses(400, 3), scan)
    assert diff.max() <= bound, (diff.max(), bound)


def test_q_kernel_standard_window_variant(big_map):
    """A cloud with > 32-cell row span rides the 64-row q variant."""
    params = PlanarScanParams()
    scan = _scan()
    omap_b = bake_corr_texture(big_map, params, float(scan.range_max),
                               "likelihood_field")
    poses = _poses(300, 5, xy_sig=0.55)  # ~44-cell span at 5 cm
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = corr_kernel.corr_prepass(
        omap_b, poses, scan.ranges, scan.angles, valid)
    assert bool(pre["fits"]) and not bool(pre["narrow"])
    diff, bound = _q_vs_f32(omap_b, poses, scan)
    assert diff.max() <= bound, (diff.max(), bound)


def test_q_at_map_edges(big_map):
    """Origin clamping: q active-region slices at all four map corners."""
    params = PlanarScanParams()
    scan = _scan(32, range_max=4.0)
    omap_b = bake_corr_texture(big_map, params, float(scan.range_max),
                               "likelihood_field")
    res = big_map.resolution
    half_w = big_map.size_x // 2 * res
    for corner in ((-half_w + 0.6, -half_w + 0.6),
                   (half_w - 0.7, -half_w + 0.6),
                   (-half_w + 0.6, half_w - 0.7),
                   (half_w - 0.7, half_w - 0.7)):
        diff, bound = _q_vs_f32(
            omap_b, _poses(120, hash(corner) % (2**31), center=corner), scan)
        assert diff.max() <= bound, (corner, diff.max(), bound)


def test_q_through_backend_estimator(big_map):
    """planar_likelihood with backend="pallas_corr_q_interpret" on a BAKED
    map rides the q path (opt-in; the default pallas_corr path stays f32 —
    measured faster at the flagship shape); the estimator contract vs exact
    XLA matches the f32 corr test's tolerances."""
    params = PlanarScanParams()
    scan = _scan()
    poses = _poses(400, 7)
    n = poses.shape[0]
    for model in ("likelihood_field", "likelihood_field_gompertz"):
        omap_b = bake_corr_texture(big_map, params, float(scan.range_max),
                                   model)
        assert omap_b.corr_psi_pad_q is not None
        p_x, _ = planar_likelihood(
            big_map, params, scan, poses, jnp.ones((n,), bool),
            jnp.int32(n), model,
        )
        p_q, _ = planar_likelihood(
            omap_b, params, scan, poses, jnp.ones((n,), bool),
            jnp.int32(n), model, backend="pallas_corr_q_interpret",
        )
        px, pq = np.asarray(p_x, np.float64), np.asarray(p_q, np.float64)
        rel = np.abs(pq - px) / np.maximum(np.abs(px), 1e-12)
        assert rel.max() < 0.3, (model, rel.max())
        assert rel.mean() < 0.08, (model, rel.mean())
        wx, wq = px / px.sum(), pq / pq.sum()
        mean_x = (wx[:, None] * np.asarray(poses)).sum(0)
        mean_q = (wq[:, None] * np.asarray(poses)).sum(0)
        np.testing.assert_allclose(mean_q, mean_x, atol=5e-3)


def test_dedup_taps_value_identical(big_map):
    """Weighted tap dedup reassociates the psi sum only: q results are
    BIT-identical (exact int32 accumulation), f32 within reassociation ulps.
    A dense 720-beam scan at short range dedups heavily (the win case)."""
    params = PlanarScanParams()
    angles = jnp.linspace(-2.35, 2.35, 720).astype(jnp.float32)
    ranges = jnp.clip(2.0 + 0.5 * jnp.sin(angles * 3.0), 0.2, 5.9)
    scan = PlanarScan(ranges=ranges, angles=angles,
                      range_max=jnp.float32(6.0))
    omap_b = bake_corr_texture(big_map, params, float(scan.range_max),
                               "likelihood_field")
    poses = _poses(300, 9)
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre0 = corr_kernel.corr_prepass(
        omap_b, poses, scan.ranges, scan.angles, valid, dedup=False)
    pre1 = corr_kernel.corr_prepass(
        omap_b, poses, scan.ranges, scan.angles, valid, dedup=True)
    taps0 = int(pre0["t_n"]) * int(pre0["nv"])
    taps1 = int(jnp.sum(pre1["nu"][: int(pre1["t_n"])]))
    assert taps1 < taps0 * 0.6, (taps0, taps1)  # >= 1.7x dedup on this scan
    s0 = corr_kernel.corr_values(
        omap_b, omap_b.corr_psi_pad, poses, scan.ranges, scan.angles,
        valid, pre0, interpret=True)
    s1 = corr_kernel.corr_values(
        omap_b, omap_b.corr_psi_pad, poses, scan.ranges, scan.angles,
        valid, pre1, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-4, atol=1e-4)
    q0 = corr_kernel.corr_values_q(
        omap_b.corr_psi_pad_q, omap_b.corr_psi_q, scan.ranges, pre0,
        interpret=True)
    q1 = corr_kernel.corr_values_q(
        omap_b.corr_psi_pad_q, omap_b.corr_psi_q, scan.ranges, pre1,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))


def test_prob_model_stays_f32(big_map):
    """likelihood_field_prob never bakes a q texture (exp(sum) amplifies
    correlated quantization rounding)."""
    omap_b = bake_corr_texture(big_map, PlanarScanParams(), 6.0,
                               "likelihood_field_prob")
    assert omap_b.corr_psi_pad is not None
    assert omap_b.corr_psi_pad_q is None
    assert omap_b.corr_psi_q is None


def test_uniform_texture_degenerate():
    """hi == lo (no obstacles in range -> constant psi) must not divide by
    zero: all q = -127, s = nv * lo exactly."""
    cells = np.full((256, 448), int(CellState.FREE), np.int8)
    omap = OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)
    tex = jnp.full((omap.size_y, omap.size_x), 0.625, jnp.float32)
    pad_q, qscale = corr_kernel.build_tex_pad_q(omap, tex, jnp.float32(0.625))
    assert np.all(np.asarray(pad_q) == -127)
    s = np.asarray(qscale)
    # acc = -127 * nv -> s = -127 * nv * qstep + nv * (lo + 127 qstep) = nv * lo
    np.testing.assert_allclose(-127 * s[0] + s[1], 0.625, rtol=1e-6)


def test_preshift_full_dma_path_bit_equal(big_map):
    """The baked full-texture preshifted copies + in-kernel dynamic-origin
    DMA (corr_kernel._kernel_pre) return BIT-EQUAL values to the per-call
    preshifted_slices build across all three window-height variants — the
    DMA'd active region is the same bytes the slices held."""
    params = PlanarScanParams()
    scan = _scan(b=96)
    omap_b = bake_corr_texture(big_map, params, float(scan.range_max),
                               "likelihood_field")
    assert omap_b.corr_psi_pre is not None
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    for xy_sig, tag in ((0.12, "tight"), (0.23, "narrow"), (0.42, "std")):
        poses = _poses(400, 5, center=(1.0, -0.5), xy_sig=xy_sig)
        pre = corr_kernel.corr_prepass(
            omap_b, poses, scan.ranges, scan.angles, valid, dedup=True)
        assert bool(pre["fits"]), tag
        if tag == "tight":
            assert bool(pre["tight"])
        elif tag == "narrow":
            assert bool(pre["narrow"]) and not bool(pre["tight"])
        else:
            assert not bool(pre["narrow"])
        args = (omap_b, omap_b.corr_psi_pad, poses, scan.ranges,
                scan.angles, valid, pre)
        v_old = corr_kernel.corr_values(*args, interpret=True)
        v_new = corr_kernel.corr_values(*args, interpret=True,
                                        tex_pre=omap_b.corr_psi_pre)
        np.testing.assert_array_equal(np.asarray(v_new), np.asarray(v_old),
                                      err_msg=tag)


def test_preshift_full_dma_at_map_edges():
    """Pre-DMA path at map corners on an ODD-sized map (450 x 470): the
    aligned-pad clamp bounds in slice_origin_pre are exactly what keeps the
    in-kernel DMA origin provably 8/128-aligned when the window clamps at
    the bottom/right edges — compare bit-equal against the per-call slice
    path everywhere."""
    rng = np.random.default_rng(3)
    h, w = 450, 470  # h % 8 == 2, w % 128 == 86: both pads exercised
    cells = np.full((h, w), int(CellState.FREE), np.int8)
    cells[0:2, :] = cells[-2:, :] = int(CellState.OCCUPIED)
    cells[:, 0:2] = cells[:, -2:] = int(CellState.OCCUPIED)
    for _ in range(10):
        cx = rng.integers(20, w - 28)
        cy = rng.integers(20, h - 28)
        cells[cy:cy + 6, cx:cx + 6] = int(CellState.OCCUPIED)
    omap = OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)
    params = PlanarScanParams()
    scan = _scan(48)
    omap_b = bake_corr_texture(omap, params, float(scan.range_max),
                               "likelihood_field")
    assert omap_b.corr_psi_pre.shape[1] % 8 == 0
    assert omap_b.corr_psi_pre.shape[2] % 128 == 0
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    res = omap.resolution
    xmax, ymax = w // 2 * res, h // 2 * res
    corners = [(-xmax + 0.6, -ymax + 0.6), (xmax - 0.7, -ymax + 0.6),
               (-xmax + 0.6, ymax - 0.7), (xmax - 0.7, ymax - 0.7),
               (0.0, 0.0)]
    for corner in corners:
        key = jax.random.PRNGKey(hash(corner) % (2 ** 31))
        poses = jnp.concatenate([
            jnp.array(corner) + 0.1 * jax.random.normal(key, (100, 2)),
            0.04 * jax.random.normal(key, (100, 1)),
        ], axis=1).astype(jnp.float32)
        pre = corr_kernel.corr_prepass(
            omap_b, poses, scan.ranges, scan.angles, valid, dedup=True)
        assert bool(pre["fits"]), corner
        args = (omap_b, omap_b.corr_psi_pad, poses, scan.ranges,
                scan.angles, valid, pre)
        v_old = corr_kernel.corr_values(*args, interpret=True)
        v_new = corr_kernel.corr_values(*args, interpret=True,
                                        tex_pre=omap_b.corr_psi_pre)
        np.testing.assert_array_equal(np.asarray(v_new), np.asarray(v_old),
                                      err_msg=str(corner))
