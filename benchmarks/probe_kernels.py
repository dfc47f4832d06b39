"""One-command on-hardware value probe for every Pallas kernel.

Why this exists: round 1's corr kernel was silently WRONG on real v5e
(negative `pltpu.roll` shifts miscompile sublane rotates) while every CPU
interpret-mode test stayed green. The regression class is
compiled-on-hardware != interpret semantics, so each probe runs the SAME
tiny inputs through the compiled kernel and through interpret mode on the
chip and compares values; where the kernel has an exact contract
(mxu_gather one-hot ops, spread int8 quantization) it is additionally
checked against a pure-numpy reference — which also catches f32->bf16
operand truncation that CPU tests cannot see (ops/mxu_gather.py).

Run (serialize with any other TPU job!):

    PYTHONPATH=/root/repo python benchmarks/probe_kernels.py

Prints one JSON line: {"ok": bool, "probes": {name: {"ok": b, "max_diff":
d, ...}}}; exit code 0 iff all probes pass. Record the output as
PROBES_r{N}.json before milestone commits (CLAUDE.md rule).
"""

import json
import sys

import numpy as np

import jax

# --cpu-dryrun must flip the platform BEFORE any module below touches a
# device, or the axon backend initializes first and the run hangs on the
# tunnel.
INTERPRET_HW = False
if __name__ == "__main__" and "--cpu-dryrun" in sys.argv:
    INTERPRET_HW = True
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from badger_amcl_tpu.maps import CellState, OccupancyMap2D
from badger_amcl_tpu.maps.octomap_3d import OctoMap3D
from badger_amcl_tpu.ops import (
    beam_kernel, corr_kernel, lf_kernel, mxu_gather, pc_kernel, spread_kernel,
)
from badger_amcl_tpu.sensors.planar import (
    PlanarScan, PlanarScanParams, bake_corr_texture,
)

RESULTS = {}


def probe(name, got, want, tol, frac_exact=None, flip_tol=None):
    """Assert |got-want| <= tol everywhere. With frac_exact/flip_tol set,
    allow a small fraction of entries to deviate up to flip_tol instead —
    for numpy cross-checks where f32-vs-f64 trig flips a cell at floor()
    boundaries (the neighboring cell's distance differs by at most the
    field's Lipschitz bound, far below a wrong-window bug's max_dist-scale
    error)."""
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    diff = np.abs(got - want)
    d = float(np.max(diff)) if got.size else 0.0
    if frac_exact is None:
        ok = d <= tol
        RESULTS[name] = {"ok": bool(ok), "max_diff": d, "tol": tol}
        print(f"  {name:<28s} max_diff={d:.3e} tol={tol:.0e} "
              f"{'ok' if ok else 'FAIL'}", file=sys.stderr)
    else:
        fe = float(np.mean(diff <= tol)) if got.size else 1.0
        ok = fe >= frac_exact and d <= flip_tol
        RESULTS[name] = {"ok": bool(ok), "max_diff": d, "tol": tol,
                         "frac_exact": fe, "frac_exact_req": frac_exact,
                         "flip_tol": flip_tol}
        print(f"  {name:<28s} max_diff={d:.3e} frac_exact={fe:.4f} "
              f"{'ok' if ok else 'FAIL'}", file=sys.stderr)


def make_map(n=512, seed=11):
    rng = np.random.default_rng(seed)
    cells = np.full((n, n), int(CellState.FREE), np.int8)
    cells[0:2, :] = cells[-2:, :] = int(CellState.OCCUPIED)
    cells[:, 0:2] = cells[:, -2:] = int(CellState.OCCUPIED)
    for _ in range(24):
        cx, cy = rng.integers(16, n - 24, 2)
        cells[cy:cy + 6, cx:cx + 6] = int(CellState.OCCUPIED)
    return OccupancyMap2D.from_cells(cells, 0.05).with_distance_field(2.0)


def scan_of(b, rmax=6.0, rcap=2.5):
    angles = jnp.linspace(-2.2, 2.2, b).astype(jnp.float32)
    ranges = jnp.clip(2.0 + jnp.sin(angles * 5.0), 0.3, rcap)
    return PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(rmax))


def cloud(n, sx, sy, sth, seed=0, center=(0.0, 0.0, 0.0)):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    c = jnp.asarray(center, jnp.float32)
    return jnp.stack([
        c[0] + sx * jax.random.normal(k1, (n,)),
        c[1] + sy * jax.random.normal(k2, (n,)),
        c[2] + sth * jax.random.normal(k3, (n,)),
    ], axis=1).astype(jnp.float32)


# ---------------------------------------------------------------- mxu_gather


def probe_mxu_gather():
    rng = np.random.default_rng(0)
    # values that NEED full f32 mantissa: 1 + k*2^-20 is destroyed by bf16
    data = (1.0 + rng.integers(0, 1000, (300, 3)) * 2.0 ** -20).astype(np.float32)
    idx = rng.integers(0, 300, 700).astype(np.int32)
    got = mxu_gather.gather_rows(jnp.asarray(data), jnp.asarray(idx))
    probe("mxu.gather_rows", got, data[idx], 0.0)

    vals = (1.0 + rng.integers(0, 1000, (9, 400)) * 2.0 ** -20).astype(np.float32)
    ids = rng.integers(0, 16, 400).astype(np.int32)
    got = mxu_gather.segment_sums_small(jnp.asarray(vals), jnp.asarray(ids), 16)
    want = np.zeros((9, 16), np.float64)
    for q in range(400):
        want[:, ids[q]] += vals[:, q]
    # sums of ~25 f32 terms: tiny association slack, but bf16 truncation
    # of the operands would show up at ~1e-3
    probe("mxu.segment_sums_small", got, want, 1e-5)

    table = (1.0 + rng.integers(0, 1000, (300,)) * 2.0 ** -20).astype(np.float32)
    qids = rng.integers(0, 300, 900).astype(np.int32)
    got = mxu_gather.broadcast_small(jnp.asarray(table), jnp.asarray(qids))
    probe("mxu.broadcast_small", got, table[qids], 0.0)

    win = (rng.integers(0, 4000, (32, 128)) * 2.0 ** -20 + 1.0).astype(np.float32)
    rows = rng.integers(0, 32, 500).astype(np.int32)
    cols = rng.integers(0, 128, 500).astype(np.int32)
    got = mxu_gather.window_values(jnp.asarray(win), jnp.asarray(rows),
                                   jnp.asarray(cols))
    probe("mxu.window_values", got, win[rows, cols], 0.0)


# ------------------------------------------------------------------ lf / pc


def probe_lf(omap):
    poses = cloud(600, 0.15, 0.15, 0.04, seed=1)
    scan = scan_of(48, rcap=5.9)
    _, _, fits = lf_kernel.window_origins(omap, poses, scan.ranges, scan.angles)
    assert bool(fits), "lf probe cloud must fit the window"
    hw = lf_kernel.lf_distances(omap, poses, scan.ranges, scan.angles,
                                interpret=INTERPRET_HW)
    it = lf_kernel.lf_distances(omap, poses, scan.ranges, scan.angles,
                                interpret=True)
    probe("lf.hw_vs_interpret", hw, it, 1e-5)
    # numpy reference (bf16 texture contract: <=0.2% of max distance + half ulp)
    th = np.asarray(poses[:, 2:3]) + np.asarray(scan.angles)[None, :]
    hx = np.asarray(poses[:, 0:1]) + np.asarray(scan.ranges)[None, :] * np.cos(th)
    hy = np.asarray(poses[:, 1:2]) + np.asarray(scan.ranges)[None, :] * np.sin(th)
    ij = np.asarray(omap.world_to_map(jnp.stack([jnp.asarray(hx),
                                                 jnp.asarray(hy)], axis=-1)))
    dist = np.asarray(omap.distances)
    ii = np.clip(ij[..., 0], 0, omap.size_x - 1)
    jj = np.clip(ij[..., 1], 0, omap.size_y - 1)
    inmap = ((ij[..., 0] >= 0) & (ij[..., 0] < omap.size_x)
             & (ij[..., 1] >= 0) & (ij[..., 1] < omap.size_y))
    want = np.where(inmap, dist[jj, ii], omap.max_distance_to_object)
    probe("lf.hw_vs_numpy", hw, want, 0.01, frac_exact=0.995, flip_tol=0.15)


def probe_pc():
    rng = np.random.default_rng(2)
    pts = []
    n, nz = 400, 12  # 20 m x 20 m x 0.6 m @ 5 cm: nx=400 >= WIN_COLS
    for k in range(nz):
        z = (k + 0.5) * 0.05
        for i in range(0, n, 2):
            x = (i + 0.5) * 0.05
            pts += [[x, 0.025, z], [x, 20 - 0.025, z],
                    [0.025, x, z], [20 - 0.025, x, z]]
    for _ in range(16):
        cx, cy = rng.uniform(2, 18, 2)
        for k in range(nz):
            pts.append([cx, cy, (k + 0.5) * 0.05])
    omap3 = OctoMap3D.from_occupied_points(
        np.array(pts), 0.05, 0.4, metric_min=(0, 0, 0),
        metric_max=(20, 20, 0.6),
    ).with_distance_field()
    assert pc_kernel.tex_fits(omap3)
    ang = rng.uniform(-np.pi, np.pi, 64)
    r = rng.uniform(0.5, 3.0, 64)
    z = rng.uniform(0.1, 0.5, 64)
    cld = jnp.asarray(np.stack([r * np.cos(ang), r * np.sin(ang), z], axis=1),
                      jnp.float32)
    poses = cloud(300, 0.12, 0.12, 0.05, seed=5, center=(10.0, 10.0, 0.7))
    hw = pc_kernel.pc_distances_t(omap3, cld, poses, interpret=INTERPRET_HW)
    it = pc_kernel.pc_distances_t(omap3, cld, poses, interpret=True)
    probe("pc.hw_vs_interpret", hw, it, 1e-5)

    # 3D SPREAD kernel (pc_spread_kernel): uniform cloud over a few meters
    # of full yaw, term sums vs interpret AND vs the numpy voxel gather
    from badger_amcl_tpu.ops import pc_spread_kernel

    k1, k2 = jax.random.split(jax.random.PRNGKey(17))
    sposes = jnp.concatenate([
        10.0 + jax.random.uniform(k1, (3000, 2), minval=-1.5, maxval=1.5),
        jax.random.uniform(k2, (3000, 1), minval=-3.14, maxval=3.14),
    ], axis=1).astype(jnp.float32)
    pre3 = pc_spread_kernel.pc_spread_prepass(omap3, sposes, cld)
    assert bool(pre3["fits"]), "3D spread probe cloud must fit"
    fl3 = np.asarray(pre3["flags"][: pre3["n_tiles"]])
    assert (fl3 < 3).sum() > 0, "no 3D spread tier pairs exercised"
    term = lambda zz: zz * zz
    s3_hw = pc_spread_kernel.pc_spread_term_sums(
        omap3, sposes, cld, pre3, term, interpret=INTERPRET_HW)
    s3_it = pc_spread_kernel.pc_spread_term_sums(
        omap3, sposes, cld, pre3, term, interpret=True)
    probe("pc_spread.hw_vs_interpret", s3_hw, s3_it, 1e-3)
    from badger_amcl_tpu.sensors.point_cloud import transform_cloud_to_map

    mc = transform_cloud_to_map(cld, sposes)
    zt3 = np.asarray(omap3.distance_at(omap3.world_to_map(mc)).T, np.float64)
    want3 = (zt3 ** 2).sum(axis=0)
    got3 = np.asarray(pc_spread_kernel.unsort(jnp.asarray(s3_hw), pre3))
    probe("pc_spread.term_sums_vs_numpy", got3, want3, 1e-3,
          frac_exact=0.99, flip_tol=1.0)


# -------------------------------------------------------------------- corr


def probe_corr(omap):
    params = PlanarScanParams()
    omap = bake_corr_texture(omap, params, 6.0, "likelihood_field")
    scan = scan_of(48)
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    shapes = {
        "tight": cloud(500, 0.10, 0.10, 0.03, seed=2),
        "narrow": cloud(500, 0.22, 0.22, 0.05, seed=3),
        "std": cloud(500, 0.45, 0.45, 0.10, seed=4),
    }
    for name, poses in shapes.items():
        pre = corr_kernel.corr_prepass(omap, poses, scan.ranges, scan.angles,
                                       valid, dedup=True)
        assert bool(pre["fits"]), f"corr {name} cloud must fit"
        if name == "tight":
            assert bool(pre["tight"]), "tight cloud must take the 24-row arm"
        elif name == "narrow":
            assert bool(pre["narrow"]) and not bool(pre["tight"]), \
                "narrow cloud must take the 32-row arm"
        else:
            assert not bool(pre["narrow"]) and not bool(pre["tight"]), \
                "std cloud must take the 64-row arm"
        hw = corr_kernel.corr_values(omap, omap.corr_psi_pad, poses,
                                     scan.ranges, scan.angles, valid, pre,
                                     interpret=INTERPRET_HW)
        it = corr_kernel.corr_values(omap, omap.corr_psi_pad, poses,
                                     scan.ranges, scan.angles, valid, pre,
                                     interpret=True)
        probe(f"corr.{name}_hw_vs_interpret", hw, it, 1e-4)
        # pre-DMA path (baked full-texture preshifted copies + in-kernel
        # dynamic-origin DMA): must BIT-EQUAL the per-call slice build on
        # hardware — a wrong/unproven DMA origin reads rows 8/128 cells off
        hw_pre = corr_kernel.corr_values(omap, omap.corr_psi_pad, poses,
                                         scan.ranges, scan.angles, valid,
                                         pre, interpret=INTERPRET_HW,
                                         tex_pre=omap.corr_psi_pre)
        probe(f"corr_pre.{name}_hw_vs_slices", hw_pre, hw, 0.0)
        # int8-quantized variant: the int32 accumulation is exact, so hw
        # must match interpret BIT-EQUALLY after the affine dequantization
        # (any roll/bitcast miscompile shows up as whole-qstep jumps)
        hw_q = corr_kernel.corr_values_q(omap.corr_psi_pad_q, omap.corr_psi_q,
                                         scan.ranges, pre,
                                         interpret=INTERPRET_HW)
        it_q = corr_kernel.corr_values_q(omap.corr_psi_pad_q, omap.corr_psi_q,
                                         scan.ranges, pre, interpret=True)
        probe(f"corr_q.{name}_hw_vs_interpret", hw_q, it_q, 0.0)
        # quantization contract vs the f32 kernel: <= nv * qstep / 2
        qstep = float(np.asarray(omap.corr_psi_q)[0])
        nv = int(pre["nv"])
        probe(f"corr_q.{name}_vs_f32", hw_q, np.asarray(it, np.float64),
              nv * qstep * 0.5 * 1.01 + 1e-5)


# ------------------------------------------------------------------- spread


def probe_spread(omap):
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    # tight dense core (tier-0 windows) + a wider shell (tier-1) + far
    # full-yaw stragglers that must ESCAPE once beams run long
    dense = jnp.concatenate([
        jax.random.uniform(k1, (3200, 2), minval=-1.0, maxval=1.0),
        jax.random.uniform(k2, (3200, 1), minval=-3.14, maxval=3.14),
    ], axis=1)
    shell = jnp.concatenate([
        jax.random.uniform(k3, (400, 2), minval=-4.0, maxval=4.0),
        jax.random.uniform(jax.random.PRNGKey(98), (400, 1),
                           minval=-3.14, maxval=3.14),
    ], axis=1)
    strag = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(99), (60, 2),
                           minval=-11.0, maxval=11.0),
        jax.random.uniform(jax.random.PRNGKey(97), (60, 1),
                           minval=-3.14, maxval=3.14),
    ], axis=1)
    poses = jnp.concatenate([dense, shell, strag], axis=0).astype(jnp.float32)
    # 256 beams: beam-group arcs at production-like angular resolution
    # (24-beam scans make every group's arc-union bbox tier-1-wide)
    angles = jnp.linspace(-2.2, 2.2, 256).astype(jnp.float32)
    ranges = jnp.clip(4.0 + 2.0 * jnp.sin(angles * 5.0), 0.3, 6.5)
    scan = PlanarScan(ranges=ranges, angles=angles, range_max=jnp.float32(8.0))
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    pre = spread_kernel.spread_prepass(omap, poses, scan.ranges, scan.angles,
                                       valid)
    assert bool(pre["fits"]), "spread probe cloud must fit"
    flags = np.asarray(pre["flags"][: pre["n_tiles"]])
    assert (flags == 0).sum() > 0, "no tier-0 pairs exercised"
    assert ((flags == 1) | (flags == 2)).sum() > 0, "no mid/t2 pairs exercised"
    assert (flags == 3).sum() > 0, "no giant-tier pairs exercised"
    assert (flags == spread_kernel.ESCAPE).sum() > 0, "no escape pairs exercised"
    hw, cov = spread_kernel.spread_distances_sorted(
        omap, poses, scan.ranges, scan.angles, valid, pre,
        interpret=INTERPRET_HW)
    it, _ = spread_kernel.spread_distances_sorted(
        omap, poses, scan.ranges, scan.angles, valid, pre, interpret=True)
    cov = np.asarray(cov)
    hw = np.where(cov, np.asarray(hw), 0.0)
    it = np.where(cov, np.asarray(it), 0.0)
    probe("spread.hw_vs_interpret", hw, it, 1e-5)
    # numpy reference incl. the exact int8 quantization contract
    sp = np.asarray(pre["spose_s"])
    th = sp[None, :, 2] + np.asarray(scan.angles)[:, None]
    r = np.asarray(scan.ranges)[:, None]
    hx = sp[None, :, 0] + r * np.cos(th)
    hy = sp[None, :, 1] + r * np.sin(th)
    ij = np.asarray(omap.world_to_map(jnp.stack(
        [jnp.asarray(hx), jnp.asarray(hy)], axis=-1)))
    maxd = omap.max_distance_to_object
    tex8 = np.asarray(spread_kernel.quantized_tex(omap))
    ii = np.clip(ij[..., 0], 0, omap.size_x - 1)
    jj = np.clip(ij[..., 1], 0, omap.size_y - 1)
    inmap = ((ij[..., 0] >= 0) & (ij[..., 0] < omap.size_x)
             & (ij[..., 1] >= 0) & (ij[..., 1] < omap.size_y))
    want = np.where(inmap, tex8[jj, ii] * (maxd / spread_kernel.QLEVELS), maxd)
    probe("spread.hw_vs_numpy", hw, np.where(cov, want, 0.0), 1e-5,
          frac_exact=0.995, flip_tol=0.15)
    # merged kernel + escape term sums (compiled) vs the numpy reduction
    term = lambda z: z * z
    s_hw = spread_kernel.spread_term_sums(
        omap, poses, scan.ranges, scan.angles, valid, pre, term,
        interpret=INTERPRET_HW)
    got = np.asarray(spread_kernel.unsort(jnp.asarray(s_hw), pre))
    want_sum = np.zeros((poses.shape[0],), np.float64)
    perm = np.asarray(pre["perm"])
    w_sorted = (np.asarray(want, np.float64) ** 2
                * np.asarray(valid)[:, None]).sum(0)[: poses.shape[0]]
    want_sum[perm] = w_sorted
    probe("spread.term_sums_vs_numpy", got, want_sum, 1e-3,
          frac_exact=0.995, flip_tol=5.0)


# --------------------------------------------------------------------- beam


def probe_beam():
    omap = make_map(320, seed=6).with_range_image(n_angles=128)
    params = PlanarScanParams()
    scan = scan_of(32, rmax=8.0, rcap=7.0)
    poses = cloud(400, 0.15, 0.15, 0.05, seed=8)
    pre = beam_kernel.beam_prepass(omap, poses)
    hw = beam_kernel.beam_corr_values(omap, params, scan, poses, pre,
                                      interpret=INTERPRET_HW)
    it = beam_kernel.beam_corr_values(omap, params, scan, poses, pre,
                                      interpret=True)
    probe("beam.hw_vs_interpret", hw, it, 1e-4)


def probe_beam_spread():
    """Spread-cloud beam kernel (ops/beam_spread_kernel.py): hw vs
    interpret, plus exactness vs the direct sigma+kappa slab formulation
    in numpy (the one-hot table read is exact; sums are reassociated)."""
    from badger_amcl_tpu.ops import beam_spread_kernel as bsk

    omap = make_map(320, seed=6).with_range_image(n_angles=128)
    params = PlanarScanParams()
    b = 48
    scan = scan_of(b, rmax=8.0, rcap=7.0)
    m = 6144
    rng = np.random.default_rng(12)
    poses = jnp.asarray(np.stack([
        rng.uniform(-7.0, 7.0, m), rng.uniform(-7.0, 7.0, m),
        rng.uniform(-np.pi, np.pi, m)], axis=1), jnp.float32)
    pre = bsk.beam_spread_prepass(omap, poses, scan)
    assert bool(pre["fits"])
    hw = bsk.beam_spread_values(omap, params, scan, poses, pre,
                                interpret=INTERPRET_HW)
    it = bsk.beam_spread_values(omap, params, scan, poses, pre,
                                interpret=True)
    probe("beam_spread.hw_vs_interpret", hw, it, 1e-4)

    k = int(omap.range_image.shape[0])
    ri = np.asarray(omap.range_image)
    pn = np.asarray(poses, np.float64)
    ij = np.asarray(omap.world_to_map(poses[:, :2]))
    ci = np.clip(ij[:, 0], 0, omap.size_x - 1)
    cj = np.clip(ij[:, 1], 0, omap.size_y - 1)
    bin_inv = k / (2 * np.pi)
    sig = np.mod(np.round(pn[:, 2] * bin_inv).astype(np.int64), k)
    kap = np.mod(np.round(np.asarray(scan.angles, np.float64) * bin_inv)
                 .astype(np.int64), k)
    slabs = np.mod(sig[:, None] + kap[None, :], k)
    rmax = float(scan.range_max)
    map_r = np.minimum(
        ri[slabs, cj[:, None], ci[:, None]].astype(np.float64)
        * omap.resolution, rmax)
    obs = np.asarray(scan.ranges, np.float64)[None, :]
    z = obs - map_r
    p0 = float(params.z_hit) * np.exp(
        -(z * z) / (2 * float(params.sigma_hit) ** 2))
    p0 += np.where(z < 0, float(params.z_short) * float(params.lambda_short)
                   * np.exp(-float(params.lambda_short) * obs), 0.0)
    p0 += np.where(obs == rmax, float(params.z_max), 0.0)
    p0 += np.where(obs < rmax, float(params.z_rand) / rmax, 0.0)
    want = 1.0 + (p0 ** 3).sum(axis=1)
    probe("beam_spread.hw_vs_numpy", hw, want, 1e-3,
          frac_exact=0.99, flip_tol=1.0)


def main():
    dev = jax.devices()[0]
    print(f"probing on {dev.platform} ({dev.device_kind})", file=sys.stderr)
    omap = make_map()
    probe_mxu_gather()
    probe_lf(omap)
    probe_corr(omap)
    probe_spread(omap)
    probe_pc()
    probe_beam()
    probe_beam_spread()
    ok = all(r["ok"] for r in RESULTS.values())
    print(json.dumps({"ok": ok, "platform": dev.platform,
                      "device": str(dev.device_kind), "probes": RESULTS}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
