"""Isolate the corr-likelihood sub-phases on the real chip.

Splits likelihood_ms (PERF.md phase table) into: prepass, preshifted
slices, kernel call, the particle table read (jnp.take), and map_factors —
to locate the cost the fused-table-read kernel must remove.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, s0, iters=100):
    import jax

    @jax.jit
    def loop(s):
        return jax.lax.fori_loop(0, iters, lambda i, t: fn(t), s)

    s = loop(s0)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = loop(s)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_setup
    from badger_amcl_tpu.ops import corr_kernel
    from badger_amcl_tpu.sensors import planar

    omap, params, state, scan, scan_params, pool = _build_setup(
        50000, 720, 1024, pose_cov=(0.02, 0.02, 0.002), min_particles=50000,
    )
    valid = (scan.ranges < scan.range_max) & ~jnp.isnan(scan.ranges)
    tex_pad = omap.corr_psi_pad
    assert tex_pad is not None
    n_beams = int(scan.ranges.shape[0])
    out = {}

    def chain(s, v):
        return s.replace(poses=s.poses + (v * 1e-12)[:, None])

    @jax.jit
    def prepass_only(s):
        pre = corr_kernel.corr_prepass(omap, s.poses, scan.ranges, scan.angles, valid)
        return chain(s, pre["ci"].astype(jnp.float32))

    out["prepass_ms"] = timed(prepass_only, state)

    @jax.jit
    def slices_only(s):
        pre = corr_kernel.corr_prepass(omap, s.poses, scan.ranges, scan.angles, valid)
        sj, si = corr_kernel.slice_origin(tex_pad, pre["j0_tight"], pre["i0"])
        tex_s = corr_kernel.preshifted_slices(tex_pad, sj, si)
        return s.replace(poses=s.poses + tex_s[0, 0, 0] * 1e-12)

    out["prepass_plus_slices_ms"] = timed(slices_only, state)

    @jax.jit
    def kernel_no_take(s):
        pre = corr_kernel.corr_prepass(omap, s.poses, scan.ranges, scan.angles, valid)
        rows = corr_kernel.PWIN_R_TIGHT
        j0 = pre["j0_tight"]
        sj, si = corr_kernel.slice_origin(tex_pad, j0, pre["i0"])
        tex_s = corr_kernel.preshifted_slices(tex_pad, sj, si)
        meta = jnp.stack(
            [pre["t_n"], j0 + corr_kernel.PAD_R - sj,
             pre["i0"] + corr_kernel.PAD_C - si,
             jnp.maximum(pre["nv"], 1)]).astype(jnp.int32)
        corr = corr_kernel._corr_call(tex_s, meta, pre["off"],
                                      n_beams=n_beams, rows=rows)
        return s.replace(poses=s.poses + corr[0, 0, 0] * 1e-12)

    out["kernel_no_take_ms"] = timed(kernel_no_take, state)

    @jax.jit
    def kernel_take(s):
        pre = corr_kernel.corr_prepass(omap, s.poses, scan.ranges, scan.angles, valid)
        v = corr_kernel.corr_values(omap, tex_pad, s.poses, scan.ranges,
                                    scan.angles, valid, pre)
        return chain(s, v)

    out["kernel_plus_take_ms"] = timed(kernel_take, state)

    @jax.jit
    def factors_only(s):
        return chain(s, planar.map_factors(omap, scan_params, s.poses))

    out["map_factors_ms"] = timed(factors_only, state)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
