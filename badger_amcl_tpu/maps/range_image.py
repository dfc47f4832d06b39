"""Precomputed per-angle range images for the beam model.

The reference's beam model raycasts per beam per particle
(calcBeamModel -> OccupancyMap::calcRange Bresenham,
planar_scanner.cpp:168-234 / occupancy_map.cpp:257-364). Marching rays is
hostile to TPUs (each step is a scalar gather), so the fast path precomputes
a *range image* R[k, j, i]: the distance from cell (i, j) along direction
theta_k to the first non-FREE cell (out-of-bounds counts as blocked, start
cell blocked -> 0 — the calcRange conventions). At runtime the beam model
becomes the same windowed texture lookup as the likelihood-field models.

Built by rotating the blocked-mask into a frame where each direction is the
+u axis and taking a vectorized reverse scan per row ("next blocked cell to
the right"), then sampling back at map cells — the CDDT idea (Walsh &
Karaman). Nearest-neighbor resampling and angle binning make this a fast
*approximate* mode (errors ~1 cell + r * (2 pi / K) laterally); the exact
Bresenham path (sensors/raycast.py) remains the default contract.
"""

from __future__ import annotations

import numpy as np

from badger_amcl_tpu.maps.occupancy_2d import CellState


def build_range_image(
    cells: np.ndarray, resolution: float, n_angles: int = 256
) -> np.ndarray:
    """cells: int8 (H, W) CellState grid ([j, i] indexed). Returns uint16
    (n_angles, H, W): range in *cells* (saturating) from each cell along
    theta_k = k * 2*pi/n_angles, measured as Euclidean cell distance."""
    blocked = np.asarray(cells) != int(CellState.FREE)
    from badger_amcl_tpu.utils import native

    nat = native.range_image(blocked, n_angles)
    if nat is not None:
        return nat
    h, w = blocked.shape
    # rotated-frame extent: the map diagonal plus margin
    d = int(np.ceil(np.hypot(h, w))) + 2
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rc = (d - 1) / 2.0

    u = np.arange(d, dtype=np.float64) - rc
    v = np.arange(d, dtype=np.float64) - rc
    uu, vv = np.meshgrid(u, v, indexing="xy")  # [v, u]

    # map-cell coords sampled back into the rotated frame
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xr = ii - cx
    yr = jj - cy

    out = np.empty((n_angles, h, w), dtype=np.uint16)
    big = np.int32(d + 10)
    uidx = np.arange(d, dtype=np.int32)

    for k in range(n_angles):
        th = 2.0 * np.pi * k / n_angles
        c, s = np.cos(th), np.sin(th)
        # world cell under rotated grid point (u, v): p = u*e1 + v*e2
        px = uu * c - vv * s + cx
        py = uu * s + vv * c + cy
        pi = np.floor(px + 0.5).astype(np.int32)
        pj = np.floor(py + 0.5).astype(np.int32)
        inb = (pi >= 0) & (pi < w) & (pj >= 0) & (pj < h)
        blk = ~inb  # out-of-bounds is blocked
        blk |= inb & blocked[np.clip(pj, 0, h - 1), np.clip(pi, 0, w - 1)]
        # next blocked index >= u per row: reverse cumulative minimum
        cand = np.where(blk, uidx[None, :], big)
        nb = np.minimum.accumulate(cand[:, ::-1], axis=1)[:, ::-1]
        dist = (nb - uidx[None, :]).astype(np.float64)  # cells along +u
        # sample at map cells: rotated coords of cell (i, j)
        su = xr * c + yr * s + rc
        sv = -xr * s + yr * c + rc
        si = np.clip(np.floor(su + 0.5).astype(np.int32), 0, d - 1)
        sj = np.clip(np.floor(sv + 0.5).astype(np.int32), 0, d - 1)
        r = dist[sj, si]
        out[k] = np.clip(r, 0, 65535).astype(np.uint16)
    return out
