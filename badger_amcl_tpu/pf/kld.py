"""KLD-sampling support: dense pose-histogram binning and the Fox population
bound.

The reference tracks occupied histogram bins with an unbalanced kd-tree
(src/amcl/pf/pf_kdtree.cpp) whose leaf count feeds `resampleLimit`
(particle_filter.cpp:475-502). Pointer-chasing trees don't vectorize; we
compute the same bin keys (floor(pose / [0.5 m, 0.5 m, 10 deg]),
pf_kdtree.cpp:33-56), pack them into sortable int32 scalars *relative to the
particle cloud's own bin extents*, and count distinct keys with a sort — an
O(N log N) dense program whose leaf-count semantics match the tree exactly.

Packing budget: 11 bits x, 11 bits y, 7 bits yaw (relative). A particle
cloud spreading over more than 2048 x/y bins (> 1 km) or 128 yaw bins
(> 1270 deg of un-normalized yaw spread) would alias; both are far outside
the operating envelope (the kidnapped-robot sweep in BASELINE.json is a
warehouse-scale map).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Fixed histogram cell sizes (pf_kdtree.cpp:33-40)
CELL_X = 0.5
CELL_Y = 0.5
CELL_A = 10.0 * math.pi / 180.0

_XBITS, _YBITS, _ABITS = 11, 11, 7
_XMAX, _YMAX, _AMAX = (1 << _XBITS) - 1, (1 << _YBITS) - 1, (1 << _ABITS) - 1
SENTINEL = jnp.int32(1 << 30)  # sorts after every valid packed key


def bin_keys(poses: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) poses -> (N, 3) int32 histogram keys (pf_kdtree.cpp:49-56)."""
    cell = jnp.array([CELL_X, CELL_Y, CELL_A], dtype=poses.dtype)
    return jnp.floor(poses / cell).astype(jnp.int32)


def pack_keys(keys3: jnp.ndarray, active: jnp.ndarray):
    """Pack (N, 3) keys into sortable int32 scalars, relative to the active
    minimum. Inactive entries get SENTINEL. Returns (packed (N,), rel (N, 3))."""
    big = jnp.int32(2**30)
    masked = jnp.where(active[:, None], keys3, big)
    mins = jnp.min(masked, axis=0)
    mins = jnp.where(mins == big, 0, mins)  # all-inactive edge case
    rel = jnp.clip(keys3 - mins[None, :], 0, jnp.array([_XMAX, _YMAX, _AMAX]))
    packed = (rel[:, 0] << (_YBITS + _ABITS)) | (rel[:, 1] << _ABITS) | rel[:, 2]
    packed = jnp.where(active, packed, SENTINEL)
    return packed, rel


def neighbor_offset_packed(di: int, dj: int, dk: int) -> int:
    """Packed-key delta for a (di, dj, dk) bin-neighborhood offset."""
    return (di << (_YBITS + _ABITS)) + (dj << _ABITS) + dk


def rel_in_bounds(rel: jnp.ndarray, di: int, dj: int, dk: int) -> jnp.ndarray:
    """Whether rel + offset stays inside the packing budget (no aliasing)."""
    i = rel[..., 0] + di
    j = rel[..., 1] + dj
    k = rel[..., 2] + dk
    return (i >= 0) & (i <= _XMAX) & (j >= 0) & (j <= _YMAX) & (k >= 0) & (k <= _AMAX)


def first_occurrence_flags(packed: jnp.ndarray, active: jnp.ndarray):
    """For each entry (in *original draw order*), whether its bin key has not
    appeared at any earlier active index. Used both for leaf counting and for
    the mid-stream KLD stop in multinomial resampling
    (particle_filter.cpp:416).

    Returns (is_new (N,) bool, order (N,) argsort permutation,
             sorted_packed (N,))."""
    n = packed.shape[0]
    order = jnp.argsort(packed, stable=True)  # stable: ties keep draw order
    sp = packed[order]
    first_sorted = jnp.concatenate(
        [jnp.ones((1,), bool), sp[1:] != sp[:-1]]
    ) & (sp != SENTINEL)
    is_new = jnp.zeros((n,), bool).at[order].set(first_sorted)
    return is_new & active, order, sp


def leaf_count(poses: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Number of occupied histogram bins == kd-tree leaf count
    (pf_kdtree.cpp:92-95)."""
    packed, _ = pack_keys(bin_keys(poses), active)
    is_new, _, _ = first_occurrence_flags(packed, active)
    return jnp.sum(is_new).astype(jnp.int32)


def resample_limit(k, min_samples: int, max_samples: int, pop_err: float, pop_z: float):
    """Fox et al. KLD population bound, exactly as particle_filter.cpp:475-502.

    Vectorized over k (int array). k <= 1 -> max_samples."""
    kf = k.astype(jnp.float32)
    b = 2.0 / (9.0 * (kf - 1.0))
    c = jnp.sqrt(b) * pop_z
    x = 1.0 - b + c
    n = jnp.ceil((kf - 1.0) / (2.0 * pop_err) * x * x * x)
    n = jnp.clip(n, min_samples, max_samples).astype(jnp.int32)
    return jnp.where(k <= 1, jnp.int32(max_samples), n)
