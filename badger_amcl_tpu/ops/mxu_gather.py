"""MXU-backed replacements for row gathers and segment sums.

XLA lowers random gather/scatter/segment_sum on TPU to ~7.5 ns/element
scalar loops (see PERF.md "Why gathers dominate"). Both primitives here
reshape the problem so the MXU does the data movement instead:

- `gather_rows`: out[q] = data[idx[q]] via a two-level chunked one-hot —
  a (Q, n_chunks) f32 one-hot contraction fetches each query's 128-row
  chunk, then an in-chunk one-hot multiply-reduce picks the row. Exact
  (one-hot matmuls sum a single nonzero term, so no rounding beyond the
  values themselves). ~4x faster than the scalar gather at 50k x 3.

- `segment_sums_small`: simultaneous segment sums of several quantities
  when segment ids are bounded by a small static K (cluster ranks are;
  particle counts per cluster are not needed individually): a (Q, K)
  one-hot matmul replaces K-independent scalar scatter-adds. Used by
  pf/cluster.py for the per-cluster statistics
  (computeClusterStatsForSet, particle_filter.cpp:505-636), which were
  ~3.4 ms of scatter-adds per step at 50k particles.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_CHUNK = 128

# On TPU, f32 dot_general at Precision.DEFAULT truncates operands to
# bfloat16 (~8 mantissa bits) — which silently breaks the "exact one-hot"
# contract for the DATA operand (resampled poses, second moments E[x^2]
# whose cancellation against E[x]^2 would be swamped far from the origin).
# HIGHEST keeps full f32; the one-hot operands are cheap either way.
# CPU tests can't catch this (DEFAULT is full f32 there); the hardware
# probe suite (benchmarks/probe_kernels.py) value-checks it on chip.
_PRECISION = lax.Precision.HIGHEST


def gather_rows(data: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """data (n, d) f32, idx (q,) int32 in [0, n) -> (q, d) == data[idx].

    Exact: each output row is the sum of exactly one selected row."""
    n, d = data.shape
    q = idx.shape[0]
    n_pad = -(-n // _CHUNK) * _CHUNK
    n_chunks = n_pad // _CHUNK
    data_pad = jnp.zeros((n_pad, d), data.dtype).at[:n].set(data)
    data_r = data_pad.reshape(n_chunks, _CHUNK * d)

    ci = (idx // _CHUNK).astype(jnp.int32)
    within = (idx - ci * _CHUNK).astype(jnp.int32)

    onehot_c = (ci[:, None] == jnp.arange(n_chunks, dtype=jnp.int32)[None, :]).astype(
        data.dtype
    )
    rows = lax.dot_general(
        onehot_c, data_r, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=data.dtype, precision=_PRECISION,
    ).reshape(q, _CHUNK, d)
    onehot_w = (within[:, None] == jnp.arange(_CHUNK, dtype=jnp.int32)[None, :]).astype(
        data.dtype
    )
    return jnp.sum(rows * onehot_w[:, :, None], axis=1)


def segment_sums_small(values: jnp.ndarray, seg_ids: jnp.ndarray, k: int) -> jnp.ndarray:
    """values (v, q), seg_ids (q,) int32 — sum each of the v quantities per
    segment, for segment ids < k (static). Ids >= k are DROPPED (matching
    segment_sum's out-of-range drop semantics). Returns (v, k)."""
    onehot = (seg_ids[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]).astype(
        values.dtype
    )
    return lax.dot_general(
        values, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=values.dtype, precision=_PRECISION,
    )


def broadcast_small(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """out[q] = table[ids[q]] for a SMALL 1-D f32 table (k <= a few
    thousand) and many queries — chunked one-hot MXU contraction; exact.

    Replaces M-sized gathers from tiny tables, which XLA lowers to the same
    ~7.8 ns/index scalar loop as big gathers (CLAUDE.md). Out-of-range ids
    return 0."""
    k = table.shape[0]
    k_pad = -(-k // _CHUNK) * _CHUNK
    n_chunks = k_pad // _CHUNK
    t2 = jnp.zeros((k_pad,), table.dtype).at[:k].set(table)
    t2 = t2.reshape(n_chunks, _CHUNK)
    ci = (ids // _CHUNK).astype(jnp.int32)
    onehot_c = (ci[:, None] == jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
                ).astype(table.dtype)
    rows = lax.dot_general(
        onehot_c, t2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=table.dtype, precision=_PRECISION,
    )  # (q, _CHUNK)
    within = (ids - ci * _CHUNK).astype(jnp.int32)
    inner = within[:, None] == jnp.arange(_CHUNK, dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(inner, rows, 0), axis=1)


def window_values(win: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """out[q] = win[rows[q], cols[q]] for a small window (R, C) — one
    one-hot MXU contraction over columns plus a row one-hot reduce; exact.

    Replaces per-particle scalar gathers when all particles live inside a
    known window (the stencil-correlation regime)."""
    r, c = win.shape
    oh_c = (cols[:, None] == jnp.arange(c, dtype=jnp.int32)[None, :]).astype(win.dtype)
    colvals = lax.dot_general(
        oh_c, win, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=win.dtype, precision=_PRECISION,
    )  # (q, R)
    oh_r = (rows[:, None] == jnp.arange(r, dtype=jnp.int32)[None, :]).astype(win.dtype)
    return jnp.sum(colvals * oh_r, axis=1)
