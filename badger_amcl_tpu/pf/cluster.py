"""Connected-component clustering of occupied pose-histogram bins and
cluster/set statistics.

The reference flood-fills the kd-tree: two bins belong to one cluster when
their keys are within the 3x3x3 neighborhood (pf_kdtree.cpp:58-76,169-194),
and statistics accumulate per cluster with circular yaw means
(particle_filter.cpp:505-636). Recursion over tree nodes becomes iterated
min-label propagation over a sorted unique-bin table with 26 searchsorted
neighbor probes — shape-static, fixpoint-terminated, jit-compatible.

Cluster *numbering* differs from the reference (ours is by minimum bin rank,
the reference's by DFS discovery order); the set of clusters and their
weights/means/covariances — the quantities that determine the published pose
(getMaxWeightPose, node_2d.cpp:588-617) — are identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from badger_amcl_tpu.pf import kld
from badger_amcl_tpu.pf.types import ClusterStats

_NEIGHBOR_OFFSETS = [
    (di, dj, dk)
    for di in (-1, 0, 1)
    for dj in (-1, 0, 1)
    for dk in (-1, 0, 1)
    if not (di == 0 and dj == 0 and dk == 0)
]


def _unique_bins(packed, rel, active):
    """Compact active particles' bins into a sorted unique table of capacity M.

    Returns (ubin_packed (M,) sorted with SENTINEL tail, ubin_rel (M,3),
             nbins scalar, particle_bin (M,) bin rank per particle)."""
    m = packed.shape[0]
    order = jnp.argsort(packed, stable=True)
    sp = packed[order]
    srel = rel[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]]) & (
        sp != kld.SENTINEL
    )
    # bin rank for each sorted position: cumsum of first flags - 1
    rank_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    nbins = jnp.sum(first).astype(jnp.int32)
    # scatter unique keys to their rank
    ubin_packed = jnp.full((m,), kld.SENTINEL, jnp.int32)
    ubin_rel = jnp.zeros((m, 3), jnp.int32)
    # scatter only first occurrences; everything else targets index m -> dropped
    dst = jnp.where(first, rank_sorted, m)
    ubin_packed = ubin_packed.at[dst].set(sp, mode="drop")
    ubin_rel = ubin_rel.at[dst].set(srel, mode="drop")
    # map back: particle at original index order[j] lives in bin rank_sorted[j]
    particle_bin = jnp.zeros((m,), jnp.int32).at[order].set(rank_sorted)
    return ubin_packed, ubin_rel, nbins, particle_bin


def _neighbor_table(ubin_packed, ubin_rel, nbins):
    """(26, M) int32 neighbor bin rank for each unique bin, -1 if absent."""
    m = ubin_packed.shape[0]
    valid_bin = jnp.arange(m) < nbins
    cols = []
    for di, dj, dk in _NEIGHBOR_OFFSETS:
        off = kld.neighbor_offset_packed(di, dj, dk)
        target = ubin_packed + off
        ok = valid_bin & kld.rel_in_bounds(ubin_rel, di, dj, dk)
        pos = jnp.searchsorted(ubin_packed, target)
        pos = jnp.clip(pos, 0, m - 1)
        found = ok & (ubin_packed[pos] == target) & (target != kld.SENTINEL)
        cols.append(jnp.where(found, pos, -1).astype(jnp.int32))
    return jnp.stack(cols, axis=0)


def _connected_components(neighbors, nbins, m):
    """Min-label propagation with path compression until fixpoint.

    neighbors: (26, M) bin-rank adjacency (-1 = none). Returns (M,) int32
    root label per bin (labels are bin ranks; roots satisfy label[b] == b)."""
    init = jnp.arange(m, dtype=jnp.int32)

    def step(labels):
        nb_labels = jnp.where(neighbors >= 0, labels[jnp.clip(neighbors, 0)], m)
        best = jnp.minimum(labels, jnp.min(nb_labels, axis=0).astype(jnp.int32))
        # path compression (labels point at smaller-ranked bins only)
        best = labels[best]
        best = labels[best]
        return best

    def cond(carry):
        labels, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        new = step(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True)))
    return labels


def compute_cluster_stats(poses, weights, active, params) -> ClusterStats:
    """Full computeClusterStatsForSet (particle_filter.cpp:505-636):
    cluster the histogram, then accumulate per-cluster and whole-set
    weighted statistics with circular yaw means.

    Segment ids in the returned arrays are *bin-rank root labels* (< M)."""
    m = poses.shape[0]
    packed, rel = kld.pack_keys(kld.bin_keys(poses), active)
    ubin_packed, ubin_rel, nbins, particle_bin = _unique_bins(packed, rel, active)
    neighbors = _neighbor_table(ubin_packed, ubin_rel, nbins)
    labels = _connected_components(neighbors, nbins, m)

    pc = jnp.where(active, labels[particle_bin], m - 1).astype(jnp.int32)

    w = jnp.where(active, weights, 0.0)
    x, y, th = poses[:, 0], poses[:, 1], poses[:, 2]
    c, s = jnp.cos(th), jnp.sin(th)

    def seg(v):
        return jax.ops.segment_sum(v, pc, num_segments=m)

    cw = seg(w)
    cnt = seg(jnp.where(active, 1, 0).astype(jnp.int32))
    mx = seg(w * x)
    my = seg(w * y)
    mc = seg(w * c)
    ms = seg(w * s)
    cxx = seg(w * x * x)
    cxy = seg(w * x * y)
    cyy = seg(w * y * y)

    valid_bin = jnp.arange(m) < nbins
    root = (labels == jnp.arange(m)) & valid_bin
    cluster_count = jnp.sum(root).astype(jnp.int32)

    safe_w = jnp.where(cw > 0, cw, 1.0)
    mean_x = mx / safe_w
    mean_y = my / safe_w
    mean_a = jnp.arctan2(ms, mc)
    cluster_means = jnp.stack([mean_x, mean_y, mean_a], axis=1)

    # covariance (normalizeCluster, particle_filter.cpp:555-568)
    cov = jnp.zeros((m, 3, 3), jnp.float32)
    cov = cov.at[:, 0, 0].set(cxx / safe_w - mean_x * mean_x)
    cov = cov.at[:, 0, 1].set(cxy / safe_w - mean_x * mean_y)
    cov = cov.at[:, 1, 0].set(cxy / safe_w - mean_x * mean_y)
    cov = cov.at[:, 1, 1].set(cyy / safe_w - mean_y * mean_y)
    r = jnp.sqrt(mc * mc + ms * ms)
    cov = cov.at[:, 2, 2].set(-2.0 * jnp.log(jnp.maximum(r, 1e-30)))

    # whole-set stats (computeSetStats, particle_filter.cpp:620-636)
    tw = jnp.sum(w)
    safe_tw = jnp.where(tw > 0, tw, 1.0)
    smx, smy = jnp.sum(w * x) / safe_tw, jnp.sum(w * y) / safe_tw
    smc, sms = jnp.sum(w * c), jnp.sum(w * s)
    set_mean = jnp.stack([smx, smy, jnp.arctan2(sms, smc)])
    set_cov = jnp.zeros((3, 3), jnp.float32)
    set_cov = set_cov.at[0, 0].set(jnp.sum(w * x * x) / safe_tw - smx * smx)
    set_cov = set_cov.at[0, 1].set(jnp.sum(w * x * y) / safe_tw - smx * smy)
    set_cov = set_cov.at[1, 0].set(set_cov[0, 1])
    set_cov = set_cov.at[1, 1].set(jnp.sum(w * y * y) / safe_tw - smy * smy)
    # NOTE: like the cluster case, the reference uses the *raw* weighted
    # cos/sin sums here (computeSetStats, particle_filter.cpp:635) — the
    # normalized weights sum to 1 over the set, so this is well-formed.
    sr = jnp.sqrt(smc * smc + sms * sms)
    set_cov = set_cov.at[2, 2].set(-2.0 * jnp.log(jnp.maximum(sr, 1e-30)))

    return ClusterStats(
        cluster_count=cluster_count,
        cluster_valid=root,
        cluster_weights=jnp.where(root, cw, 0.0),
        cluster_counts=jnp.where(root, cnt, 0),
        cluster_means=jnp.where(root[:, None], cluster_means, 0.0),
        cluster_covs=jnp.where(root[:, None, None], cov, 0.0),
        mean=set_mean.astype(jnp.float32),
        cov=set_cov,
        particle_cluster=pc,
    )
