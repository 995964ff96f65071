"""On-device DBSCAN over sampling-ray endpoints.

The reference clusters surviving rays with ``sklearn.cluster.DBSCAN``
(reference: utilities.py:1478-1487).  Cluster counts here are tiny (one
per window) but the clustering sits inside the per-frame pipeline, so it
must be jit/vmap-able: this implementation builds the eps-threshold graph
and finds connected components of core points by min-label propagation
(a fixed-point ``lax.while_loop``), then attaches border points.

Semantics matched to sklearn:

* neighbourhood = ``dist <= eps`` including the point itself,
* core iff neighbourhood size >= min_samples,
* clusters = connected components of the core-core graph,
* border points join the cluster whose minimal core index is smallest
  among their core neighbours (sklearn's scan-order claim),
* noise label -1; cluster ids renumbered 0,1,... by ascending first
  core index (sklearn's processing order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INT_INF = jnp.iinfo(jnp.int32).max


def dbscan(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    eps: jnp.ndarray,
    min_samples: int = 5,
    max_clusters: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster ``points`` (P, 3) restricted to ``valid`` slots.

    Returns ``(labels, n_clusters)`` where labels is (P,) int32 with -1
    for noise/invalid and cluster ids in 0..n_clusters-1 (capped at
    ``max_clusters``; ids beyond the cap are folded to -1 and counted
    out — callers size max_clusters generously).
    """
    p = points.shape[0]
    diff = points[:, None, :] - points[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    pair_valid = valid[:, None] & valid[None, :]
    adj = pair_valid & (dist <= eps)  # includes self (dist 0 <= eps)

    n_neighbors = jnp.sum(adj, axis=1)  # adj is already validity-masked
    core = valid & (n_neighbors >= min_samples)

    idx = jnp.arange(p, dtype=jnp.int32)
    labels0 = jnp.where(core, idx, _INT_INF)
    core_adj = adj & core[:, None] & core[None, :]

    def propagate(state):
        labels, _ = state
        neigh_min = jnp.min(
            jnp.where(core_adj, labels[None, :], _INT_INF), axis=1
        )
        new = jnp.minimum(labels, neigh_min)
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(
        cond, propagate, (labels0, jnp.asarray(True))
    )

    # border points: minimal component label among core neighbours.
    border_label = jnp.min(
        jnp.where(adj & core[None, :], labels[None, :], _INT_INF), axis=1
    )
    raw = jnp.where(core, labels, jnp.where(valid, border_label, _INT_INF))

    # renumber components by ascending minimal core index.
    is_root = core & (labels == idx)  # one root per component
    root_rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # rank at root pos
    rank_of = jnp.where(
        (raw >= 0) & (raw < p), root_rank[jnp.clip(raw, 0, p - 1)], -1
    )
    out = jnp.where((raw == _INT_INF) | (rank_of >= max_clusters), -1, rank_of)
    n_clusters = jnp.minimum(
        jnp.sum(is_root.astype(jnp.int32)), max_clusters
    )
    return out.astype(jnp.int32), n_clusters
