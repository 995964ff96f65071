"""Fused Pallas DBSCAN kernel over sampling-ray endpoints (TPU).

The dense jnp DBSCAN (:mod:`pywindow_tpu.ops.cluster`) materialises a
``(B, K, K)`` adjacency predicate in HBM and re-reads it once per
label-propagation iteration plus once each for the border and renumber
passes.  Profiled at B=8640 on CC3 (round 5) that family is ~67 ms of
the 370 ms step — a ~1.3 GB HBM-resident predicate written by one
fusion (9.0 ms), carried through the propagate ``while`` (19.9 ms) and
re-read by the border/renumber reductions (19.8 ms + misc).  This
kernel runs the whole clustering — diff-form distances, eps-graph,
core test, min-label propagation to fixpoint, border attachment,
component renumbering — per frame inside VMEM; nothing larger than the
``(K,)`` int labels ever reaches HBM.

Semantics match :func:`pywindow_tpu.ops.cluster.dbscan` row for row
(same diff-form distance arithmetic, same fixpoint, same
border/renumber rules — the sklearn-parity contract documented there;
reference: utilities.py:1478-1487).  ``n_clusters`` is NOT a kernel
output: the renumber rule labels every component root with its own
rank, so ``max(labels) + 1 == min(n_roots, max_clusters)`` exactly and
the caller recovers it with one cheap (B, K) reduce.

The orientation trick: the adjacency matrix is symmetric, so every
quantity needed in both ``(K, 1)`` and ``(1, K)`` orientations
(neighbour counts, labels, border minima, root counts) is obtained by
reducing the SAME matrix along the other axis instead of transposing —
Mosaic has no cheap vector transpose.  Label propagation therefore
carries BOTH orientations and updates each from the other's previous
value, which keeps them exact transposes and makes every kernel
iteration equal to one jnp ``propagate`` iteration.

Mosaic rules honoured (docs/design.md "fused Pallas optimiser
kernel"): no i1 vectors in while-loop carries (labels are
{integer-valued, BIG} floats; the convergence flag is a {0,1} float
scalar), bool tensors appear only as compare-then-select predicates
(never combined with ``&``/``|``, stored, or ``astype``-converted —
mask algebra is {0,1} float multiplication), and python literals are
dtype-pinned (x64 interpret mode would otherwise promote them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pywindow_tpu.ops.pallas_kernels import _i32, _round_up

#: larger-than-any-point-index sentinel for min-label propagation (the
#: f32 analog of cluster._INT_INF; only ever compared/minimised).
_BIG = 1.0e9

#: the kernel's VMEM peak is per frame (the frame loop is sequential,
#: so Mosaic reuses the tiles): ~4 live (K, K) f32 tiles (dist, adj,
#: core-adj, one select temporary).  Cap K so that peak stays ~9 MB of
#: the ~16 MB scoped budget; callers fall back to the jnp dense path
#: above this (CC3 is K=384).
_K_LIMIT = 768


def dbscan_labels_flat(
    points: jnp.ndarray,  # (b, K, 3)
    valid: jnp.ndarray,  # (b, K) {0,1} floats, same dtype as points
    eps: jnp.ndarray,  # (b,)
    min_samples: int,
    max_clusters: int,
    frames: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:  # (b, K) int32
    """DBSCAN labels for a flat batch of point sets, one fused kernel.

    Returns per-point labels: -1 noise/invalid, else the component
    rank by ascending first-core index, folded to -1 at
    ``max_clusters`` — exactly :func:`pywindow_tpu.ops.cluster.dbscan`
    minus the ``n_clusters`` scalar (recover it as
    ``max(labels, axis=-1) + 1``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, k, _ = points.shape
    dtype = points.dtype
    k_pad = _round_up(max(k, 128), 128)
    # Mosaic needs the (F, K) blocks' second-to-last dim divisible by
    # 8, so frames must stay a multiple of 8 (VMEM is fine: the frame
    # loop is sequential and its (K, K) tiles are reused per frame)
    b_pad = _round_up(max(b, frames), frames)

    pts = jnp.zeros((b_pad, k_pad, 3), dtype).at[:b, :k].set(points)
    val = jnp.zeros((b_pad, k_pad), dtype).at[:b, :k].set(valid)
    epsc = jnp.ones((b_pad, 1), dtype).at[:b, 0].set(eps)

    def kernel(pts_ref, val_ref, eps_ref, out_ref):
        one = jnp.asarray(1.0, dtype)
        zero = jnp.asarray(0.0, dtype)
        half = jnp.asarray(0.5, dtype)
        big = jnp.asarray(_BIG, dtype)
        ms = jnp.asarray(float(min_samples), dtype)
        kf = jnp.asarray(float(k_pad), dtype)
        mc = jnp.asarray(float(max_clusters), dtype)
        neg = jnp.asarray(-1.0, dtype)
        val_all = val_ref[:]  # (F, K)
        eps_all = eps_ref[:]  # (F, 1)
        rows = []
        for f in range(frames):
            p = pts_ref[f]  # (K, 3)
            v_col = val_all[f][:, None]  # (K, 1)
            v_row = val_all[f][None, :]  # (1, K)
            e = eps_all[f, 0]
            # diff-form distances — the same arithmetic as the jnp
            # dense path (cluster.py:112-113), one coordinate at a time
            acc = None
            for kk in range(3):
                c = p[:, kk]
                d = c[:, None] - c[None, :]
                acc = d * d if acc is None else acc + d * d
            dist = jnp.sqrt(acc)  # (K, K)
            pair_valid = v_col * v_row
            adj = jnp.where(dist <= e, pair_valid, zero)  # incl. self
            # adjacency is symmetric: the row-sum (lane reduce) and
            # column-sum (sublane reduce) are the same integer-valued
            # neighbour counts in both orientations, summed exactly
            nn_col = jnp.sum(adj, axis=1, keepdims=True)
            nn_row = jnp.sum(adj, axis=0, keepdims=True)
            core_col = jnp.where(nn_col >= ms, v_col, zero)
            core_row = jnp.where(nn_row >= ms, v_row, zero)
            cadj = adj * core_col * core_row
            # Mosaic's iota is integer-only; convert (numeric, not i1)
            iota_col = jax.lax.broadcasted_iota(
                jnp.int32, (k_pad, 1), 0
            ).astype(dtype)
            iota_row = jax.lax.broadcasted_iota(
                jnp.int32, (1, k_pad), 1
            ).astype(dtype)
            lr0 = jnp.where(core_row > half, iota_row, big)
            lc0 = jnp.where(core_col > half, iota_col, big)

            def body(carry, cadj=cadj):
                lr, lc, _ = carry
                # each orientation updates from the OTHER's previous
                # value (cadj symmetric), so (lr, lc) stay exact
                # transposes and one body call == one jnp propagate
                # iteration (cluster.py:128-139)
                m1 = jnp.where(cadj > half, lr, big)
                new_c = jnp.minimum(
                    lc, jnp.min(m1, axis=1, keepdims=True)
                )
                m2 = jnp.where(cadj > half, lc, big)
                new_r = jnp.minimum(
                    lr, jnp.min(m2, axis=0, keepdims=True)
                )
                chg = jnp.max(jnp.where(new_r != lr, one, zero))
                return new_r, new_c, chg

            lr, lc, _ = jax.lax.while_loop(
                lambda s: s[2] > half, body, (lr0, lc0, one)
            )

            # border pass: min component label among core neighbours
            # (mask rows j by core[j]; adj[j, i] == adj[i, j])
            bmask = adj * core_col
            border = jnp.min(
                jnp.where(bmask > half, lc, big), axis=0, keepdims=True
            )
            raw = jnp.where(
                core_row > half,
                lr,
                jnp.where(v_row > half, border, big),
            )
            # renumber by ascending root index via an exact masked
            # count (cluster._finalise's gather-free rank)
            is_root_col = jnp.where(lc == iota_col, core_col, zero)
            cnt = jnp.sum(
                jnp.where(iota_col <= raw, is_root_col, zero),
                axis=0,
                keepdims=True,
            )
            rank = cnt - one
            out = jnp.where(
                raw >= kf, neg, jnp.where(rank >= mc, neg, rank)
            )
            rows.append(out)
        block = rows[0] if frames == 1 else jnp.concatenate(rows, axis=0)
        out_ref[:] = block.astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        grid=(b_pad // frames,),
        in_specs=[
            pl.BlockSpec(
                (frames, k_pad, 3),
                lambda i: (i, _i32(0), _i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (frames, k_pad),
                lambda i: (i, _i32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (frames, 1), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (frames, k_pad), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, k_pad), jnp.int32),
        interpret=interpret,
    )(pts, val, epsc)
    return out[:b, :k]


@functools.lru_cache(maxsize=16)
def _dbscan_nd(min_samples: int, max_clusters: int):
    """Rank-polymorphic, vmap-transparent kernel entry (the
    lbfgsb_pallas._stable_opt_nd custom_vmap pattern)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def run(points, valid, eps):
        lead = points.shape[:-2]
        k = points.shape[-2]
        b = 1
        for s in lead:
            b *= s
        labels = dbscan_labels_flat(
            points.reshape((b, k, 3)),
            valid.reshape((b, k)).astype(points.dtype),
            eps.reshape((b,)).astype(points.dtype),
            min_samples,
            max_clusters,
        )
        n_clusters = jnp.max(labels, axis=-1) + 1
        return labels.reshape(lead + (k,)), n_clusters.reshape(lead)

    @run.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        bargs = []
        for a, b_ in zip(args, in_batched):
            if not b_:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            bargs.append(a)
        return run(*bargs), (True, True)

    return run


def dbscan_pallas(
    points: jnp.ndarray,  # (K, 3)
    valid: jnp.ndarray,  # (K,) bool
    eps: jnp.ndarray,  # ()
    min_samples: int = 5,
    max_clusters: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for :func:`pywindow_tpu.ops.cluster.dbscan` through the
    fused kernel.  Safe under any vmap nesting."""
    run = _dbscan_nd(int(min_samples), int(max_clusters))
    return run(points, valid, jnp.asarray(eps, points.dtype))


def route_dbscan_to_pallas(k: int) -> bool:
    """Route the window clustering to the fused Pallas kernel?

    TPU only (elsewhere interpret mode would be slower than the jnp
    path); ``PYWINDOW_TPU_NO_PALLAS=1`` (global kill switch) or
    ``PYWINDOW_TPU_NO_DBSCAN_PALLAS=1`` (this kernel only) disable it;
    ``PYWINDOW_TPU_FORCE_DBSCAN_PALLAS=1`` forces routing on any
    backend (interpret mode on CPU) — for integration tests of the
    routed path.  ``k`` is the compact open-ray cap: above
    ``_K_LIMIT`` the (K, K) working set would spill scoped VMEM, so
    the dense jnp path keeps those (hypothetical) systems.
    """
    import os

    if k > _K_LIMIT:
        return False
    if os.environ.get("PYWINDOW_TPU_NO_PALLAS"):
        return False
    if os.environ.get("PYWINDOW_TPU_NO_DBSCAN_PALLAS"):
        return False
    if os.environ.get("PYWINDOW_TPU_FORCE_DBSCAN_PALLAS"):
        return True
    return jax.default_backend() == "tpu"
