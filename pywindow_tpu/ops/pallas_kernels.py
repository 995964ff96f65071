"""Pallas TPU kernel for the vdW clearance field.

``clearance(p) = min_i(||x_i - p|| - vdw_i)`` is the framework's hot
primitive (see ops/geometry.py).  This module provides a hand-tiled
Pallas implementation that keeps the molecule resident in VMEM and
streams probe tiles through the VPU, as an alternative to the
XLA-fused jnp version.

Honest status (see tests/test_pallas.py and CLAUDE.md): the analysis
pipeline is latency-bound on optimiser loops, not clearance compute, so
it is NOT routed through this kernel — XLA's fusion is already at the
bandwidth limit there.  This is a standalone primitive for the large-N
regime (thousands of atoms, measured 2.1x at Q=65536/N=4096, bitwise
equal to the jnp path) for callers whose workloads are clearance-bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def clearance_min_pallas(
    probes: jnp.ndarray,  # (Q, 3)
    coords: jnp.ndarray,  # (N, 3) padded slots parked far away
    vdw: jnp.ndarray,  # (N,)
    tile_q: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:  # (Q,)
    """min over atoms of (||x - p|| - vdw) per probe, Pallas-tiled.

    Padded atoms must follow the MolArrays convention (coords ~1e6,
    vdw 0) so they can never win the min — no mask needed in-kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q, _ = probes.shape
    n = coords.shape[0]
    dtype = probes.dtype
    q_pad = _round_up(max(q, 8), tile_q)
    n_pad = _round_up(max(n, 128), 128)

    probes_p = jnp.zeros((q_pad, 3), dtype).at[:q].set(probes)
    coords_p = jnp.full((n_pad, 3), 1.0e6, dtype).at[:n].set(coords)
    vdw_p = jnp.zeros((n_pad,), dtype).at[:n].set(vdw)

    def kernel(p_ref, x_ref, r_ref, out_ref):
        p = p_ref[:]  # (tile_q, 3)
        x = x_ref[:]  # (n_pad, 3)
        r = r_ref[:]  # (1, n_pad)
        # diff-form distances: exact in f32 (the gram form cancels).
        # (tile_q, n_pad) built one coordinate at a time to keep the
        # working set at 2D tiles.
        acc = None
        for k in range(3):
            d = p[:, k][:, None] - x[:, k][None, :]
            acc = d * d if acc is None else acc + d * d
        dist = jnp.sqrt(acc) - r
        out_ref[:] = jnp.min(dist, axis=1, keepdims=True)

    out = pl.pallas_call(
        kernel,
        grid=(q_pad // tile_q,),
        in_specs=[
            pl.BlockSpec(
                (tile_q, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_pad, 3), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((q_pad, 1), dtype),
        interpret=interpret,
    )(probes_p, coords_p, vdw_p.reshape(1, n_pad))
    return out[:q, 0]
