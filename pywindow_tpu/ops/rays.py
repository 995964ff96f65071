"""Golden-spiral sampling and batched ray analysis.

The reference walks every sampling vector in a Python loop with a fresh
sklearn distance matrix per step (reference: utilities.py:1100-1161,
:1556-1583).  Here all P rays x L path steps x N atoms are evaluated as one
fused masked reduction on device.

Geometry note shared by all ray kernels: rays start at the *coordinate
mean* of the (already COM/pore-centre-shifted) molecule and run along unit
vectors towards points on a sampling sphere centred at the origin; the
analytic ray/vdW-sphere intersection uses the standard quadratic with
half-chord ``t_hc`` (reference: utilities.py:1138-1158).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pywindow_tpu.ops.encoding import MolArrays
from pywindow_tpu.ops.geometry import BIG, center_of_coor, clearance_field


def number_of_points(sphere_radius: float, adjust: float = 1.0) -> int:
    """Sampling-point count for a sphere radius (host-side, static).

    ``int(log10(4 pi r^2) * 250 * adjust)`` — tuned by the reference to
    ~1 point per A^2 at r ~ 24 A (reference: utilities.py:1398-1409).
    """
    import numpy as np

    area = 4.0 * np.pi * float(sphere_radius) ** 2
    return int(np.log10(area) * 250.0 * adjust)


def golden_spiral(n_points: int, radius, dtype=None) -> jnp.ndarray:
    """``n_points`` spiral points on a sphere of ``radius`` (traced OK).

    Alexandre Devert's golden-angle spiral, identical point layout to the
    reference (utilities.py:1410-1423).  Every point has norm exactly
    ``radius``.
    """
    dtype = dtype or jnp.result_type(float)
    golden_angle = jnp.pi * (3.0 - jnp.sqrt(jnp.asarray(5.0, dtype)))
    k = jnp.arange(n_points, dtype=dtype)
    theta = golden_angle * k
    z = jnp.linspace(
        1.0 - 1.0 / n_points, 1.0 / n_points - 1.0, n_points, dtype=dtype
    )
    rho = jnp.sqrt(1.0 - z * z)
    return radius * jnp.stack(
        [rho * jnp.cos(theta), rho * jnp.sin(theta), z], axis=-1
    )


def mean_knn_eps(points: jnp.ndarray, k: int = 10) -> jnp.ndarray:
    """DBSCAN eps: mean k-NN distance (self included) plus its square root.

    reference: utilities.py:1424-1434 — the KDTree query there includes the
    query point itself (distance 0) among the k neighbours.
    """
    diff = points[:, None, :] - points[None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    nearest = -jax.lax.top_k(-d, k)[0]  # (P, k) smallest distances per row
    m = jnp.mean(nearest)
    return m + jnp.sqrt(m)


@functools.lru_cache(maxsize=32)
def _unit_mean_knn(n_points: int, k: int, dtype_name: str) -> float:
    """Mean k-NN distance of the unit-radius spiral (host constant).

    The spiral layout is fixed by ``n_points``; the k-NN mean scales
    linearly with the radius, so the P x P distance matrix needs
    computing once per point count, not once per molecule.  Pure numpy:
    this runs during tracing, where jnp ops would be staged out.
    """
    import numpy as np

    dtype = np.dtype(dtype_name)
    golden_angle = np.pi * (3.0 - np.sqrt(dtype.type(5.0)))
    kk = np.arange(n_points, dtype=dtype)
    theta = golden_angle * kk
    z = np.linspace(
        1.0 - 1.0 / n_points, 1.0 / n_points - 1.0, n_points, dtype=dtype
    )
    rho = np.sqrt(1.0 - z * z)
    pts = np.stack(
        [rho * np.cos(theta), rho * np.sin(theta), z], axis=-1
    )
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    nearest = np.sort(d, axis=1)[:, :k]
    return float(nearest.mean())


def mean_knn_eps_scaled(
    n_points: int, radius: jnp.ndarray, k: int = 10
) -> jnp.ndarray:
    """eps for a spiral of ``radius``: ``m*r + sqrt(m*r)`` with the
    unit-sphere k-NN mean ``m`` precomputed per point count.

    Equal to :func:`mean_knn_eps` up to ~1e-15 relative (scaling of the
    spiral commutes with the distance mean to FP rounding)."""
    dtype = jnp.result_type(radius, 1.0)
    m_unit = _unit_mean_knn(n_points, k, jnp.dtype(dtype).name)
    m = radius * m_unit
    return m + jnp.sqrt(m)


class RayIntersections(NamedTuple):
    """Per (ray, atom) analytic sphere-intersection quantities."""

    hits: jnp.ndarray  # (..., P, N) bool: vdw sphere crosses ray line
    front: jnp.ndarray  # (..., P, N) bool: entry point closer to origin
    exit_norm: jnp.ndarray  # (..., P, N) |p1|, distance of far intersection


def ray_sphere_intersections(
    points: jnp.ndarray, mol: MolArrays
) -> RayIntersections:
    """Analytic intersections of each sampling ray with every vdW sphere."""
    norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
    unit = points / norm  # (..., P, 3)
    origin = center_of_coor(mol)  # (..., 3)
    rel = jnp.where(
        mol.mask[..., None], mol.coords - origin[..., None, :], 0.0
    )  # (..., N, 3)
    # full-f32 precision: the TPU matmul default (bf16 multiplies) loses
    # ~3 decimal digits, which is fatal for the near-tangent hit tests.
    t_ca = jnp.einsum(
        "...pi,...ni->...pn", unit, rel, precision=jax.lax.Precision.HIGHEST
    )
    # Perpendicular distance via the stable vector form
    # d = |rel - (rel.u) u| : the naive |rel|^2 - t_ca^2 cancels
    # catastrophically in float32 and flips near-tangent hits.
    perp = rel[..., None, :, :] - t_ca[..., None] * unit[..., :, None, :]
    d2 = jnp.sum(perp * perp, axis=-1)  # (..., P, N)
    under = mol.vdw[..., None, :] ** 2 - d2
    hits = (under > 0.0) & mol.mask[..., None, :]
    t_hc = jnp.sqrt(jnp.where(hits, under, 0.0))
    t0 = t_ca - t_hc
    t1 = t_ca + t_hc
    # p = origin + t * unit, built as vectors (stable in float32).
    o = origin[..., None, None, :]
    u = unit[..., :, None, :]
    p0 = o + t0[..., None] * u
    p1 = o + t1[..., None] * u
    p0_norm2 = jnp.sum(p0 * p0, axis=-1)
    p1_norm2 = jnp.sum(p1 * p1, axis=-1)
    front = hits & (p0_norm2 < p1_norm2)
    exit_norm = jnp.sqrt(p1_norm2)
    return RayIntersections(hits=hits, front=front, exit_norm=exit_norm)


def _ray_exit_fused(
    points: jnp.ndarray, mol: MolArrays, want_exit: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(any_front, max_exit) per ray via the fused Pallas kernel.

    ``want_exit=False`` compiles the slim any-front-only kernel (no
    sqrt in the (atoms x rays) block); ``max_exit`` is then -1e30."""
    from pywindow_tpu.ops.pallas_kernels import ray_exit_pallas

    norm = jnp.linalg.norm(points, axis=-1, keepdims=True)
    unit = points / norm
    origin = center_of_coor(mol)
    rel = jnp.where(
        mol.mask[..., None], mol.coords - origin[..., None, :], 0.0
    )
    anyf, mexit = ray_exit_pallas(
        unit, rel, mol.vdw, origin, want_exit=want_exit
    )
    return anyf > 0.5, mexit


def preanalysis_open(
    points: jnp.ndarray, mol: MolArrays, use_pallas: bool | None = None
) -> jnp.ndarray:
    """True for rays with zero blocking ('front') sphere intersections.

    reference: utilities.py:1132-1161 (``vector_preanalysis``).
    """
    if use_pallas is None:
        use_pallas = _route_path_to_pallas(points.shape[-2])
    if use_pallas:
        anyf, _ = _ray_exit_fused(points, mol, want_exit=False)
        return ~anyf
    inter = ray_sphere_intersections(points, mol)
    return ~jnp.any(inter.front, axis=-1)


class PathAnalysis(NamedTuple):
    """Result of sampling clearance along each ray path."""

    ok: jnp.ndarray  # (..., P) all path clearances positive
    dist: jnp.ndarray  # (..., P) distance from origin to narrowest point
    width: jnp.ndarray  # (..., P) 2 * clearance at the narrowest point
    narrow: jnp.ndarray  # (..., P, 3) coordinates of the narrowest point


def _route_path_to_pallas(n_rays: int) -> bool:
    """Route the path sweep to the fused Pallas kernel?

    On TPU, always (the jnp formulation's (B, P*L, N) HBM intermediates
    are the batch ceiling; even the W-slot refinement sweep adds a
    (B, W, L2, N) block).  ``PYWINDOW_TPU_NO_PALLAS=1`` disables
    routing entirely (debug escape hatch).
    """
    import os

    if os.environ.get("PYWINDOW_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu" and n_rays >= 8


def _path_small_p_chunked(
    vectors: jnp.ndarray,
    chunks: jnp.ndarray,
    mol: MolArrays,
    max_steps: int,
    chunk_len: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Step-chunked path sweep for few-ray calls.

    Scans the path in ``chunk_len``-step blocks, each a fused
    (..., P, chunk, N) clearance evaluation reduced immediately into
    running (ok, argmin-step, min-clearance) carries.  Exactly the
    dense-path arithmetic (same probe points, same masks, argmin keeps
    the first minimum); peak memory is a single chunk block.
    Returns (ok, posf, width).
    """
    dtype = vectors.dtype
    chunksf = chunks.astype(dtype)
    n_chunks = (max_steps + chunk_len - 1) // chunk_len
    pad_steps = n_chunks * chunk_len
    step_blocks = jnp.arange(pad_steps, dtype=dtype).reshape(
        n_chunks, chunk_len
    )

    shape_p = vectors.shape[:-1]  # (..., P)
    init = (
        jnp.ones(shape_p, dtype=bool),
        jnp.zeros(shape_p, dtype),
        jnp.full(shape_p, BIG, dtype),
    )

    def blk(carry, steps):
        ok, pos, cmin = carry
        frac = steps / chunksf[..., None]  # (..., P, chunk)
        pathway = vectors[..., None, :] * frac[..., None]
        flat = pathway.reshape(*pathway.shape[:-3], -1, 3)
        c = clearance_field(flat, mol).reshape(pathway.shape[:-1])
        valid = (steps.astype(jnp.int32) <= chunks[..., None]) & (
            steps < max_steps
        )
        ok = ok & jnp.all((c > 0.0) | ~valid, axis=-1)
        c_masked = jnp.where(valid, c, BIG)
        blk_min = jnp.min(c_masked, axis=-1)
        blk_pos = steps[jnp.argmin(c_masked, axis=-1)]
        # strict <: earlier chunks keep first-minimum ties, matching the
        # dense argmin
        better = blk_min < cmin
        cmin = jnp.where(better, blk_min, cmin)
        pos = jnp.where(better, blk_pos, pos)
        return (ok, pos, cmin), None

    (ok, pos, cmin), _ = jax.lax.scan(blk, init, step_blocks)
    return ok, pos, 2.0 * cmin


def path_analysis(
    vectors: jnp.ndarray,
    mol: MolArrays,
    increment: float,
    max_steps: int,
    use_pallas: bool | None = None,
) -> PathAnalysis:
    """Walk each vector from the origin in ``increment`` steps.

    ``chunks = floor(|v| / increment)`` pieces; clearance is evaluated at
    the ``chunks + 1`` points ``i * v / chunks`` and the ray is open iff
    every clearance is positive (reference: utilities.py:1100-1129).
    ``max_steps`` is the static padding bound (must exceed any chunks+1).

    ``use_pallas=None`` auto-routes large sweeps on TPU through the
    fused :func:`~pywindow_tpu.ops.pallas_kernels.path_sweep_pallas`
    kernel, which never materialises the (P, L, N) intermediate in HBM.
    """
    norm = jnp.linalg.norm(vectors, axis=-1)  # (..., P)
    chunks = jnp.maximum(
        jnp.floor(norm / increment).astype(jnp.int32), 1
    )  # (..., P)
    if use_pallas is None:
        use_pallas = _route_path_to_pallas(vectors.shape[-2])

    n_rays = vectors.shape[-2]
    if use_pallas and n_rays < 128:
        # few-ray sweeps (the W-slot refinement re-sampling): a Pallas
        # program per frame is dispatch/loop-overhead bound under vmap
        # (measured 41 ms vs ~6 ms at B=1440, W=8) — but a FRAMES-on-
        # lanes kernel (128 frames per program, ray slots unrolled)
        # uses the full VPU width; the custom_vmap wrapper collapses
        # the molecule vmap into that one dispatch and falls back to
        # the step-chunked scan for unbatched/small calls.
        from pywindow_tpu.ops.pallas_kernels import (
            _route_fine_to_pallas,
            fine_path_sweep,
        )

        if _route_fine_to_pallas():
            okf, posf, cmin = fine_path_sweep(
                vectors,
                chunks.astype(vectors.dtype),
                mol.coords,
                mol.vdw,
                max_steps,
            )
            ok = okf > 0.5
            width = 2.0 * cmin
        else:
            ok, posf, width = _path_small_p_chunked(
                vectors, chunks, mol, max_steps
            )
    elif use_pallas:
        from pywindow_tpu.ops.pallas_kernels import path_sweep_pallas

        okf, posf, cmin = path_sweep_pallas(
            vectors, chunks, mol.coords, mol.vdw, max_steps
        )
        ok = okf > 0.5
        width = 2.0 * cmin
    else:
        steps = jnp.arange(max_steps, dtype=vectors.dtype)  # (L,)
        frac = steps / chunks[..., None].astype(vectors.dtype)
        pathway = vectors[..., None, :] * frac[..., None]  # (..., P, L, 3)
        valid = steps.astype(jnp.int32) <= chunks[..., None]  # (..., P, L)

        # clearance at every path point: P*L probe points per molecule.
        flat = pathway.reshape(*pathway.shape[:-3], -1, 3)
        c = clearance_field(flat, mol).reshape(pathway.shape[:-1])

        ok = jnp.all((c > 0.0) | ~valid, axis=-1)
        c_masked = jnp.where(valid, c, BIG)
        pos = jnp.argmin(c_masked, axis=-1)  # (..., P)
        width = 2.0 * jnp.take_along_axis(
            c_masked, pos[..., None], axis=-1
        )[..., 0]
        posf = pos.astype(vectors.dtype)

    dist = norm * posf / chunks.astype(vectors.dtype)
    narrow = vectors * (posf / chunks.astype(vectors.dtype))[..., None]
    return PathAnalysis(ok=ok, dist=dist, width=width, narrow=narrow)


def reversed_exit_distance(
    points: jnp.ndarray, mol: MolArrays, use_pallas: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Farthest vdW-sphere exit along each ray, for the average diameter.

    Only 'front' intersections count; per ray the maximum ``|p1|`` wins
    (reference: utilities.py:1556-1583).  Returns (has_any, distance).
    """
    if use_pallas is None:
        use_pallas = _route_path_to_pallas(points.shape[-2])
    if use_pallas:
        return _ray_exit_fused(points, mol)
    inter = ray_sphere_intersections(points, mol)
    has = jnp.any(inter.front, axis=-1)
    dist = jnp.max(
        jnp.where(inter.front, inter.exit_norm, -BIG), axis=-1
    )
    return has, dist


def average_diameter(
    mol: MolArrays, n_points: int, sphere_radius
) -> jnp.ndarray:
    """Mean outline diameter over the sampling sphere.

    ``2 * mean_p(max exit distance)`` over rays that intersect anything;
    sampling radius is the *full* maximum diameter
    (reference: utilities.py:1586-1650).
    """
    points = golden_spiral(n_points, sphere_radius, dtype=mol.coords.dtype)
    has, dist = reversed_exit_distance(points, mol)
    total = jnp.sum(jnp.where(has, dist, 0.0), axis=-1)
    count = jnp.sum(has, axis=-1).astype(dist.dtype)
    return 2.0 * total / count
