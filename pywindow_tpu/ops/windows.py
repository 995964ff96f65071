"""The window-finding pipeline, fully on device.

Reproduces ``find_windows`` (reference: utilities.py:1364-1553) and the
per-cluster refinement ``window_analysis`` (reference:
utilities.py:1191-1361) as one jit-able function over padded arrays:

1. shift the molecule so the (optionally optimised) pore centre sits at
   the origin,
2. golden-spiral rays over a sphere of radius max_dim/2; analytic
   pre-analysis culls blocked rays; surviving rays are path-sampled at
   1 A steps and kept only if the whole path has positive clearance,
3. DBSCAN over the surviving rays' sphere points (eps = mean 10-NN
   distance + its square root),
4. per cluster: the widest ray is re-sampled at 0.1 A, the molecule is
   rotated so that ray becomes +Z (the reference's per-octant angle-sign
   table), translated so the ray's narrowest point is the origin, then
   the window centre is refined: bounded 1-D minimisation in z
   (L-BFGS-B mimic), 20x20 brute grid + Nelder-Mead polish in xy,
5. window diameter = clearance diameter at the refined centre; the
   centre is rotated back and reported in the input frame.

Window count is padded to ``cfg.max_windows`` with a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pywindow_tpu.config import AnalysisConfig
from pywindow_tpu.ops import rays
from pywindow_tpu.ops.cluster import dbscan
from pywindow_tpu.ops.encoding import MolArrays
from pywindow_tpu.ops.geometry import (
    BIG,
    center_of_mass,
    clearance_diff,
    clearance_field,
    max_dim_value,
    pore_diameter,
)
from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize, lbfgsb_minimize_stable
from pywindow_tpu.ops.optim import brute_then_polish


class WindowsResult(NamedTuple):
    """Padded window set for one molecule."""

    diameters: jnp.ndarray  # (W,)
    centers: jnp.ndarray  # (W, 3) in the input coordinate frame
    valid: jnp.ndarray  # (W,) bool
    any_open: jnp.ndarray  # scalar bool; False == reference's None return
    n_clusters: jnp.ndarray  # scalar int32 (before refinement failures)
    refine_failed: jnp.ndarray  # (W,) bool, for warning parity
    open_overflow: jnp.ndarray  # scalar bool: open rays exceeded the
    #                             compaction cap (host retries with a
    #                             doubled cfg.open_cap_frac)
    opt_capped: jnp.ndarray | bool = False  # scalar bool: an optimiser
    #                             stage of the pore centre or a REAL
    #                             window slot stopped on its fast
    #                             iteration budget (host retries with
    #                             cfg.fast_budgets=False)


def open_cap(n_points: int, frac: float) -> int | None:
    """Compacted open-ray slot count, or ``None`` when compaction is off.

    Rounded up to a 128 lane multiple; a cap that would not actually
    shrink the sweep disables compaction.
    """
    if frac >= 1.0:
        return None
    import math

    k = ((int(math.ceil(n_points * frac)) + 127) // 128) * 128
    return k if k < n_points else None


def _octant_angles(vector: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation angles taking ``vector`` to +Z, with the reference's
    per-octant sign table (reference: utilities.py:1235-1258)."""
    vx, vy, vz = vector[0], vector[1], vector[2]
    dtype = vector.dtype
    two_pi = jnp.asarray(2.0 * jnp.pi, dtype)
    pi = jnp.asarray(jnp.pi, dtype)

    # angle_between uses |dot| so both raw angles are in [0, pi/2]
    # (reference: utilities.py:1088-1097).
    xy_norm = jnp.sqrt(vx * vx + vy * vy)
    a1r = jnp.arccos(jnp.clip(jnp.abs(vx) / xy_norm, 0.0, 1.0))
    vnorm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    a2r = jnp.arccos(jnp.clip(jnp.abs(vz) / vnorm, 0.0, 1.0))

    xp = vx >= 0
    yp = vy >= 0
    zp = vz >= 0

    a1 = jnp.where(
        zp,
        jnp.where(
            xp,
            jnp.where(yp, -a1r, a1r),
            jnp.where(yp, two_pi + a1r, two_pi - a1r),
        ),
        jnp.where(
            xp,
            jnp.where(yp, -a1r, a1r),
            jnp.where(yp, a1r, -a1r),
        ),
    )
    a2 = jnp.where(
        zp,
        jnp.where(xp, -a2r, a2r),
        jnp.where(xp, pi + a2r, pi - a2r),
    )
    return a1, a2


def _rot_z(angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z]),
            jnp.stack([s, c, z]),
            jnp.stack([z, z, o]),
        ]
    )


def _rot_y(angle: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s]),
            jnp.stack([z, o, z]),
            jnp.stack([-s, z, c]),
        ]
    )


class _ZRes(NamedTuple):
    """Minimal result view of a routed z optimisation (x, capped)."""

    x: jnp.ndarray
    capped: jnp.ndarray


def _route_z_pallas() -> bool:
    """Route the window-z stable stage to the fused Pallas kernel?

    Same policy as the pore stage (TPU, or forced for tests) — see
    :func:`pywindow_tpu.ops.lbfgsb_pallas.route_opt_to_pallas`.
    """
    from pywindow_tpu.ops.lbfgsb_pallas import route_opt_to_pallas

    return route_opt_to_pallas()


def _z_stable_probe(rmol: MolArrays, xy: jnp.ndarray):
    """Symbolic-difference evaluator of the window z objective.

    ``f(z) = 2 * clearance((xy_0, xy_1, z))`` on the rotated molecule
    (reference: ``optimise_z``, utilities.py:1174-1188).  Returns the
    ``(probe, f_abs)`` pair for
    :func:`pywindow_tpu.ops.lbfgsb.lbfgsb_minimize_stable`: deltas and
    FD numerators go through :func:`clearance_diff`, so scipy's
    ``h = 1e-8`` step and the line-search decrease tests work verbatim
    in float32.
    """
    dtype = rmol.coords.dtype
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)

    def embed(zv):  # (1,) -> (3,)
        return jnp.stack([xy[0], xy[1], zv[0]])

    def probe(zv, disp, h):
        x3 = embed(zv)
        dd = disp[0] * ez
        delta = 2.0 * clearance_diff(x3, dd[None, :], rmol)[0]
        p3 = x3 + dd
        dprobe = 2.0 * clearance_diff(p3, h[:, None] * ez[None, :], rmol)
        return delta, dprobe / h

    def f_abs(zv):
        return 2.0 * clearance_field(embed(zv)[None, :], rmol)[0]

    return probe, f_abs


def _window_refine(
    mol: MolArrays,
    vector: jnp.ndarray,
    ok: jnp.ndarray,
    new_z: jnp.ndarray,
    cfg: AnalysisConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Refine one window from its widest sampling ray.

    Returns (diameter, centre (3,), ok, capped).  ``mol`` is the
    pore-centred molecule; ``vector`` the cluster's widest ray (a
    spiral point); ``ok``/``new_z`` come from the fine re-sampling of
    that ray (done for all window slots in one batched sweep by the
    caller).  ``capped`` is True when any optimiser stage stopped on
    its (possibly fast, cfg.fast_budgets) iteration budget.
    """
    from pywindow_tpu.config import effective_budgets, window_opt_mode

    opt_maxiter, nm_maxiter = effective_budgets(cfg)
    dtype = vector.dtype
    stable = window_opt_mode(dtype) == "stable"
    a1, a2 = _octant_angles(vector)
    rz = _rot_z(a1)
    ry = _rot_y(a2)
    # full-f32 precision: TPU's default bf16 matmul would corrupt the
    # rotated coordinates at the 1e-2 level.
    hi = jax.lax.Precision.HIGHEST
    coords = jnp.matmul(
        jnp.matmul(mol.coords, rz.T, precision=hi), ry.T, precision=hi
    )
    coords = coords - jnp.asarray([0.0, 0.0, 1.0], dtype) * new_z
    rmol = mol._replace(coords=coords)

    wd0 = 2.0 * clearance_field(jnp.zeros((1, 3), dtype), rmol)[0]

    # --- z minimisation (reference: utilities.py:1299-1305) -----------
    z_lower = jnp.where(
        jnp.asarray(cfg.lb_z), -new_z, jnp.asarray(-1e10, dtype)
    )
    z0 = jnp.zeros((1,), dtype)
    z_up = jnp.asarray([1e10], dtype)
    if stable and _route_z_pallas():
        # TPU production: the fused Pallas optimiser kernel, dispatched
        # ONCE for all (frame, window) lanes — the custom_vmap wrapper
        # collapses the nested vmaps (see ops/lbfgsb_pallas.py).
        from pywindow_tpu.ops.lbfgsb_pallas import z_opt_stable_pallas

        zx, z_capped = z_opt_stable_pallas(
            rmol.coords, rmol.vdw, jnp.zeros((2,), dtype), z0,
            z_lower[None].astype(dtype), z_up, maxiter=opt_maxiter,
        )
        zres = _ZRes(x=zx, capped=z_capped)
    elif stable:
        probe, f_abs = _z_stable_probe(rmol, jnp.zeros((2,), dtype))
        zres = lbfgsb_minimize_stable(
            probe, f_abs, z0, z_lower[None].astype(dtype), z_up,
            maxiter=opt_maxiter,
        )
    else:

        def f_z(zs):  # (K, 1) -> (K,)
            pts = jnp.concatenate(
                [jnp.zeros((zs.shape[0], 2), dtype), zs], axis=-1
            )
            return 2.0 * clearance_field(pts, rmol)

        zres = lbfgsb_minimize(
            f_z, z0, z_lower[None].astype(dtype), z_up,
            maxiter=opt_maxiter,
        )
    z_star = zres.x[0]
    capped = zres.capped

    # --- xy brute grid + Nelder-Mead polish (utilities.py:1307-1317) --
    if stable:
        # delta space: every candidate evaluated as f(p) - f(anchor)
        # through the symbolic-difference kernel.  The brute argmin and
        # every Nelder-Mead comparison/convergence test consume only
        # differences of these deltas (~O(1) magnitudes), not absolute
        # clearances (~O(10)) — full f32 relative precision where plain
        # f32 comparisons carry ~1e-6 cancellation noise.  Selection is
        # otherwise identical (NM is translation-invariant in f).
        anchor = jnp.stack(
            [jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype), z_star]
        )

        def f_xy(xy):  # (2,) -> scalar: f(p) - f(anchor)
            disp = jnp.stack([xy[0], xy[1], jnp.asarray(0.0, dtype)])
            return -2.0 * clearance_diff(anchor, disp[None, :], rmol)[0]

        def f_xy_batch(xys):  # (K, 2) -> (K,): one fused diff call
            disp = jnp.concatenate(
                [xys, jnp.zeros((xys.shape[0], 1), dtype)], axis=-1
            )
            return -2.0 * clearance_diff(anchor, disp, rmol)

    else:

        def f_xy(xy):  # (2,) -> scalar, negative diameter (maximise)
            pt = jnp.stack([xy[0], xy[1], z_star])[None, :]
            return -2.0 * clearance_field(pt, rmol)[0]

        def f_xy_batch(xys):  # (K, 2) -> (K,): one fused clearance call
            pts = jnp.concatenate(
                [xys, jnp.full((xys.shape[0], 1), z_star, dtype)], axis=-1
            )
            return -2.0 * clearance_field(pts, rmol)

    half = wd0 / 2.0
    if stable and _route_z_pallas():
        # TPU production: brute grid AND Nelder-Mead polish fused into
        # ONE Pallas dispatch for all frame x window lanes — the XLA
        # grid pass re-streamed the (B, W, ns^2, N) clearance
        # intermediate through HBM (~43 ms at B=4320); in-kernel the
        # grid reuses the VMEM anchor context (see ops/nm_pallas.py)
        from pywindow_tpu.ops.nm_pallas import brute_nm_xy_stable_pallas

        xy_star, _, nm_capped = brute_nm_xy_stable_pallas(
            rmol.coords, rmol.vdw, z_star, half, ns=cfg.brute_ns,
            maxiter=nm_maxiter,
        )
    else:
        xy_star, _, nm_capped = brute_then_polish(
            f_xy,
            jnp.stack([-half, -half]),
            jnp.stack([half, half]),
            ns=cfg.brute_ns,
            maxiter=nm_maxiter,
            f_batch=f_xy_batch,
        )
    capped = capped | nm_capped

    if cfg.z_second_mini:
        if stable and _route_z_pallas():
            from pywindow_tpu.ops.lbfgsb_pallas import z_opt_stable_pallas

            zx2, z2_capped = z_opt_stable_pallas(
                rmol.coords, rmol.vdw, xy_star, zres.x,
                z_lower[None].astype(dtype), z_up, maxiter=opt_maxiter,
            )
            zres2 = _ZRes(x=zx2, capped=z2_capped)
        elif stable:
            probe2, f_abs2 = _z_stable_probe(rmol, xy_star)
            zres2 = lbfgsb_minimize_stable(
                probe2, f_abs2, zres.x, z_lower[None].astype(dtype),
                z_up, maxiter=opt_maxiter,
            )
        else:

            def f_z2(zs):
                pts = jnp.concatenate(
                    [
                        jnp.broadcast_to(xy_star, (zs.shape[0], 2)),
                        zs,
                    ],
                    axis=-1,
                )
                return 2.0 * clearance_field(pts, rmol)

            zres2 = lbfgsb_minimize(
                f_z2, zres.x, z_lower[None].astype(dtype), z_up,
                maxiter=opt_maxiter,
            )
        z_star = zres2.x[0]
        capped = capped | zres2.capped

    centre_local = jnp.stack([xy_star[0], xy_star[1], z_star])
    diameter = 2.0 * clearance_field(centre_local[None, :], rmol)[0]

    # reverse the transforms (utilities.py:1338-1360)
    centre = centre_local + jnp.asarray([0.0, 0.0, 1.0], dtype) * new_z
    centre = jnp.matmul(_rot_y(-a2), centre, precision=hi)
    centre = jnp.matmul(_rot_z(-a1), centre, precision=hi)
    return diameter, centre, ok, capped


def find_windows(
    mol: MolArrays,
    n_points: int,
    l1: int,
    l2: int,
    cfg: AnalysisConfig,
    pore_centre: jnp.ndarray | None = None,
) -> WindowsResult:
    """Full window detection for one molecule (input frame coordinates).

    ``pore_centre``: optionally reuse an already-optimised pore centre
    (the reference reruns the optimisation inside find_windows,
    utilities.py:1388 — inside one fused jit the rerun is pure waste,
    and the optimiser is deterministic so the result is identical).
    """
    dtype = mol.coords.dtype
    initial_com = center_of_mass(mol)
    # no interior at the COM -> no pore -> no windows (the reference
    # crashes here instead: inverted scipy bounds from a negative pore
    # radius, utilities.py:416-421).
    pd_com, _ = pore_diameter(mol, com=initial_com)
    has_pore = pd_com > 0.0

    pore_capped = jnp.asarray(False)
    if pore_centre is not None and cfg.pore_opt:
        centre = pore_centre
    elif cfg.pore_opt:
        from pywindow_tpu.ops.analysis import optimise_pore_centre_res

        centre, pore_capped = optimise_pore_centre_res(mol, cfg)
    else:
        centre = initial_com

    shifted = mol._replace(coords=mol.coords - centre[None, :])

    md = max_dim_value(shifted)
    radius = md / 2.0
    points = rays.golden_spiral(n_points, radius, dtype=dtype)
    eps = rays.mean_knn_eps_scaled(n_points, radius)

    open_pre = rays.preanalysis_open(points, shifted)

    # --- open-ray compaction ------------------------------------------
    # The coarse path sweep and the DBSCAN only ever consume rays the
    # analytic pre-analysis left open (blocked rays can neither survive
    # nor cluster), and open rays are typically 0-60% of the spiral.
    # Compact them — order-preserving — into K static slots via an
    # exact one-hot matmul (MXU-friendly; a TPU gather here would
    # serialise), and run both stages in compact space.  Every
    # downstream quantity (cluster renumbering by first core index,
    # widest-ray argmax tie-breaks) depends only on relative order, so
    # results are bitwise identical to the full-spiral path whenever
    # the open count fits the cap; overflow is flagged for the host's
    # escalation retry (see parallel.batch.retry_saturated_windows).
    kcap = open_cap(n_points, cfg.open_cap_frac)
    if kcap is None:
        cpoints = points
        path = rays.path_analysis(points, shifted, cfg.increment, l1)
        survives = open_pre & path.ok & has_pore
        overflow = jnp.asarray(False)
    else:
        openb = open_pre
        pos = jnp.cumsum(openb.astype(jnp.int32)) - 1  # (P,)
        n_open = jnp.sum(openb.astype(jnp.int32))
        overflow = n_open > kcap
        slot = jnp.arange(kcap, dtype=jnp.int32)  # (K,)
        onehot = (pos[None, :] == slot[:, None]) & openb[None, :]
        cpoints = jnp.matmul(
            onehot.astype(dtype),
            points,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K, 3): exact — one 1.0 coefficient per row, rest 0.0
        slot_valid = slot < jnp.minimum(n_open, kcap)
        path = rays.path_analysis(cpoints, shifted, cfg.increment, l1)
        survives = slot_valid & path.ok & has_pore
    any_open = jnp.any(survives)

    # dense eps-graph: measured faster than the (P, K) candidate-list
    # variant on TPU (gathers lose to the regular (P, P) compute here;
    # cluster.dbscan_spiral remains available for gather-friendly
    # backends).  On TPU the whole clustering fuses into one Pallas
    # program per frame tile (VMEM-resident adjacency — the jnp path's
    # (B, K, K) HBM predicate was ~67 ms of the B=8640 step).
    from pywindow_tpu.ops.cluster_pallas import (
        dbscan_pallas,
        route_dbscan_to_pallas,
    )

    if route_dbscan_to_pallas(cpoints.shape[0]):
        labels, n_clusters = dbscan_pallas(
            cpoints,
            survives,
            eps,
            min_samples=cfg.dbscan_min_samples,
            max_clusters=cfg.max_windows,
        )
    else:
        labels, n_clusters = dbscan(
            cpoints,
            survives,
            eps,
            min_samples=cfg.dbscan_min_samples,
            max_clusters=cfg.max_windows,
        )

    # any valid surviving ray: empty window slots refine this instead of
    # a garbage vector, so their (discarded) optimiser lanes converge
    # fast rather than stalling the vmapped batch at max iterations.
    fallback_sel = jnp.argmax(jnp.where(survives, path.width, -BIG))

    # widest-ray selection + fine 0.1A re-sampling for ALL window slots
    # in one batched sweep: one (W, L2, N) pass (Pallas-routable on TPU)
    # instead of W separate (1, L2, N) HBM intermediates.
    w_ids = jnp.arange(cfg.max_windows, dtype=jnp.int32)
    in_cluster = labels[None, :] == w_ids[:, None]  # (W, K)
    width_masked = jnp.where(in_cluster, path.width[None, :], -BIG)
    exists = (w_ids < n_clusters) & jnp.any(in_cluster, axis=-1)
    sel = jnp.where(exists, jnp.argmax(width_masked, axis=-1), fallback_sel)
    vectors = cpoints[sel]  # (W, 3)
    refined = rays.path_analysis(vectors, shifted, cfg.increment2, l2)

    def per_cluster(vector, r_ok, r_dist, ex):
        diameter, centre_local, ok, capped = _window_refine(
            shifted, vector, r_ok, r_dist, cfg
        )
        return diameter, centre_local, ex, ex & ~ok, capped

    # vmap (not lax.map): the refinement optimisers are tiny per-lane,
    # so running all window slots lockstep beats a serial scan ~10x.
    diams, centres, exists, failed, w_capped = jax.vmap(per_cluster)(
        vectors, refined.ok, refined.dist, exists
    )
    valid = exists & ~failed
    centres = centres + centre[None, :]
    # budget escalation: only REAL window slots count (fallback lanes
    # refine a throwaway ray; their optimiser behaviour is irrelevant)
    opt_capped = pore_capped | jnp.any(exists & w_capped)
    return WindowsResult(
        diameters=jnp.where(valid, diams, jnp.nan),
        centers=jnp.where(valid[:, None], centres, jnp.nan),
        valid=valid,
        any_open=any_open,
        n_clusters=n_clusters,
        refine_failed=failed,
        open_overflow=overflow,
        opt_capped=opt_capped,
    )
