"""Fused full-molecule analysis: the device pipeline behind
``Molecule.full_analysis`` (reference: molecular.py:156-202).

``full_analysis_device`` is one jit-able function computing every
property the reference accumulates across seven methods; the host
wrapper derives the static sampling sizes (point counts, path lengths)
from the molecule's maximum diameter, memoises the compiled kernels per
shape/config, and converts results into the reference's properties-dict
schema.
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pywindow_tpu.config import DEFAULT_CONFIG, AnalysisConfig
from pywindow_tpu.ops import rays
from pywindow_tpu.ops.encoding import MolArrays, encode
from pywindow_tpu.ops.geometry import (
    center_of_mass,
    clearance_field,
    max_dim,
    max_dim_value,
    molecular_weight,
    pore_diameter,
    shift_to,
    sphere_volume,
)
from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize
from pywindow_tpu.ops.windows import WindowsResult, find_windows

logger = logging.getLogger("pywindow_tpu")


class FullAnalysis(NamedTuple):
    """Everything ``full_analysis`` computes, as device arrays."""

    molecular_weight: jnp.ndarray
    centre_of_mass: jnp.ndarray  # (3,)
    maxd_atom_1: jnp.ndarray
    maxd_atom_2: jnp.ndarray
    maximum_diameter: jnp.ndarray
    average_diameter: jnp.ndarray
    pore_diameter: jnp.ndarray
    pore_atom: jnp.ndarray
    pore_volume: jnp.ndarray
    pore_opt_diameter: jnp.ndarray
    pore_opt_atom: jnp.ndarray
    pore_opt_centre: jnp.ndarray  # (3,)
    pore_opt_volume: jnp.ndarray
    windows: WindowsResult


def optimise_pore_centre_res(
    mol: MolArrays, cfg: AnalysisConfig = DEFAULT_CONFIG
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The optimised pore centre (L-BFGS-B from the COM, +-pore_r box;
    reference: utilities.py:400-426), plus the budget-capped flag.

    In float32 mode (TPU) a naive run stops ~0.13 Å off on plateau
    systems and seeds every window with the error, so the stage runs
    the symbolic-difference driver by default — float64 stopping
    behaviour at float32 speed (see :func:`pywindow_tpu.config.pore_opt_mode`).

    ``capped`` is True when the (possibly fast, see
    ``cfg.fast_budgets``) iteration budget stopped the optimiser —
    the host escalation re-runs such molecules at the full budget.
    """
    from pywindow_tpu.config import (
        effective_budgets,
        pore_opt_dtype,
        pore_opt_mode,
    )
    from pywindow_tpu.ops.geometry import pore_stable_probe
    from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize_stable

    opt_maxiter, _ = effective_budgets(cfg)
    mode = pore_opt_mode(mol.coords.dtype)
    omol = mol
    if mode == "promote":
        opt_dtype = pore_opt_dtype(mol.coords.dtype)
        if opt_dtype != mol.coords.dtype:
            omol = MolArrays(
                coords=mol.coords.astype(opt_dtype),
                mass=mol.mass.astype(opt_dtype),
                vdw=mol.vdw.astype(opt_dtype),
                cov=mol.cov.astype(opt_dtype),
                mask=mol.mask,
            )
    com = center_of_mass(omol)
    pd0, _ = pore_diameter(omol, com=com)
    pore_r = pd0 / 2.0

    if mode == "stable":

        def f_abs(x):
            return -2.0 * clearance_field(x[None, :], omol)[0]

        opt = lbfgsb_minimize_stable(
            pore_stable_probe(omol), f_abs, com, com - pore_r,
            com + pore_r, maxiter=opt_maxiter,
        )
        return opt.x, opt.capped

    def f_neg(points):
        return -2.0 * clearance_field(points, omol)

    opt = lbfgsb_minimize(
        f_neg, com, com - pore_r, com + pore_r, maxiter=opt_maxiter
    )
    return opt.x.astype(mol.coords.dtype), opt.capped


def optimise_pore_centre(
    mol: MolArrays, cfg: AnalysisConfig = DEFAULT_CONFIG
) -> jnp.ndarray:
    """The optimised pore centre (see :func:`optimise_pore_centre_res`)."""
    return optimise_pore_centre_res(mol, cfg)[0]


def pore_diameter_opt(
    mol: MolArrays, cfg: AnalysisConfig = DEFAULT_CONFIG
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Optimised pore: L-BFGS-B mimic from the COM within +-pore_r bounds
    (reference: utilities.py:400-426).  Returns (d, atom, centre, capped)."""
    centre, capped = optimise_pore_centre_res(mol, cfg)
    d, atom = pore_diameter(mol, com=centre)
    return d, atom, centre, capped


def full_analysis_device(
    mol: MolArrays,
    n_points_windows: int,
    n_points_avg: int,
    l1: int,
    l2: int,
    cfg: AnalysisConfig,
    pore_centre: jnp.ndarray | None = None,
    pore_capped: jnp.ndarray | None = None,
) -> FullAnalysis:
    """One fused device pass producing every per-molecule property.

    Computes molecular weight, COM, maximum/average diameter, intrinsic
    and optimised pore, and the full window set in a single traced
    computation so XLA can share the clearance primitives across stages
    (the reference runs these as separate host calls,
    utilities.py:1363-1464).

    ``pore_centre``/``pore_capped``: optionally inject an
    already-optimised pore centre (and its budget-capped flag).  The
    TPU production path computes the centres for the whole batch
    OUTSIDE the per-molecule vmap through the fused Pallas optimiser
    kernel (:func:`pywindow_tpu.ops.lbfgsb_pallas.pore_centres_pallas`)
    and passes them in here.
    """
    mw = molecular_weight(mol)
    com = center_of_mass(mol)
    a1, a2, maxd = max_dim(mol)

    # average diameter runs on the COM-centred molecule with a sampling
    # sphere of radius = full max diameter (utilities.py:1586-1650).
    centred = shift_to(mol, jnp.zeros(3, mol.coords.dtype))
    maxd_c = max_dim_value(centred)
    avg = rays.average_diameter(centred, n_points_avg, maxd_c)

    pd, pd_atom = pore_diameter(mol, com=com)
    pv = sphere_volume(pd / 2.0)
    if pore_centre is not None:
        pod_centre = pore_centre
        pod, pod_atom = pore_diameter(mol, com=pod_centre)
        if pore_capped is None:
            pore_capped = jnp.asarray(False)
    else:
        pod, pod_atom, pod_centre, pore_capped = pore_diameter_opt(
            mol, cfg
        )
    pov = sphere_volume(pod / 2.0)

    wins = find_windows(
        mol, n_points_windows, l1, l2, cfg, pore_centre=pod_centre
    )
    wins = wins._replace(opt_capped=wins.opt_capped | pore_capped)

    return FullAnalysis(
        molecular_weight=mw,
        centre_of_mass=com,
        maxd_atom_1=a1,
        maxd_atom_2=a2,
        maximum_diameter=maxd,
        average_diameter=avg,
        pore_diameter=pd,
        pore_atom=pd_atom,
        pore_volume=pv,
        pore_opt_diameter=pod,
        pore_opt_atom=pod_atom,
        pore_opt_centre=pod_centre,
        pore_opt_volume=pov,
        windows=wins,
    )


def pack_results(res: FullAnalysis) -> jnp.ndarray:
    """Flatten a FullAnalysis into one float vector (device side).

    Crossing device->host as a single array matters: fetching the ~19
    separate leaves costs a round-trip each (over a tunneled TPU that is
    ~100 ms per leaf).  Layout: 15 scalars, COM(3), opt centre(3), then
    per-window diameters/valid/refine_failed/centres for ``W`` slots.
    """
    w = res.windows
    f = res.pore_diameter.dtype
    return jnp.concatenate(
        [
            jnp.stack(
                [
                    res.molecular_weight,
                    res.maximum_diameter,
                    res.average_diameter,
                    res.pore_diameter,
                    res.pore_volume,
                    res.pore_opt_diameter,
                    res.pore_opt_volume,
                    res.maxd_atom_1.astype(f),
                    res.maxd_atom_2.astype(f),
                    res.pore_atom.astype(f),
                    res.pore_opt_atom.astype(f),
                    w.any_open.astype(f),
                    w.n_clusters.astype(f),
                    w.open_overflow.astype(f),
                    jnp.asarray(w.opt_capped).astype(f),
                ]
            ),
            res.centre_of_mass,
            res.pore_opt_centre,
            w.diameters,
            w.valid.astype(f),
            w.refine_failed.astype(f),
            w.centers.reshape(-1),
        ]
    )


def packed_size(max_windows: int) -> int:
    """Length of the packed per-molecule result vector (scalars + window
    slots) used for the single device→host fetch per batch."""
    return 21 + 6 * max_windows


def unpack_results(flat: np.ndarray, max_windows: int) -> FullAnalysis:
    """Host-side inverse of :func:`pack_results` (numpy arrays)."""
    wnd = max_windows
    s = flat[:15]
    com = flat[15:18]
    centre = flat[18:21]
    off = 21
    diam = flat[off : off + wnd]
    valid = flat[off + wnd : off + 2 * wnd] > 0.5
    failed = flat[off + 2 * wnd : off + 3 * wnd] > 0.5
    centers = flat[off + 3 * wnd : off + 6 * wnd].reshape(wnd, 3)
    wins = WindowsResult(
        diameters=diam,
        centers=centers,
        valid=valid,
        any_open=np.bool_(s[11] > 0.5),
        n_clusters=np.int32(round(float(s[12]))),
        refine_failed=failed,
        open_overflow=np.bool_(s[13] > 0.5),
        opt_capped=np.bool_(s[14] > 0.5),
    )
    return FullAnalysis(
        molecular_weight=s[0],
        centre_of_mass=com,
        maxd_atom_1=np.int64(round(float(s[7]))),
        maxd_atom_2=np.int64(round(float(s[8]))),
        maximum_diameter=s[1],
        average_diameter=s[2],
        pore_diameter=s[3],
        pore_atom=np.int64(round(float(s[9]))),
        pore_volume=s[4],
        pore_opt_diameter=s[5],
        pore_opt_atom=np.int64(round(float(s[10]))),
        pore_opt_centre=centre,
        pore_opt_volume=s[6],
        windows=wins,
    )


def static_sizes(
    max_diameter: float, cfg: AnalysisConfig
) -> tuple[int, int, int, int]:
    """Derive the static sampling sizes from a molecule's max diameter.

    Point counts must match the reference exactly (the spiral layout
    depends on them); path-step bounds are padded to multiples of 8 to
    bound jit-cache churn across trajectory frames.
    """
    radius = max_diameter / 2.0
    n_win = rays.number_of_points(radius, cfg.adjust)
    n_avg = rays.number_of_points(max_diameter, cfg.adjust)
    l1 = int(radius // cfg.increment) + 2
    l2 = int(radius // cfg.increment2) + 2
    pad8 = lambda n: ((n + 7) // 8) * 8  # noqa: E731
    return n_win, n_avg, pad8(l1), pad8(l2)


def route_pore_stage(cfg: AnalysisConfig) -> bool:
    """Run the pore-centre stage through the fused Pallas optimiser?

    True on TPU in ``"stable"`` pore-opt mode (the f32 production
    default): the centres for the whole batch are then computed outside
    the per-molecule vmap by
    :func:`pywindow_tpu.ops.lbfgsb_pallas.pore_centres_pallas` — the
    vmapped jnp driver pays ~6 ms/iteration of XLA op dispatch at
    production batch sizes where the fused kernel pays only the
    clearance math.
    """
    from pywindow_tpu.config import default_dtype, pore_opt_mode
    from pywindow_tpu.ops.lbfgsb_pallas import route_opt_to_pallas

    return (
        pore_opt_mode(default_dtype()) == "stable"
        and route_opt_to_pallas()
    )


@functools.lru_cache(maxsize=64)
def _compiled_full_analysis(n_win, n_avg, l1, l2, cfg):
    from pywindow_tpu.config import effective_budgets

    route = route_pore_stage(cfg)
    opt_maxiter, _ = effective_budgets(cfg)

    def fn(mol):
        centre = capped = None
        if route:
            from pywindow_tpu.ops.lbfgsb_pallas import pore_centres_pallas

            batch1 = jax.tree_util.tree_map(lambda a: a[None], mol)
            centres, cappeds = pore_centres_pallas(batch1, opt_maxiter)
            centre, capped = centres[0], cappeds[0]
        return pack_results(
            full_analysis_device(
                mol,
                n_points_windows=n_win,
                n_points_avg=n_avg,
                l1=l1,
                l2=l2,
                cfg=cfg,
                pore_centre=centre,
                pore_capped=capped,
            )
        )

    return jax.jit(fn)


def max_dim_bound(elements: np.ndarray, coordinates: np.ndarray) -> float:
    """Cheap O(N) upper bound on the vdW-corrected maximum diameter
    (bounding-box diagonal + two max vdW radii) — used to size the
    padded ray-path arrays for a whole batch."""
    from pywindow_tpu import tables

    ids = tables.element_ids(elements)
    c = np.asarray(coordinates, dtype=np.float64)
    diag = float(np.linalg.norm(c.max(axis=0) - c.min(axis=0)))
    return diag + 2.0 * float(tables.ELEMENT_VDW[ids].max())


def max_dim_host(elements: np.ndarray, coordinates: np.ndarray) -> float:
    """Maximum vdW-corrected diameter, host numpy.

    Used only to derive static sampling sizes (a device round-trip per
    batch is pure latency, especially over a tunneled TPU).  Row-chunked
    so a 20k-atom framework does not materialise an (N, N, 3) float64
    intermediate; the full-matrix max equals the triu max by symmetry.
    """
    from pywindow_tpu import tables

    ids = tables.element_ids(elements)
    vdw = tables.ELEMENT_VDW[ids]
    c = np.asarray(coordinates, dtype=np.float64)
    best = 0.0
    chunk = 1024
    for lo in range(0, len(c), chunk):
        diff = c[lo : lo + chunk, None, :] - c[None, :, :]
        d = np.sqrt((diff * diff).sum(-1))
        d += vdw[lo : lo + chunk, None]
        d += vdw[None, :]
        best = max(best, float(d.max()))
    return best


def analyze(
    elements: np.ndarray,
    coordinates: np.ndarray,
    cfg: AnalysisConfig = DEFAULT_CONFIG,
    pad_to: int | None = None,
) -> dict:
    """Host entry: full analysis of one molecule -> reference-schema dict.

    Two-phase: a cheap device call gets the maximum diameter, from which
    the static sampling shapes are derived; then the fused pipeline runs.
    """
    import dataclasses

    from pywindow_tpu.config import MAX_WINDOWS_CEILING
    from pywindow_tpu.profiling import METRICS, stage

    with stage("encode"):
        mol = encode(elements, coordinates, pad_to=pad_to)
    with stage("static_sizes"):
        maxd = max_dim_host(np.asarray(elements), np.asarray(coordinates))
        n_win, n_avg, l1, l2 = static_sizes(maxd, cfg)
    while True:
        with stage("full_analysis"):
            flat = _compiled_full_analysis(n_win, n_avg, l1, l2, cfg)(mol)
            res = unpack_results(np.asarray(flat), cfg.max_windows)
        props = to_properties_dict(res)
        # escalate: open rays overflowed the compaction cap — double the
        # fraction (>= 1.0 reverts to the uncompacted path) and re-run
        if props.pop("_open_cap_overflow", False):
            cfg = dataclasses.replace(
                cfg, open_cap_frac=2.0 * cfg.open_cap_frac
            )
            props.pop("_window_cap_saturated", None)
            props.pop("_opt_budget_exceeded", None)
            continue
        # escalate: an optimiser hit the fast budget — re-run at the
        # full budgets (only meaningful once; a full-budget run that
        # still caps matches scipy's own maxiter stop)
        if props.pop("_opt_budget_exceeded", False) and cfg.fast_budgets:
            cfg = dataclasses.replace(cfg, fast_budgets=False)
            props.pop("_window_cap_saturated", None)
            continue
        if (
            not props.pop("_window_cap_saturated", False)
            or cfg.max_windows >= MAX_WINDOWS_CEILING
        ):
            break
        # escalate: more clusters than slots — double the cap and re-run
        cfg = dataclasses.replace(cfg, max_windows=2 * cfg.max_windows)
    if int(res.windows.n_clusters) >= cfg.max_windows:
        logger.warning(
            "window clusters reached max_windows=%d; raise "
            "AnalysisConfig.max_windows if this system may have more",
            cfg.max_windows,
        )
    METRICS.count("molecules_analysed")
    METRICS.count("windows_found", int(np.sum(res.windows.valid)))
    METRICS.count("window_refines_failed", int(np.sum(res.windows.refine_failed)))
    return props


def to_properties_dict(res: FullAnalysis) -> dict:
    """Convert device results into the reference properties schema
    (keys as produced by molecular.py:215-352)."""
    wins = res.windows
    saturated = int(wins.n_clusters) >= len(np.asarray(wins.diameters))
    if not bool(wins.any_open):
        windows = {"diameters": None, "centre_of_mass": None}
    else:
        valid = np.asarray(wins.valid)
        windows = {
            "diameters": np.asarray(wins.diameters)[valid],
            "centre_of_mass": np.asarray(wins.centers)[valid],
        }
        if bool(np.any(np.asarray(wins.refine_failed))):
            logger.warning(
                "one of the analysed windows has returned as None "
                "(refinement failed); see manual"
            )
        if windows["diameters"].size and np.any(windows["diameters"] < 0):
            logger.warning(
                "one of the analysed windows has a vdW-corrected diameter "
                "smaller than 0; see manual"
            )
    out = {
        "centre_of_mass": np.asarray(res.centre_of_mass),
        "maximum_diameter": {
            "diameter": float(res.maximum_diameter),
            "atom_1": int(res.maxd_atom_1),
            "atom_2": int(res.maxd_atom_2),
        },
        "average_diameter": float(res.average_diameter),
        "pore_diameter": {
            "diameter": float(res.pore_diameter),
            "atom": int(res.pore_atom),
        },
        "pore_volume": float(res.pore_volume),
        "pore_diameter_opt": {
            "diameter": float(res.pore_opt_diameter),
            "atom_1": int(res.pore_opt_atom),
            "centre_of_mass": np.asarray(res.pore_opt_centre),
        },
        "pore_volume_opt": float(res.pore_opt_volume),
        "windows": windows,
        "molecular_weight": float(res.molecular_weight),
    }
    if saturated:
        # the cluster count hit the window-slot cap: more windows may
        # exist than slots.  Host entry points pop this marker and
        # re-run the molecule with a doubled cap (the reference has no
        # cap, so silent truncation is a parity bug, not a feature).
        out["_window_cap_saturated"] = True
    if bool(res.windows.open_overflow):
        # open rays exceeded the compaction cap: the compact-space sweep
        # missed rays, so these results are not trustworthy.  Host entry
        # points pop this marker and re-run with a doubled
        # cfg.open_cap_frac (>= 1.0 == the uncompacted full sweep).
        out["_open_cap_overflow"] = True
    if bool(np.asarray(res.windows.opt_capped)):
        # an optimiser stage hit the fast iteration budget: the result
        # could differ from a full-budget run.  Host entry points pop
        # this marker and re-run with cfg.fast_budgets=False.
        out["_opt_budget_exceeded"] = True
    return out


def to_properties_dicts_bulk(
    flat: np.ndarray, max_windows: int
) -> list[dict]:
    """Batch equivalent of ``to_properties_dict(unpack_results(row))``
    for a whole (B, packed) result block.

    Two host-cost rules shape this loop (the sweep collector thread
    runs it for every chunk, so its time races the device):

    * scalar fields come from ONE ``.tolist()`` of the 15 scalar
      columns — per-frame numpy scalar extraction was ~6x slower;
    * array fields are views/fancy-indexed rows of ``ascontiguousarray``
      column blocks sliced once per chunk — per-frame
      ``np.array(list)`` construction was another ~35% of the loop
      (70.8 -> 46.2 ms at B=4320, value-identical; see
      tests/test_validation_suite.py bulk parity test).

    When the native converter is available the whole loop runs in C
    (``_native/fastprops.cpp`` — same dicts, same dtypes, array views
    into ``flat``): ~46 -> ~3 ms at B=4320 on the single host vCPU.
    This numpy body is the fallback and the parity arbiter.
    """
    from pywindow_tpu.native import fastprops

    fp = fastprops()
    if fp is not None:
        flat_c = np.ascontiguousarray(flat)
        if flat_c.dtype in (np.float32, np.float64):
            out, warn_failed, warn_negative = fp.props_dicts(
                flat_c, max_windows
            )
            for _ in warn_failed:
                logger.warning(
                    "one of the analysed windows has returned as None "
                    "(refinement failed); see manual"
                )
            for _ in warn_negative:
                logger.warning(
                    "one of the analysed windows has a vdW-corrected "
                    "diameter smaller than 0; see manual"
                )
            return out
    w = max_windows
    off = 21
    b = flat.shape[0]
    any_open = flat[:, 11] > 0.5
    diam = np.ascontiguousarray(flat[:, off : off + w])
    valid = flat[:, off + w : off + 2 * w] > 0.5
    fail_any = (flat[:, off + 2 * w : off + 3 * w] > 0.5).any(axis=1)
    neg_any = ((diam < 0) & valid).any(axis=1)
    cent = np.ascontiguousarray(
        flat[:, off + 3 * w : off + 6 * w]
    ).reshape(b, w, 3)
    com = np.ascontiguousarray(flat[:, 15:18])
    com_opt = np.ascontiguousarray(flat[:, 18:21])
    cap_sat = np.rint(flat[:, 12]).astype(np.int64) >= w
    overflow = flat[:, 13] > 0.5
    budget = flat[:, 14] > 0.5
    rows = flat[:, :15].tolist()
    out: list[dict] = []
    for i in range(b):
        r = rows[i]
        if not any_open[i]:
            windows: dict = {"diameters": None, "centre_of_mass": None}
        else:
            v = valid[i]
            windows = {
                "diameters": diam[i, v],
                "centre_of_mass": cent[i, v],
            }
            if fail_any[i]:
                logger.warning(
                    "one of the analysed windows has returned as None "
                    "(refinement failed); see manual"
                )
            if neg_any[i]:
                logger.warning(
                    "one of the analysed windows has a vdW-corrected "
                    "diameter smaller than 0; see manual"
                )
        props = {
            "centre_of_mass": com[i],
            "maximum_diameter": {
                "diameter": r[1],
                "atom_1": int(round(r[7])),
                "atom_2": int(round(r[8])),
            },
            "average_diameter": r[2],
            "pore_diameter": {
                "diameter": r[3],
                "atom": int(round(r[9])),
            },
            "pore_volume": r[4],
            "pore_diameter_opt": {
                "diameter": r[5],
                "atom_1": int(round(r[10])),
                "centre_of_mass": com_opt[i],
            },
            "pore_volume_opt": r[6],
            "windows": windows,
            "molecular_weight": r[0],
        }
        if cap_sat[i]:
            props["_window_cap_saturated"] = True
        if overflow[i]:
            props["_open_cap_overflow"] = True
        if budget[i]:
            props["_opt_budget_exceeded"] = True
        out.append(props)
    return out
