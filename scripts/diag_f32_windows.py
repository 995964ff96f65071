"""Diagnose the f32 plateau-window divergence stage by stage.

Runs the window pipeline for one system twice on CPU — float32 and
float64 — and reports per-stage agreement: surviving rays, clusters,
selected widest rays, re-sample depth (new_z), refined diameters.

Run: python scripts/diag_f32_windows.py [NAME]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # master switch; cast per run

import numpy as np
import jax.numpy as jnp

from pywindow_tpu.config import DEFAULT_CONFIG
from pywindow_tpu.ops import rays
from pywindow_tpu.ops.analysis import max_dim_host, static_sizes
from pywindow_tpu.ops.cluster import dbscan
from pywindow_tpu.ops.encoding import encode
from pywindow_tpu.ops.geometry import center_of_mass, clearance_field, max_dim, pore_diameter
from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize
from pywindow_tpu.ops.windows import _window_refine

DATA = pathlib.Path(__file__).resolve().parent.parent / "tests" / "data"


def load(name):
    p = DATA / f"{name}.xyz"
    if p.exists():
        lines = p.read_text().splitlines()
        body = [ln for ln in lines[2:] if ln.strip()]
        els = np.array([ln.split()[0] for ln in body])
        co = np.array([[float(x) for x in ln.split()[1:4]] for ln in body])
        return els, co
    els, co = [], []
    for ln in (DATA / f"{name}.pdb").open():
        if ln[:6] in ("HETATM", "ATOM  "):
            els.append(ln[76:78].strip())
            co.append([float(ln[30:38]), float(ln[38:46]), float(ln[46:54])])
    return np.array(els), np.array(co)


def stage_run(elements, coords, dtype):
    cfg = DEFAULT_CONFIG
    mol = encode(elements, coords, dtype=dtype)
    maxd = max_dim_host(elements, coords)
    n_win, n_avg, l1, l2 = static_sizes(maxd, cfg)

    com = center_of_mass(mol)
    pd0, _ = pore_diameter(mol, com=com)
    pore_r = pd0 / 2.0

    def f_neg(points):
        return -2.0 * clearance_field(points, mol)

    opt = lbfgsb_minimize(
        f_neg, com, com - pore_r, com + pore_r, maxiter=cfg.opt_maxiter
    )
    centre = opt.x
    shifted = mol._replace(coords=mol.coords - centre[None, :])
    _, _, md = max_dim(shifted)
    radius = md / 2.0
    points = rays.golden_spiral(int(n_win), radius, dtype=mol.coords.dtype)
    eps = rays.mean_knn_eps_scaled(int(n_win), radius)
    open_pre = rays.preanalysis_open(points, shifted)
    path = rays.path_analysis(points, shifted, cfg.increment, l1)
    survives = np.asarray(open_pre & path.ok)
    labels, n_clusters = dbscan(
        points, jnp.asarray(survives), eps,
        min_samples=cfg.dbscan_min_samples, max_clusters=cfg.max_windows,
    )
    labels = np.asarray(labels)
    w_ids = np.arange(cfg.max_windows)
    width = np.asarray(path.width)
    sel = []
    for w in w_ids:
        in_c = labels == w
        if in_c.any():
            masked = np.where(in_c, width, -1e30)
            sel.append(int(masked.argmax()))
        else:
            sel.append(-1)
    # refine each selected
    out = []
    for w, s in enumerate(sel):
        if s < 0:
            continue
        vec = points[s]
        refined = rays.path_analysis(
            vec[None, :], shifted, cfg.increment2, l2
        )
        d, c, ok, _capped = _window_refine(
            shifted, jnp.asarray(vec), refined.ok[0], refined.dist[0], cfg
        )
        out.append(
            (w, s, float(refined.dist[0]), float(d), bool(ok))
        )
    return {
        "centre": np.asarray(centre),
        "pd0": float(pd0),
        "radius": float(radius),
        "survives": survives,
        "labels": labels,
        "n_clusters": int(n_clusters),
        "sel": sel,
        "windows": out,
    }


def main(name="NUXHIZ"):
    elements, coords = load(name)
    r64 = stage_run(elements, coords, np.float64)
    r32 = stage_run(elements, coords, np.float32)
    print(f"== {name} ==")
    print("pore centre diff:", np.abs(r64["centre"] - r32["centre"]).max())
    print("radius diff:", abs(r64["radius"] - r32["radius"]))
    s64, s32 = r64["survives"], r32["survives"]
    print(
        f"survivors: f64 {s64.sum()} f32 {s32.sum()} "
        f"(xor {np.sum(s64 != s32)})"
    )
    print(
        "labels differ at:", np.sum(r64["labels"] != r32["labels"]),
        "| clusters:", r64["n_clusters"], r32["n_clusters"],
    )
    print("selected rays:", r64["sel"], r32["sel"])
    print("windows (w, sel, new_z, diam, ok):")
    for a, b in zip(r64["windows"], r32["windows"]):
        print("  f64", [round(x, 5) if isinstance(x, float) else x for x in a])
        print("  f32", [round(x, 5) if isinstance(x, float) else x for x in b])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "NUXHIZ")
