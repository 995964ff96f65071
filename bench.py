"""Benchmark: full pore+window analysis throughput on CC3 MD frames.

Workload = the north-star target (BASELINE.md): complete ``full_analysis``
(COM, max/avg diameter, pore, optimised pore, window detection +
refinement) per trajectory frame of the CC3 cage (168 atoms), from the
DL_POLY fixture.  The TPU path runs the fused batched pipeline; the
baseline is the reference pywindow implementation measured on this
host's CPU (serial, its default mode).

Prints ONE json line:
  {"metric": ..., "value": frames/s, "unit": "frames/s",
   "vs_baseline": speedup}
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import pathlib as _pathlib

import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    str(_pathlib.Path(__file__).resolve().parent / ".jax_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
_jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
# production mode: plain float32 pipeline with the symbolic-difference
# pore-centre optimiser (config.pore_opt_mode "stable") — float64-grade
# stopping behaviour without x64/emulated-f64 anywhere.  FORCE_F32 pins
# the dtype when the bench is exercised on a CPU host.
import os as _os

_os.environ["PYWINDOW_TPU_FORCE_F32"] = "1"

import numpy as np

REPO = pathlib.Path(__file__).parent
HISTORY = REPO / "tests" / "data" / "HISTORY_singlemol_short"
# device-side batch for the kernel-only metric: larger amortises the
# optimiser-kernel tiles better (measured 89 us/frame at 4320 -> 79 at
# 8640).  The e2e sweep stays at 4320: its pipeline hides the tunnel
# transfer behind device compute best with more, smaller stages, and a
# mid-sweep tunnel stall costs less (measured: best-of-2 e2e 5740 f/s
# at 4320 vs 3850 at 8640).
KERNEL_BATCH = 8640
BATCH = 4320
# 6 steady reps (~2.5 s extra): the tunnel's phase swings (identical
# code measured 0.40 vs 0.96 s/rep an hour apart on 2026-08-21) make
# small-N best-ofs a lottery for the kernel metric too.
STEADY_REPS = 6
REF_FRAMES = 20
# 5 reps: single-shot e2e numbers on the stall-prone single vCPU
# differed 40%+; more reps make the best-of less of a lottery
# (VERDICT r4 #7/#8) at ~2 s/rep.
E2E_REPS = 5
E2E_FRAMES = 21600  # 5 full 4320-frame chunks (no remainder padding)
MIBQAR_E2E_FRAMES = 4800  # 4 full 1200-frame chunks of the 424-atom MOF


def _decode_frames():
    import pywindow_tpu as pw

    traj = pw.DLPOLY(HISTORY)
    systems = []
    for f in range(traj.no_of_frames):
        molsys = traj.get_frames(f)[f]
        molsys.swap_atom_keys({"he": "H"})
        molsys.decipher_atom_keys("OPLS")
        systems.append(
            (molsys.system["elements"], molsys.system["coordinates"])
        )
    return systems


def measure_tpu(systems) -> float:
    """Steady-state frames/sec of the batched device pipeline.

    Honest timing: each rep dispatches the packed analysis and fetches
    the full result array back to the host (on the axon platform
    ``block_until_ready`` does not await this computation, so the fetch
    IS the synchronisation point — and what a real pipeline needs
    anyway).
    """
    from pywindow_tpu.config import DEFAULT_CONFIG
    from pywindow_tpu.ops.analysis import (
        max_dim_host,
        static_sizes,
        unpack_results,
    )
    from pywindow_tpu.ops.encoding import encode_batch
    from pywindow_tpu.parallel.batch import _compiled_batch_analysis

    batch = [systems[i % len(systems)] for i in range(KERNEL_BATCH)]
    mols = encode_batch(batch)
    # size from the largest frame, as dispatch_batch would
    maxd = max(max_dim_host(*s) for s in systems)
    n_win, n_avg, l1, l2 = static_sizes(maxd, DEFAULT_CONFIG)
    step = _compiled_batch_analysis(n_win, n_avg, l1, l2, DEFAULT_CONFIG)

    flat = np.asarray(step(mols))  # compile + first run + full fetch
    t0 = time.perf_counter()
    for _ in range(STEADY_REPS):
        flat = np.asarray(step(mols))
    dt = (time.perf_counter() - t0) / STEADY_REPS
    # sanity: real results came back
    res0 = unpack_results(flat[0], DEFAULT_CONFIG.max_windows)
    assert abs(float(res0.pore_diameter) - 5.0) < 2.0, res0.pore_diameter
    assert int(np.sum(res0.windows.valid)) >= 1
    try:
        measure_tpu.roofline = _roofline(
            step.lower(mols).compile(), dt
        )
    except Exception:
        measure_tpu.roofline = None
    return KERNEL_BATCH / dt


#: v5e single-chip peaks for the roofline accounting (public numbers:
#: jax-ml.github.io/scaling-book — 197 Tbf16FLOP/s MXU, 819 GB/s HBM;
#: VPU f32 elementwise ~= 8x128 lanes x 4 ALUs x 0.94 GHz).
V5E_HBM_GBPS = 819.0
V5E_MXU_BF16_TFLOPS = 197.0
V5E_VPU_F32_TFLOPS = 3.85


def _roofline(compiled, seconds: float) -> dict | None:
    """Achieved fraction of the v5e rooflines for one compiled program.

    Uses XLA's own cost analysis (flops + bytes accessed) over the
    measured steady-state rep time.  The analysis pipeline is
    VPU/while-loop-bound, not MXU-bound, so the meaningful ceilings are
    the HBM bandwidth and the f32 VPU rate; both fractions are
    recorded (the MXU one would read ~0 and mislead).
    """
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", -1.0))
        byts = float(ca.get("bytes accessed", -1.0))
    except Exception:
        return None
    if flops <= 0 and byts <= 0:
        return None
    out: dict = {}
    if flops > 0:
        tf = flops / seconds / 1e12
        out["achieved_tflops_f32"] = round(tf, 3)
        out["pct_vpu_f32_roofline"] = round(
            100.0 * tf / V5E_VPU_F32_TFLOPS, 1
        )
    if byts > 0:
        gbps = byts / seconds / 1e9
        out["achieved_hbm_gbps"] = round(gbps, 1)
        out["pct_hbm_roofline"] = round(100.0 * gbps / V5E_HBM_GBPS, 1)
    return out


def measure_kernel_system(path: str, batch: int, reps: int = 2):
    """Steady-state kernel frames/sec for one structure file, frames
    replicated to ``batch`` (the large-N ledger workloads: MIBQAR 424
    atoms, REYMAL 468 atoms)."""
    import pywindow_tpu as pw
    from pywindow_tpu.config import DEFAULT_CONFIG
    from pywindow_tpu.io.inputs import Input
    from pywindow_tpu.ops.analysis import max_dim_host, static_sizes
    from pywindow_tpu.ops.encoding import encode_batch
    from pywindow_tpu.parallel.batch import _compiled_batch_analysis

    sysd = Input().load_file(path)
    el = sysd.get("elements")
    if el is None:
        el = sysd["atom_ids"]
    molsys = pw.MolecularSystem.load_system(
        {"elements": np.asarray(el), "coordinates": sysd["coordinates"]}
    )
    try:
        molsys.decipher_atom_keys("OPLS")
    except Exception:
        pass
    mol = molsys.system_to_molecule()
    el, co = np.asarray(mol.elements), np.asarray(mol.coordinates)
    maxd = max_dim_host(el, co)
    n_win, n_avg, l1, l2 = static_sizes(maxd, DEFAULT_CONFIG)
    mols = encode_batch([(el, co)] * batch)
    step = _compiled_batch_analysis(n_win, n_avg, l1, l2, DEFAULT_CONFIG)
    flat = np.asarray(step(mols))
    t0 = time.perf_counter()
    for _ in range(reps):
        flat = np.asarray(step(mols))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(flat[0][3])
    return batch / dt


def synth_history(n_frames: int) -> pathlib.Path:
    """Synthesize an n-frame HISTORY by cycling the 20-frame fixture
    (monotone timesteps rewritten)."""
    out = pathlib.Path("/tmp") / f"HISTORY_bench_{n_frames}"
    if out.exists():
        return out
    lines = HISTORY.read_text().split("\n")
    starts = [i for i, ln in enumerate(lines) if ln.startswith("timestep")]
    header = "\n".join(lines[: starts[0]]) + "\n"
    frames = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(lines)
        frames.append("\n".join(lines[s:e]).rstrip("\n") + "\n")
    tmp = out.with_suffix(".part")
    with tmp.open("w") as fh:
        fh.write(header)
        ts = 0
        for k in range(n_frames):
            fr = frames[k % len(frames)]
            head, _, body = fr.partition("\n")
            parts = head.split()
            parts[1] = str(ts)
            ts += 25
            fh.write(" ".join(parts) + "\n" + body)
    tmp.replace(out)
    return out


def measure_e2e(n_frames: int = E2E_FRAMES) -> float:
    """Honest end-to-end frames/sec: file on disk -> properties dicts.

    Times EVERYTHING the kernel number omits: the trajectory map +
    integrity check, whole-sweep native decode (threaded C++),
    swap/decipher, host batch assembly, device dispatch/fetch and
    result conversion, via the public ``DLPOLY.analysis_batched`` API
    on a synthesized 10k-frame CC3 trajectory.
    """
    import pywindow_tpu as pw

    path = synth_history(n_frames)
    # warm the sweep's compiled step once (XLA compile for this shape
    # is ~60 s cold, ~10 s loading from the persistent cache — one-time
    # costs that would otherwise swamp the pipeline measurement; the
    # synth trajectory cycles the 20 fixture frames, so one batch pins
    # the same sampling sizes as the full sweep).  Recorded separately
    # as e2e_warmup_s.
    t0 = time.perf_counter()
    warm = pw.DLPOLY(path)
    warm.analysis_batched(
        frames=list(range(BATCH)),
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=BATCH,
    )
    measure_e2e.warmup_s = round(time.perf_counter() - t0, 2)

    # best of E2E_REPS timed sweeps: the tunneled TPU's transfer
    # bandwidth swings 3-130 MB/s between runs, and the single host
    # vCPU sees multi-second scheduling stalls (a measured 21600-frame
    # decode varies 0.4-9 s on identical code) — single-shot e2e
    # numbers differed 40%+.  The best-of captures the pipeline's
    # capability; per-rep times are recorded in extra.
    times = []
    for _ in range(E2E_REPS):
        t0 = time.perf_counter()
        traj = pw.DLPOLY(path)
        traj.analysis_batched(
            swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=BATCH
        )
        times.append(time.perf_counter() - t0)
        assert len(traj.analysis_output) == n_frames
        d = traj.analysis_output[0]["0"]
        assert abs(d["pore_diameter"]["diameter"] - 5.0) < 2.0
    measure_e2e.rep_seconds = [round(t, 2) for t in times]
    return n_frames / min(times)


def synth_history_mibqar(n_frames: int) -> pathlib.Path:
    """Synthesize an n-frame DL_POLY HISTORY of the 424-atom MIBQAR
    MOF (elements straight from the PDB's columns 77-78, so the sweep
    needs no forcefield decipher) — the large-N e2e workload
    (VERDICT r4 #5: host decode/convert scaling with N was unmeasured;
    reference case: examples/example_4.py)."""
    out = pathlib.Path("/tmp") / f"HISTORY_mibqar_{n_frames}"
    if out.exists():
        return out
    elements, coords = [], []
    for ln in (REPO / "tests" / "data" / "MIBQAR.pdb").read_text().splitlines():
        if ln[:6] in ("HETATM", "ATOM  "):
            elements.append(ln[76:78].strip())
            coords.append(
                [float(ln[30:38]), float(ln[38:46]), float(ln[46:54])]
            )
    n = len(elements)
    body_lines = []
    for i, (el, (x, y, z)) in enumerate(zip(elements, coords)):
        body_lines.append(f"{el:<8} {i + 1:9d}    1.000000    0.000000")
        body_lines.append(f" {x: .4E} {y: .4E} {z: .4E}")
    body = "\n".join(body_lines) + "\n"
    tmp = out.with_suffix(".part")
    with tmp.open("w") as fh:
        fh.write("MIBQAR synthetic trajectory\n")
        fh.write(f"{0:10d}{0:10d}{n:10d}\n")
        for k in range(n_frames):
            fh.write(
                f"timestep{k * 25:10d}{n:10d}{0:10d}{0:10d}    0.000700\n"
            )
            fh.write(body)
    tmp.replace(out)
    return out


def measure_e2e_mibqar(n_frames: int = MIBQAR_E2E_FRAMES) -> float:
    """End-to-end frames/sec for the 424-atom system (file -> dicts)."""
    import pywindow_tpu as pw

    path = synth_history_mibqar(n_frames)
    # DLF notation passes pure-alpha element symbols (C, H, O, Zn)
    # straight through — the synth writes element names, not FF keys.
    # Every MIBQAR frame overflows the open-ray compaction cap; the
    # sweep escalates its config sticky-style (parallel/batch.py) and
    # remembers the learned caps for the process.  Warm in two passes
    # so every program on the ladder (base, once- and twice-escalated)
    # compiles before the timed reps: the first sweep learns the caps
    # while escalating, the second opens directly at the learned caps
    # and compiles THAT sweep program.
    warm = pw.DLPOLY(path)
    warm.analysis_batched(
        frames=list(range(2400)), forcefield="DLF", batch_size=1200
    )
    warm2 = pw.DLPOLY(path)
    warm2.analysis_batched(
        frames=list(range(1200)), forcefield="DLF", batch_size=1200
    )
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        traj = pw.DLPOLY(path)
        traj.analysis_batched(forcefield="DLF", batch_size=1200)
        times.append(time.perf_counter() - t0)
        assert len(traj.analysis_output) == n_frames
        d = traj.analysis_output[0]["0"]
        assert abs(d["pore_diameter"]["diameter"] - 12.3) < 2.0
    measure_e2e_mibqar.rep_seconds = [round(t, 2) for t in times]
    return n_frames / min(times)


def per_kernel_roofline() -> list[dict] | None:
    """Stage-level roofline fractions + bound classification
    (VERDICT r4 #4: make "device is done" falsifiable per kernel).

    Reuses scripts/stage_split.py's stage table at the kernel batch.
    The XLA cost model cannot see inside Pallas kernels, so rows
    dominated by one report jnp-visible work only and are classified
    as pallas-opaque; for everything else, a stage far below both
    roofline fractions is sequential/latency-bound (while-loop
    iteration dependencies), not leaving silicon idle by accident.
    """
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import stage_split

        rows = stage_split.run(KERNEL_BATCH, reps=2, quiet=True)
    except Exception:
        return None
    out = []
    for row in rows:
        hbm = row.get("pct_hbm_roofline", 0.0)
        vpu = row.get("pct_vpu_f32_roofline", 0.0)
        if "pallas" in row["stage"] or "PRODUCTION" in row["stage"]:
            bound = "pallas-opaque (cost model blind to kernel body)"
        elif hbm >= 40.0:
            bound = "HBM-bound"
        elif vpu >= 40.0:
            bound = "VPU-bound"
        elif "noop" in row["stage"]:
            bound = "dispatch+fetch latency floor"
        else:
            bound = "latency/sequential-bound (while-loop deps)"
        out.append({**row, "bound": bound})
    return out


def measure_reference(systems) -> float:
    """Reference pywindow frames/sec (serial CPU), rdkit stubbed."""
    import logging
    import types

    rk = types.ModuleType("rdkit")
    ch = types.ModuleType("rdkit.Chem")
    inchi = types.ModuleType("rdkit.Chem.inchi")
    inchi.logger = logging.getLogger("rdkit")
    rk.Chem = ch
    ch.inchi = inchi
    sys.modules.setdefault("rdkit", rk)
    sys.modules.setdefault("rdkit.Chem", ch)
    sys.modules.setdefault("rdkit.Chem.inchi", inchi)
    sys.path.insert(0, "/root/reference/src")
    try:
        from pywindow._internal.molecular import (
            MolecularSystem as RefSystem,
        )
    except Exception:
        return float("nan")

    per_frame = []
    for elements, coords in (
        systems * (REF_FRAMES // len(systems) + 1)
    )[:REF_FRAMES]:
        molsys = RefSystem.load_system(
            {"elements": elements, "coordinates": coords}
        )
        mol = molsys.system_to_molecule()
        t0 = time.perf_counter()
        mol.full_analysis()
        per_frame.append(time.perf_counter() - t0)
    # median per-frame time: robust to a one-off GC pause inflating the
    # recorded speedup (or a warm cache deflating it).  The full
    # distribution is recorded in the bench JSON (extra.ref_seconds_*).
    med = float(np.median(per_frame))
    measure_reference.distribution = {
        "ref_frames_timed": len(per_frame),
        "ref_seconds_median": round(med, 4),
        "ref_seconds_min": round(float(np.min(per_frame)), 4),
        "ref_seconds_max": round(float(np.max(per_frame)), 4),
        "ref_seconds_mean": round(float(np.mean(per_frame)), 4),
    }
    return 1.0 / med


def accuracy_gate() -> None:
    """Fail the bench if any golden drifts past the 0.01 A contract.

    A fast-but-wrong number must not be recordable: this runs the same
    golden set as scripts/validate_f32.py on the live backend.
    """
    sys.path.insert(0, str(REPO / "scripts"))
    from validate_f32 import run_gate

    report = run_gate()
    if not report["pass"]:
        print(json.dumps({"error": "accuracy gate failed", **report}))
        raise SystemExit(1)


def main() -> None:
    accuracy_gate()
    systems = _decode_frames()
    tpu_fps = measure_tpu(systems)
    e2e_fps = measure_e2e()
    # large-N ledger workloads (VERDICT r3 #7): driver-reproducible
    # kernel rates for the 424- and 468-atom systems
    big_n = {}
    for name, fname in (("mibqar", "MIBQAR.pdb"), ("reymal", "REYMAL.xyz")):
        try:
            big_n[f"{name}_kernel_fps"] = round(
                measure_kernel_system(
                    str(REPO / "tests" / "data" / fname), 1200
                ),
                1,
            )
        except Exception as e:  # never sink the headline metric
            big_n[f"{name}_kernel_fps"] = f"error: {e}"
    try:
        big_n["mibqar_e2e_fps"] = round(measure_e2e_mibqar(), 1)
        big_n["mibqar_e2e_rep_seconds"] = getattr(
            measure_e2e_mibqar, "rep_seconds", None
        )
    except Exception as e:
        big_n["mibqar_e2e_fps"] = f"error: {e}"
    ref_fps = measure_reference(systems)
    vs = e2e_fps / ref_fps if ref_fps == ref_fps else None
    extra = {
        "kernel_fps": round(tpu_fps, 3),
        "e2e_sweep_fps": round(e2e_fps, 3),
        "e2e_sweep_frames": E2E_FRAMES,
        "e2e_over_kernel": round(e2e_fps / tpu_fps, 3),
        "e2e_warmup_s": getattr(measure_e2e, "warmup_s", None),
        "e2e_rep_seconds": getattr(measure_e2e, "rep_seconds", None),
        "roofline_full_step": getattr(measure_tpu, "roofline", None),
        "roofline_per_kernel": per_kernel_roofline(),
        **big_n,
        **getattr(measure_reference, "distribution", {}),
    }
    # headline value = the honest end-to-end rate (file -> results);
    # the kernel-only rate is recorded alongside in extra
    print(
        json.dumps(
            {
                "metric": "cc3_full_analysis_throughput",
                "value": round(e2e_fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
