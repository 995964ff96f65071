"""Capture a TPU profile of one warm batched-analysis rep and print the
per-op device-time split (the recipe that found the round-2 wins; see
CLAUDE.md perf ledger and .claude/skills/verify/SKILL.md).

Usage:
    python scripts/profile_batch.py [path] [batch] [--top 25]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pywindow_tpu.config import DEFAULT_CONFIG
from pywindow_tpu.io.inputs import Input
from pywindow_tpu.ops.analysis import max_dim_host, static_sizes
from pywindow_tpu.ops.encoding import encode_batch
from pywindow_tpu.parallel.batch import _compiled_batch_analysis


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "path", nargs="?",
        default="/root/reference/examples/data/input/PUDXES.xyz",
    )
    ap.add_argument("batch", nargs="?", type=int, default=1440)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default="/tmp/pw_trace")
    args = ap.parse_args()

    if "HISTORY" in os.path.basename(args.path):
        # real varying trajectory frames: lane divergence in the
        # optimiser while-loops makes these ~40% slower than a
        # replicated single frame — profile what production pays
        import pywindow_tpu as pw

        traj = pw.DLPOLY(args.path)
        el, co, maxd_pf = traj._sweep_decode_native(
            list(range(traj.no_of_frames)), {"he": "H"}, "OPLS"
        )
        maxd = float(max(maxd_pf))
        systems = [
            (el, co[i % len(co)]) for i in range(args.batch)
        ]
        n_win, n_avg, l1, l2 = static_sizes(maxd, DEFAULT_CONFIG)
        print(f"P_windows={n_win} P_avg={n_avg} l1={l1} l2={l2}")
        mols = encode_batch(systems)
    else:
        sysd = Input().load_file(args.path)
        elements, coords = sysd["elements"], sysd["coordinates"]
        maxd = max_dim_host(elements, coords)
        n_win, n_avg, l1, l2 = static_sizes(maxd, DEFAULT_CONFIG)
        print(f"P_windows={n_win} P_avg={n_avg} l1={l1} l2={l2}")
        mols = encode_batch([(elements, coords)] * args.batch)
    step = _compiled_batch_analysis(n_win, n_avg, l1, l2, DEFAULT_CONFIG)
    np.asarray(step(mols))  # warm
    t0 = time.perf_counter()
    np.asarray(step(mols))
    rep = time.perf_counter() - t0
    print(f"warm rep: {rep*1e3:.1f} ms  ({args.batch/rep:.0f} f/s)")

    os.system(f"rm -rf {args.trace_dir}")
    with jax.profiler.trace(args.trace_dir):
        np.asarray(step(mols))

    traces = glob.glob(
        f"{args.trace_dir}/plugins/profile/*/*.trace.json.gz"
    )
    if not traces:
        print("no trace captured", file=sys.stderr)
        return 1
    with gzip.open(traces[0], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # device pids: process_name metadata containing TPU / device
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    per_op = defaultdict(float)
    long_names = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur = e.get("dur", 0)
            name = e.get("name", "?")
            per_op[name] += dur
            total += dur
            ln = e.get("args", {}).get("long_name")
            if ln and name not in long_names:
                long_names[name] = ln[:160]
    print(f"\ndevice total: {total/1e3:.1f} ms")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {name}")
        if name in long_names:
            print(f"             {long_names[name]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
