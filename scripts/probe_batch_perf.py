"""Ad-hoc probe: steady-state throughput vs batch size, Pallas on/off.

Bench-style timing: batch pre-encoded, compiled step reused, sync by
full result fetch. Not part of the driver contract; used to tune
HBM_BUDGET / routing decisions (see CLAUDE.md perf ledger).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pywindow_tpu.config import DEFAULT_CONFIG
from pywindow_tpu.io.inputs import Input
from pywindow_tpu.ops.analysis import max_dim_host, static_sizes
from pywindow_tpu.ops.encoding import encode_batch
from pywindow_tpu.parallel.batch import _compiled_batch_analysis


def probe(path, batches, reps=3):
    sysd = Input().load_file(path)
    elements, coords = sysd["elements"], sysd["coordinates"]
    if "atom_ids" in sysd and elements is None:
        elements = sysd["atom_ids"]
    maxd = max_dim_host(elements, coords)
    n_win, n_avg, l1, l2 = static_sizes(maxd, DEFAULT_CONFIG)
    name = os.path.basename(path)
    for b in batches:
        mols = encode_batch([(elements, coords)] * b)
        step = _compiled_batch_analysis(n_win, n_avg, l1, l2, DEFAULT_CONFIG)
        try:
            flat = np.asarray(step(mols))
        except Exception as e:
            msg = str(e)
            i = msg.find("Used")
            print(f"{name} B={b}: FAIL {msg[i:i+60] if i >= 0 else msg[:100]}")
            continue
        t0 = time.perf_counter()
        for _ in range(reps):
            flat = np.asarray(step(mols))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name} B={b}: {b/dt:.0f} f/s  ({dt:.2f}s/rep)")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("batches", nargs="+", type=int)
    args = ap.parse_args()
    probe(args.path, args.batches)
