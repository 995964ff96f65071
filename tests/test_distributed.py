"""Real multi-process (DCN analog) sweep: two localhost CPU processes,
per-process frame-shard decode, results all-gathered everywhere.

This exercises the actual ``jax.distributed`` bootstrap + Gloo
collectives (SURVEY §5 "distributed communication backend"), not the
single-process virtual hosts x frames grid the dryrun also covers.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import pywindow_tpu as pw
from tests.conftest import DATA

HISTORY = DATA / "HISTORY_singlemol_short"
WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sweep_matches_single(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"out_{p}.json" for p in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER, str(p), "2", str(port),
                str(HISTORY), str(outs[p]),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.load(open(o)) for o in outs]
    # every process holds results for EVERY frame, and they are
    # identical (same gathered array)
    assert results[0].keys() == results[1].keys()
    assert len(results[0]) == 20
    for f in results[0]:
        assert results[0][f] == results[1][f]

    # single-process fast path with the same (default, sweep-wide) pin
    single = pw.DLPOLY(HISTORY)
    single.analysis_batched(swap_atoms={"he": "H"}, forcefield="OPLS")
    for f in range(20):
        a = results[0][str(f)]["0"]
        b = single.analysis_output[f]["0"]
        assert a["pore_diameter"]["diameter"] == pytest.approx(
            b["pore_diameter"]["diameter"], abs=1e-6
        )
        assert a["no_of_atoms"] == b["no_of_atoms"]
        wa = a["windows"]["diameters"]
        wb = b["windows"]["diameters"]
        if wb is None:
            assert wa is None
        else:
            # batch widths differ (10 vs 20) -> XLA CPU fusion-layout
            # ulp noise amplified by the kink-riding optimisers; see
            # test_exact_sizes_batched_matches_serial for the rationale
            np.testing.assert_allclose(
                np.sort(wa), np.sort(wb), atol=2e-3
            )
