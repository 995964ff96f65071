"""Degenerate inputs and configuration validation."""

import numpy as np
import pytest

import pywindow_tpu as pw
from pywindow_tpu import profiling
from pywindow_tpu.config import AnalysisConfig


@pytest.mark.slow
def test_single_atom_molecule():
    mol = pw.Molecule(
        {"elements": np.array(["Ar"]), "coordinates": np.zeros((1, 3))}
    )
    props = mol.full_analysis()
    # maximum "diameter" degenerates to 2*vdw of the lone atom
    assert props["maximum_diameter"]["diameter"] == pytest.approx(
        2 * 1.88, abs=1e-8
    )
    # no interior: pore diameter is negative (inside the vdW sphere)
    assert props["pore_diameter"]["diameter"] < 0
    assert props["windows"]["diameters"] is None


@pytest.mark.slow
def test_two_atom_molecule():
    mol = pw.Molecule(
        {
            "elements": np.array(["C", "C"]),
            "coordinates": np.array([[0.0, 0, 0], [3.0, 0, 0]]),
        }
    )
    props = mol.full_analysis()
    assert props["maximum_diameter"]["diameter"] == pytest.approx(
        3.0 + 2 * 1.70
    )


def test_config_validation():
    with pytest.raises(ValueError):
        AnalysisConfig(adjust=0)
    with pytest.raises(ValueError):
        AnalysisConfig(increment=-1.0)
    # frozen: assignment rejected
    cfg = AnalysisConfig()
    with pytest.raises(AttributeError):
        cfg.adjust = 2.0  # type: ignore[misc]


def test_profiling_metrics_cycle():
    profiling.METRICS.reset()
    profiling.enable(True)
    try:
        with profiling.stage("unit-test-stage"):
            pass
        profiling.METRICS.count("unit_counter", 3)
    finally:
        profiling.enable(False)
    snap = profiling.METRICS.snapshot()
    assert snap["stage_calls"]["unit-test-stage"] == 1
    assert snap["counters"]["unit_counter"] == 3
    profiling.METRICS.reset()
    assert profiling.METRICS.snapshot()["counters"] == {}


def test_empty_frames_list_noop():
    from tests.conftest import DATA

    traj = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    traj.analysis_batched(frames=[], forcefield="opls",
                          swap_atoms={"he": "H"})
    assert traj.analysis_output == {}
