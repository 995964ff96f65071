"""CLI smoke tests (in-process, CPU)."""

import json

import pytest

from pywindow_tpu.__main__ import main
from tests.conftest import DATA


def test_cli_analyze(tmp_path, capsys):
    out = tmp_path / "props.json"
    main(["analyze", str(DATA / "YAQHOQ.xyz"), "-o", str(out)])
    data = json.loads(out.read_text())
    assert abs(data["pore_diameter"]["diameter"] - 3.6101512) < 0.01
    assert data["windows"]["diameters"] is None


@pytest.mark.slow
def test_cli_trajectory(tmp_path):
    out = tmp_path / "traj.json"
    main([
        "trajectory", str(DATA / "HISTORY_singlemol_short"),
        "--frames", "0:2", "--forcefield", "opls", "--swap", "he=H",
        "-o", str(out),
    ])
    data = json.loads(out.read_text())
    assert sorted(data) == ["0", "1"]
