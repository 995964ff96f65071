"""The production mixed mode: float32 pipeline + float64 pore-opt.

On plateau systems (NUXHIZ) the f32 pore-centre L-BFGS-B stops ~0.13 A
from the f64 point and every window inherits the shift (~0.22 A); with
the pore-opt stage promoted (config.pore_opt_dtype) the same f32
pipeline lands within ~1e-3 A of the f64 goldens (CPU; 0.043 A on TPU
where the downstream refinement differs — documented allowance in
scripts/validate_f32.py).
"""

import numpy as np
import pytest

import pywindow_tpu as pw
from pywindow_tpu.config import default_dtype, pore_opt_dtype
from tests.conftest import DATA, load_xyz

NUXHIZ_WINDOWS = np.sort(
    [6.503653849037591, 7.269555216539536, 7.903902924542914]
)


def test_pore_opt_dtype_rules(monkeypatch):
    # x64 is enabled by conftest: f32 promotes, f64 stays
    assert pore_opt_dtype(np.float32) == np.float64
    assert pore_opt_dtype(np.float64) == np.float64
    # FORCE_F32 pins the *pipeline* default, not the pore-opt stage
    monkeypatch.setenv("PYWINDOW_TPU_FORCE_F32", "1")
    assert default_dtype() == np.float32
    assert pore_opt_dtype(np.float32) == np.float64


@pytest.mark.slow
def test_mixed_mode_fixes_plateau_windows(monkeypatch):
    """f32 pipeline + f64 pore-opt reproduces NUXHIZ's f64 windows."""
    monkeypatch.setenv("PYWINDOW_TPU_FORCE_F32", "1")
    elements, coords = load_xyz(DATA / "NUXHIZ.xyz")
    mol = pw.Molecule({"elements": elements, "coordinates": coords})
    props = mol.full_analysis()
    # pipeline genuinely ran in f32
    assert props["pore_diameter"]["diameter"] != pytest.approx(
        8.746544980478657, abs=1e-12
    )
    assert abs(props["pore_diameter"]["diameter"] - 8.7465449) < 1e-4
    wins = np.sort(props["windows"]["diameters"])
    assert len(wins) == 3
    # two windows land within ~1e-3; the third sits one kink over on
    # the plateau (0.043 A) because the *input coordinates* are already
    # f32-rounded — the documented NUXHIZ allowance (validate_f32.py).
    # Without the f64 pore-opt stage the whole set was ~0.22 A off.
    np.testing.assert_allclose(wins, NUXHIZ_WINDOWS, atol=5e-2)
    assert np.sum(np.abs(wins - NUXHIZ_WINDOWS) < 5e-3) >= 2
