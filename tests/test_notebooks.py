"""Executable example notebooks (reference ships 8 runnable .ipynb;
reference: examples/Example{1..8}_*.ipynb).

The full set is executed by ``python scripts/run_notebooks.py`` in
verification; here two representative ones (single-molecule flow +
trajectory flow) run under pytest to catch regressions early.
"""

import pathlib
import sys

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.mark.slow
@pytest.mark.parametrize(
    "name",
    [
        "Example1_StructuralPropertiesOfMolecularPores.ipynb",
        "Example7_AnalysingTrajectorySingleMol.ipynb",
    ],
)
def test_notebook_executes(name, monkeypatch):
    from build_notebooks import DST, build

    build()
    monkeypatch.setenv("PYWINDOW_NB_FORCE_CPU", "1")
    nb = nbformat.read(DST / name, as_version=4)
    nbclient.NotebookClient(
        nb, timeout=900, kernel_name="python3"
    ).execute()
