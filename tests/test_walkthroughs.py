"""The documentation walkthroughs actually execute.

Doctest-analog for the reference CI's ``make -C docs doctest`` job
(/root/reference/.github/workflows/tests.yaml:68): every fenced
``python`` block in ``docs/walkthroughs/*.md`` is extracted and
executed, per file, in one shared namespace on the CPU backend, inside
a scratch cwd where ``tests/data`` resolves to the real fixtures and
relative output paths land in the tmpdir.  After execution, the values
the prose promises are asserted from the namespace, so the documents
cannot silently rot.
"""

import pathlib
import re
import sys
import types

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
WALKTHROUGHS = REPO / "docs" / "walkthroughs"

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(name: str) -> list[str]:
    text = (WALKTHROUGHS / name).read_text()
    blocks = _BLOCK_RE.findall(text)
    assert blocks, f"{name} has no python blocks"
    return blocks


def _run(name, tmp_path, monkeypatch, skip_blocks=(), preamble=None):
    """Execute the file's python blocks sequentially in one namespace."""
    (tmp_path / "tests").symlink_to(REPO / "tests")
    monkeypatch.chdir(tmp_path)
    ns: dict = {}
    if preamble:
        preamble(ns, tmp_path)
    for i, block in enumerate(_blocks(name)):
        if i in skip_blocks:
            continue
        exec(compile(block, f"{name}[block {i}]", "exec"), ns)
    return ns


def test_walkthrough_01_structural_properties(tmp_path, monkeypatch):
    ns = _run("01_structural_properties.md", tmp_path, monkeypatch)
    props = ns["props"]
    assert props["pore_diameter_opt"]["diameter"] == pytest.approx(
        5.397020177310022, abs=1e-6
    )
    assert len(props["windows"]["diameters"]) == 4
    # the dump block wrote both artifacts into the scratch cwd
    assert (tmp_path / "PUDXES_properties.json").exists()
    assert (tmp_path / "PUDXES_out.pdb").exists()
    out = (tmp_path / "PUDXES_out.pdb").read_text()
    for dummy in ("HE", "NE", "AR"):
        assert dummy in out.upper()


def test_walkthrough_02_rdkit_input(tmp_path, monkeypatch):
    # the walkthrough imports rdkit; without a REAL rdkit the same
    # loader path is driven through the duck-typed Mol the io layer
    # provides (exactly what examples/example_2 falls back to).
    # Capability-checked, not import-checked: test_reference_surface
    # leaves a bare rdkit stub (logger only) in sys.modules for the
    # reference import, so `import rdkit` succeeding proves nothing.
    def preamble(ns, _):
        try:
            import rdkit

            usable = hasattr(rdkit.Chem, "MolFromMol2File")
        except (ImportError, AttributeError):
            usable = False
        if not usable:
            from pywindow_tpu.io.inputs import Input, rdkit_like_mol

            chem = types.ModuleType("rdkit.Chem")
            chem.MolFromMol2File = lambda path, removeHs=False: (
                rdkit_like_mol(Input().load_file(path))
            )
            rk = types.ModuleType("rdkit")
            rk.Chem = chem
            monkeypatch.setitem(sys.modules, "rdkit", rk)
            monkeypatch.setitem(sys.modules, "rdkit.Chem", chem)

    ns = _run("02_rdkit_input.md", tmp_path, monkeypatch, preamble=preamble)
    # 84 heavy atoms; pore golden from reference examples/example_2.py
    assert ns["mol"].no_of_atoms == 84
    assert ns["props"]["pore_diameter"]["diameter"] == pytest.approx(
        5.39702, abs=1e-4
    )


def test_walkthrough_03_average_diameter(tmp_path, monkeypatch):
    ns = _run("03_average_diameter.md", tmp_path, monkeypatch)
    assert ns["avg"] == pytest.approx(13.832017514255472, abs=1e-9)


@pytest.mark.slow
def test_walkthrough_04_mof(tmp_path, monkeypatch):
    ns = _run("04_mof.md", tmp_path, monkeypatch)
    props = ns["props"]
    assert props["pore_diameter_opt"]["diameter"] == pytest.approx(
        12.2772, abs=1e-3
    )
    assert len(props["windows"]["diameters"]) == 6


@pytest.mark.slow
def test_walkthrough_05_metal_organic_cage(tmp_path, monkeypatch):
    # final block is the "if your PDB used forcefield names" aside —
    # SAYGOR already carries element symbols, so it is prose, not flow
    ns = _run(
        "05_metal_organic_cage.md", tmp_path, monkeypatch, skip_blocks={1}
    )
    props = ns["props"]
    assert props["pore_diameter_opt"]["diameter"] == pytest.approx(
        9.4050, abs=1e-3
    )
    got = np.sort(np.asarray(props["windows"]["diameters"], dtype=float))
    assert got == pytest.approx(
        [5.9568, 6.8087, 7.8919, 8.2966], abs=1e-3
    )


def test_walkthrough_06_periodic_system(tmp_path, monkeypatch):
    ns = _run("06_periodic_system.md", tmp_path, monkeypatch)
    assert len(ns["molsys"].molecules) == 8
    assert ns["props"]["pore_diameter_opt"]["diameter"] == pytest.approx(
        5.397, abs=2e-3
    )
    assert len(ns["results"]) == 8


@pytest.mark.slow
def test_walkthrough_07_trajectory_single_molecule(tmp_path, monkeypatch):
    ns = _run("07_trajectory_single_molecule.md", tmp_path, monkeypatch)
    assert ns["traj"].no_of_frames == 20
    assert len(ns["traj"].analysis_output) == 20
    assert ns["props"]["pore_diameter_opt"]["diameter"] > 3.0
    # the save/reload block round-tripped into traj2
    assert len(ns["traj2"].analysis_output) == 20


@pytest.mark.slow
def test_walkthrough_08_trajectory_periodic(tmp_path, monkeypatch):
    # the walkthrough opens "periodic_traj.pdb"; synthesise it the way
    # examples/example_8 does (two frames of the periodic test system)
    def preamble(_, cwd):
        base = (REPO / "tests" / "data" / "system_periodic.pdb").read_text()
        frame = base[: base.rindex("END")] + "END\n"
        (cwd / "periodic_traj.pdb").write_text(frame * 2)

    ns = _run("08_trajectory_periodic.md", tmp_path, monkeypatch,
              preamble=preamble)
    mols = ns["mols"]
    assert len(mols) == 8
    assert 3.0 < mols[0]["pore_diameter_opt"]["diameter"] < 7.0
    # the batched block analysed both frames
    assert set(ns["traj"].analysis_output) == {0, 1}
