"""Generate the executable example notebooks from the walkthroughs.

The eight markdown walkthroughs (docs/walkthroughs/NN_*.md) are the
narrative source of truth; this script converts them into runnable
`.ipynb` files under examples/notebooks/ with the reference's notebook
names (reference: examples/Example{1..8}_*.ipynb).  Fenced ```python
blocks become code cells, everything else becomes markdown cells, and a
setup cell pins the import path and a throwaway working directory.

Run: python scripts/build_notebooks.py   (then scripts/run_notebooks.py
executes them all).
"""

from __future__ import annotations

import pathlib
import re

import nbformat

REPO = pathlib.Path(__file__).resolve().parent.parent
SRC = REPO / "docs" / "walkthroughs"
DST = REPO / "examples" / "notebooks"

#: walkthrough -> reference notebook filename
NAMES = {
    "01_structural_properties.md":
        "Example1_StructuralPropertiesOfMolecularPores.ipynb",
    "02_rdkit_input.md": "Example2_LoadingRDKitMolecule.ipynb",
    "03_average_diameter.md":
        "Example3_CalculatingAverageDiameter.ipynb",
    "04_mof.md": "Example4_AnalyseMOF.ipynb",
    "05_metal_organic_cage.md":
        "Example5_AnalyseMetalOrganicCage.ipynb",
    "06_periodic_system.md":
        "Example6_PeriodicSystemMultipleMolecules.ipynb",
    "07_trajectory_single_molecule.md":
        "Example7_AnalysingTrajectorySingleMol.ipynb",
    "08_trajectory_periodic.md":
        "Example8_AnalysingTrajectoryPeriodic.ipynb",
}

SETUP = '''\
# Setup: locate the repo, import path, throwaway working directory.
import os, pathlib, sys, tempfile

ROOT = pathlib.Path.cwd()
while not (ROOT / "pywindow_tpu").is_dir():
    if ROOT.parent == ROOT:
        raise RuntimeError("run this notebook from inside the repo")
    ROOT = ROOT.parent
sys.path.insert(0, str(ROOT))
if os.environ.get("PYWINDOW_NB_FORCE_CPU"):  # execution harness / CI
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
work = pathlib.Path(tempfile.mkdtemp(prefix="pywindow_nb_"))
if not (work / "tests").exists():
    os.symlink(ROOT / "tests", work / "tests")
os.chdir(work)  # outputs land here, inputs resolve via tests/data/...
'''

#: per-notebook replacements applied to code blocks (keyed by the first
#: line of the original block): environments without RDKit fall back,
#: and notebook 8 synthesizes its periodic PDB trajectory fixture.
PATCHES = {
    "from rdkit import Chem": '''\
# RDKit is optional: fall back to the XYZ reader when it is missing
# (same behaviour as examples/example_2_rdkit_input.py).
import pywindow_tpu as pw

try:
    from rdkit import Chem

    rdkit_mol = Chem.MolFromMol2File(
        "tests/data/PUDXES.mol2", removeHs=False
    )
    molsys = pw.MolecularSystem.load_rdkit_mol(rdkit_mol)
except ImportError:
    print("RDKit not installed - loading the same cage from XYZ")
    molsys = pw.MolecularSystem.load_file("tests/data/PUDXES.xyz")
mol = molsys.system_to_molecule()
props = mol.full_analysis()
print(props["pore_diameter"]["diameter"])
''',
    'molsys.decipher_atom_keys("OPLS")   # or "DLF"': '''\
# SAYGOR.pdb already carries element symbols, so deciphering them as
# OPLS atom names raises AtomKeyError - shown here for the PDBs that
# do use forcefield names:
from pywindow_tpu.io.forcefield import AtomKeyError

try:
    molsys.decipher_atom_keys("OPLS")   # or "DLF" for DL_F notation
except AtomKeyError as exc:
    print(f"(not OPLS-keyed, as expected: {exc})")
''',
    'traj = pw.PDB("periodic_traj.pdb")': '''\
import pywindow_tpu as pw

# Synthesize a 3-frame periodic PDB trajectory from the periodic
# system fixture (frames separated by END records).
base = (ROOT / "tests/data/system_periodic.pdb").read_text()
frame = base[: base.rindex("END")] + "END\\n"
pathlib.Path("periodic_traj.pdb").write_text(frame * 3)

traj = pw.PDB("periodic_traj.pdb")          # frames separated by END
traj.analysis(frames=0, modular=True, rebuild=True, forcefield="DLF")

mols = traj.analysis_output[0]              # {molecule_key: properties}
print(len(mols))                            # 8 molecules in frame 0
print(mols[0]["pore_diameter_opt"]["diameter"])
''',
}


def md_to_cells(text: str) -> list:
    cells = []
    pos = 0
    fence = re.compile(r"^```(\w*)\n(.*?)^```\n", re.S | re.M)
    for m in fence.finditer(text):
        before = text[pos : m.start()].strip("\n")
        if before.strip():
            cells.append(nbformat.v4.new_markdown_cell(before))
        lang, body = m.group(1), m.group(2)
        if lang == "python":
            patched = None
            for key, repl in PATCHES.items():
                if key in body:
                    patched = repl
                    break
            cells.append(
                nbformat.v4.new_code_cell(
                    (patched or body).rstrip("\n")
                )
            )
        else:
            # expected-output block: keep as fenced markdown
            cells.append(
                nbformat.v4.new_markdown_cell(
                    f"```\n{body.rstrip()}\n```"
                )
            )
        pos = m.end()
    tail = text[pos:].strip("\n")
    if tail.strip():
        cells.append(nbformat.v4.new_markdown_cell(tail))
    return cells


def build() -> list[pathlib.Path]:
    DST.mkdir(parents=True, exist_ok=True)
    written = []
    for src_name, dst_name in NAMES.items():
        text = (SRC / src_name).read_text()
        cells = md_to_cells(text)
        # insert the setup cell after the leading title cell
        cells.insert(1, nbformat.v4.new_code_cell(SETUP.rstrip("\n")))
        nb = nbformat.v4.new_notebook(
            cells=cells,
            metadata={
                "kernelspec": {
                    "display_name": "Python 3",
                    "language": "python",
                    "name": "python3",
                },
                "language_info": {"name": "python"},
            },
        )
        # deterministic cell ids: nbformat generates random ones, which
        # would churn the checked-in notebooks on every regeneration
        for i, cell in enumerate(nb.cells):
            cell["id"] = f"cell-{i:02d}"
        out = DST / dst_name
        nbformat.write(nb, out)
        written.append(out)
    return written


if __name__ == "__main__":
    for p in build():
        print(p.relative_to(REPO))
