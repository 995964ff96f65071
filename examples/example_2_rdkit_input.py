"""Example 2: loading a molecule from RDKit.

Mirrors reference examples/example_2.py: PUDXES.mol2 loaded through
the RDKit entry point with RDKit's default hydrogen stripping (168
atoms -> 84 heavy atoms), validated against the published goldens.
RDKit is an optional dependency; without it a duck-typed Mol built
from the host mol2 parser drives the exact same ``load_rdkit_mol``
code path.
"""

import numpy as np

from _common import DATA, check, summarise

import pywindow_tpu as pw

# reference examples/example_2.py:17-48 (84-atom no-H PUDXES)
EXPECTED = {
    "no_of_atoms": 84,
    "pore_diameter": {"diameter": 5.3970201773100097},
    "pore_diameter_opt": {"diameter": 5.397020177310047},
    "maximum_diameter": {"diameter": 21.77602100564755},
    "average_diameter": 13.599974908590866,
    "windows": {
        "diameters": np.sort(
            np.array([3.63748192, 3.63649472, 3.62912867, 3.63426077])
        )
    },
}


def _load_mol():
    try:
        from rdkit import Chem
    except ImportError:
        from pywindow_tpu.io.inputs import Input, rdkit_like_mol

        print("rdkit not installed - duck-typed Mol from the mol2 parser")
        return rdkit_like_mol(Input().load_file(DATA / "PUDXES.mol2"))
    return Chem.MolFromMol2File(str(DATA / "PUDXES.mol2"))


def main() -> None:
    molsys = pw.MolecularSystem.load_rdkit_mol(_load_mol())
    mol = molsys.system_to_molecule()
    props = dict(mol.full_analysis())
    summarise("PUDXES (84-atom, no H)", props)
    props["windows"] = {
        **props["windows"],
        "diameters": np.sort(props["windows"]["diameters"]),
    }
    check("PUDXES (84-atom, no H)", props, EXPECTED)


if __name__ == "__main__":
    main()
