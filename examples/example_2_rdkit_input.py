"""Example 2: loading a molecule from RDKit.

Mirrors reference examples/example_2.py.  RDKit is an optional
dependency; without it this example demonstrates the equivalent
file-based path.
"""

from _common import DATA, summarise

import pywindow_tpu as pw


def main() -> None:
    try:
        from rdkit import Chem
    except ImportError:
        print("rdkit not installed - using the XYZ loader instead")
        molsys = pw.MolecularSystem.load_file(DATA / "PUDXES.xyz")
    else:
        rdkit_mol = Chem.MolFromMol2File(
            str(DATA / "PUDXES.mol2"), removeHs=False
        )
        molsys = pw.MolecularSystem.load_rdkit_mol(rdkit_mol)
    mol = molsys.system_to_molecule()
    summarise("PUDXES", mol.full_analysis())


if __name__ == "__main__":
    main()
