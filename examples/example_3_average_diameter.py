"""Example 3: average (vdW-corrected) molecular diameter.

Mirrors reference examples/example_3.py.
"""

from _common import DATA, check

import pywindow_tpu as pw


def main() -> None:
    molsys = pw.MolecularSystem.load_file(DATA / "PUDXES.xyz")
    mol = molsys.system_to_molecule()
    avg = mol.calculate_average_diameter()
    print(f"  PUDXES average diameter: {avg:.6f} A")
    check(
        "PUDXES",
        {"no_of_atoms": mol.no_of_atoms, "average_diameter": avg},
        {"no_of_atoms": 168, "average_diameter": 13.832017514255472},
    )


if __name__ == "__main__":
    main()
