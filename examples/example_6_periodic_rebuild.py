"""Example 6: molecules in a periodic system, rebuilt across the
boundary and analysed one by one.

Mirrors reference examples/example_6.py.
"""

import numpy as np

from _common import DATA

import pywindow_tpu as pw


def main() -> None:
    molsys = pw.MolecularSystem.load_file(DATA / "system_periodic.pdb")
    molsys.make_modular(rebuild=True)
    print(f"  rebuilt into {len(molsys.molecules)} molecules")
    assert len(molsys.molecules) == 8
    mol0 = molsys.molecules[0]
    props = mol0.full_analysis()
    assert mol0.no_of_atoms == 168
    assert abs(props["pore_diameter_opt"]["diameter"] - 5.397020177310022) < 0.01
    wins = np.sort(props["windows"]["diameters"])
    assert len(wins) == 4 and np.allclose(wins, 3.63, atol=0.02), wins
    print(f"  mol_0: pore_opt {props['pore_diameter_opt']['diameter']:.3f} A,"
          f" windows {np.round(wins, 3)} -> OK")


if __name__ == "__main__":
    main()
