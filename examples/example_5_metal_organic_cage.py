"""Example 5: a metal-organic cage (SAYGOR, 448 atoms, Pd centres).

Mirrors reference examples/example_5.py.
"""

import numpy as np

from _common import DATA, summarise

import pywindow_tpu as pw


def main() -> None:
    molsys = pw.MolecularSystem.load_file(DATA / "SAYGOR.pdb")
    mol = molsys.system_to_molecule()
    props = mol.full_analysis()
    summarise("SAYGOR", props)
    wins = np.sort(props["windows"]["diameters"])
    expected = np.sort(
        [
            7.891850464732435, 8.296593512434261,
            5.956810992876738, 6.808675682597675,
        ]
    )
    assert len(wins) == 4 and np.allclose(wins, expected, atol=0.01), wins
    assert abs(
        props["pore_diameter_opt"]["diameter"] - 9.40496927130876
    ) < 0.01
    print("  SAYGOR: OK")


if __name__ == "__main__":
    main()
