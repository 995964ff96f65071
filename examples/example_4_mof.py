"""Example 4: window analysis of a MOF (MIBQAR, 424 atoms).

Mirrors reference examples/example_4.py.
"""

import numpy as np

from _common import DATA, summarise

import pywindow_tpu as pw


def main() -> None:
    molsys = pw.MolecularSystem.load_file(DATA / "MIBQAR.pdb")
    mol = molsys.system_to_molecule()
    props = mol.full_analysis()
    summarise("MIBQAR", props)
    wins = np.sort(props["windows"]["diameters"])
    expected = np.sort(
        [
            7.952276233009409, 7.944822155795365, 7.963120398998443,
            7.938328681370597, 7.944268889914964, 7.936596981480963,
        ]
    )
    assert len(wins) == 6, f"expected 6 windows, got {len(wins)}"
    assert np.allclose(wins, expected, atol=0.01), wins
    assert abs(
        props["pore_diameter_opt"]["diameter"] - 12.277218239447373
    ) < 0.01
    print("  MIBQAR: OK")


if __name__ == "__main__":
    main()
