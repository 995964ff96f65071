"""Example 8: a periodic PDB trajectory with per-frame rebuild.

Mirrors reference examples/example_8.py (whose HISTORY_periodic input
is not distributed); here a two-frame PDB trajectory is synthesised
from the periodic test system.
"""

import pathlib
import tempfile

from _common import DATA

import pywindow_tpu as pw


def main() -> None:
    base = (DATA / "system_periodic.pdb").read_text()
    frame = base[: base.rindex("END")] + "END\n"
    with tempfile.TemporaryDirectory() as td:
        trajfile = pathlib.Path(td) / "periodic_traj.pdb"
        trajfile.write_text(frame * 2)
        traj = pw.PDB(trajfile)
        print(f"  {traj.no_of_frames} frames mapped")
        assert traj.no_of_frames == 2
        traj.analysis(frames=0, modular=True, rebuild=True, forcefield="DLF")
        mols = traj.analysis_output[0]
        print(f"  frame 0 rebuilt into {len(mols)} molecules; "
              f"pore_opt of mol 0: "
              f"{mols[0]['pore_diameter_opt']['diameter']:.3f} A")
        assert len(mols) == 8


if __name__ == "__main__":
    main()
