"""Example 7: DL_POLY HISTORY trajectory analysis with save/reload.

Mirrors reference examples/example_7.py, plus the TPU-native batched
sweep that replaces its ``ncpus`` process pool.
"""

import json
import pathlib
import tempfile

import numpy as np

from _common import DATA

import pywindow_tpu as pw


def main() -> None:
    traj = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    print(f"  {traj.no_of_frames} frames, {traj.no_of_atoms} atoms, "
          f"{traj.periodic_boundary}")

    # single frame, reference-style
    frame_0 = traj.get_frames(0)[0]
    frame_0.swap_atom_keys({"he": "H"})
    frame_0.decipher_atom_keys("OPLS")
    mol = frame_0.system_to_molecule()
    props = mol.full_analysis()
    print(f"  frame 0 pore: {props['pore_diameter']['diameter']:.3f} A")

    # the whole trajectory in one device-batched sweep
    traj.analysis_batched(
        frames="all", forcefield="opls", swap_atoms={"he": "H"}
    )
    pores = [
        traj.analysis_output[f]["0"]["pore_diameter"]["diameter"]
        for f in range(traj.no_of_frames)
    ]
    print(f"  pore diameter over 20 frames: "
          f"{np.mean(pores):.3f} +- {np.std(pores):.3f} A")

    with tempfile.TemporaryDirectory() as td:
        out = pathlib.Path(td) / "analysis.json"
        traj.save_analysis(out)
        reloaded = json.load(open(out))
        assert len(reloaded) == traj.no_of_frames
    print("  save/reload: OK")


if __name__ == "__main__":
    main()
