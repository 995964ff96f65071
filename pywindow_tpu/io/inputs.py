"""Input readers: XYZ, PDB, MOL (V3000), RDKit.

Produce the system dict contract shared with the reference
(reference: io_tools.py:42-205): ``{"elements", "coordinates",
["atom_ids", "unit_cell", "lattice", "remarks"]}`` — plain numpy on the
host; device encoding happens later at the analysis boundary.
"""

from __future__ import annotations

import pathlib

import numpy as np

from pywindow_tpu.ops.cell import unit_cell_to_lattice_array


class CorruptedFileError(ValueError):
    """Input file malformed (or is a trajectory — use the trajectory
    module)."""


class FileTypeError(ValueError):
    """Unsupported file extension."""


def read_xyz_lines(lines: list[str]) -> dict:
    """XYZ block -> system dict (reference: io_tools.py:106-127)."""
    try:
        body = lines[2:]
        elements = np.array([ln.split()[0] for ln in body])
        coordinates = np.array(
            [[float(x) for x in ln.split()[1:4]] for ln in body]
        )
        if coordinates.shape != (len(elements), 3):
            raise IndexError
    except (IndexError, ValueError):
        msg = (
            "corrupted XYZ file (empty trailing line, missing columns, or a "
            "trajectory — use pywindow_tpu.trajectory.XYZ for trajectories)"
        )
        raise CorruptedFileError(msg) from None
    return {"elements": elements, "coordinates": coordinates}


def read_pdb_lines(lines: list[str]) -> dict:
    """PDB block -> system dict, incl. CRYST1 -> unit_cell/lattice
    (reference: io_tools.py:129-183)."""
    if sum(ln.count("END ") for ln in lines) > 1:
        msg = (
            "multiple 'END' statements found in this PDB file; if it is a "
            "trajectory use pywindow_tpu.trajectory.PDB, otherwise fix it"
        )
        raise CorruptedFileError(msg)
    system: dict = {}
    system["remarks"] = [ln for ln in lines if ln[:6] == "REMARK"]
    cryst = [
        float(ln[s:e])
        for ln in lines
        if ln[:6] == "CRYST1"
        for s, e in ((6, 15), (15, 24), (24, 33), (33, 40), (40, 47), (47, 54))
    ]
    system["unit_cell"] = np.array(cryst)
    if system["unit_cell"].any():
        system["lattice"] = unit_cell_to_lattice_array(system["unit_cell"])
    atoms = [ln for ln in lines if ln[:6] in ("HETATM", "ATOM  ")]
    system["atom_ids"] = np.array(
        [ln[12:16].strip() for ln in atoms], dtype="<U8"
    )
    system["elements"] = np.array(
        [ln[76:78].strip() for ln in atoms], dtype="<U8"
    )
    system["coordinates"] = np.array(
        [[float(ln[30:38]), float(ln[38:46]), float(ln[46:54])] for ln in atoms]
    )
    return system


def read_mol_v3000_lines(lines: list[str]) -> dict:
    """MOL (V3000) block -> system dict (reference: io_tools.py:185-205)."""
    system: dict = {}
    if len(lines) > 2 and lines[2] != "\n":
        system["remarks"] = lines[2]
    elements: list[str] = []
    coordinates: list[list[str]] = []
    in_atoms = False
    for raw in lines:
        parts = raw.split()
        if len(parts) > 3:
            if parts[2] == "END" and parts[3] == "ATOM":
                in_atoms = False
            if in_atoms:
                elements.append(parts[3])
                coordinates.append(parts[4:7])
            if parts[2] == "BEGIN" and parts[3] == "ATOM":
                in_atoms = True
    system["elements"] = np.array(elements)
    system["coordinates"] = np.array(coordinates, dtype=float)
    return system


class Input:
    """Load structures from files or RDKit molecules
    (reference: io_tools.py:42-104)."""

    _READERS = {
        ".xyz": read_xyz_lines,
        ".pdb": read_pdb_lines,
        ".mol": read_mol_v3000_lines,
    }

    def load_file(self, filepath: pathlib.Path | str) -> dict:
        """Parse an ``.xyz``/``.pdb``/``.mol`` file into the system dict
        (``elements``, ``coordinates``, optional ``atom_ids``/``unit_cell``)
        (reference: io_tools.py:107)."""
        filepath = pathlib.Path(filepath)
        reader = self._READERS.get(filepath.suffix)
        if reader is None:
            msg = (
                f"unsupported input extension {filepath.suffix!r}; "
                "use .xyz, .pdb or .mol (V3000)"
            )
            raise FileTypeError(msg)
        with filepath.open() as fh:
            lines = fh.readlines()
        return reader(lines)

    def load_rdkit_mol(self, mol) -> dict:
        """RDKit Mol -> system dict (reference: io_tools.py:80-104).

        RDKit itself is an optional dependency: only this entry point
        touches it, and only via the object the caller passed in.
        """
        n = mol.GetNumAtoms()
        elements = np.empty(n, dtype="<U8")
        coordinates = np.empty((n, 3))
        conf = mol.GetConformer()
        for atom in mol.GetAtoms():
            i = atom.GetIdx()
            elements[i] = atom.GetSymbol()
            pos = conf.GetAtomPosition(i)
            coordinates[i] = (pos.x, pos.y, pos.z)
        return {"elements": elements, "coordinates": coordinates}
