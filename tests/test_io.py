"""I/O readers/writers and force-field deciphering."""

import json

import numpy as np
import pytest

import pywindow_tpu as pw
from pywindow_tpu.io.forcefield import (
    AtomKeyConflictError,
    AtomKeyError,
    ForceFieldError,
    decipher_atom_key,
    dlf_notation,
    opls_notation,
)
from pywindow_tpu.io.inputs import CorruptedFileError, Input
from tests.conftest import DATA


def test_read_xyz():
    system = Input().load_file(DATA / "PUDXES.xyz")
    assert len(system["elements"]) == 168
    assert system["coordinates"].shape == (168, 3)
    assert system["elements"][0] in ("C", "N", "H")


def test_read_pdb_periodic():
    system = Input().load_file(DATA / "system_periodic.pdb")
    assert system["unit_cell"].shape == (6,)
    assert system["lattice"].shape == (3, 3)
    assert "atom_ids" in system
    assert len(system["elements"]) == len(system["coordinates"])


def test_read_pdb_multiple_end_rejected(tmp_path):
    p = tmp_path / "traj.pdb"
    p.write_text("ATOM      1  C   MOL A   1       0.0     0.0     0.0\n"
                 "END \nEND \n")
    with pytest.raises(CorruptedFileError):
        Input().load_file(p)


def test_corrupt_xyz_rejected(tmp_path):
    p = tmp_path / "bad.xyz"
    p.write_text("3\nremark\nC 0.0 0.0\n")
    with pytest.raises(CorruptedFileError):
        Input().load_file(p)


def test_xyz_roundtrip(tmp_path, cc3):
    elements, coords = cc3
    out = tmp_path / "roundtrip.xyz"
    pw.Output().dump2file(
        {"elements": elements, "coordinates": coords}, out
    )
    back = Input().load_file(out)
    np.testing.assert_array_equal(back["elements"], elements)
    np.testing.assert_allclose(back["coordinates"], coords, atol=1e-6)


def test_pdb_roundtrip(tmp_path, cc3):
    elements, coords = cc3
    out = tmp_path / "roundtrip.pdb"
    pw.Output().dump2file(
        {"elements": elements, "coordinates": coords},
        out,
        atom_ids_key="elements",
    )
    back = Input().load_file(out)
    np.testing.assert_array_equal(back["elements"], elements)
    np.testing.assert_allclose(back["coordinates"], coords, atol=1e-3)


def test_json_dump_guard(tmp_path):
    out = tmp_path / "x.json"
    pw.Output().dump2json({"a": np.arange(3)}, out)
    assert json.load(open(out)) == {"a": [0, 1, 2]}
    with pytest.raises(FileExistsError):
        pw.Output().dump2json({"a": 1}, out)
    pw.Output().dump2json({"a": 1}, out, override=True)


def test_dlf_notation():
    assert dlf_notation("C12") == "C"
    assert dlf_notation("ca") == "ca"
    assert dlf_notation("Ni2+?") in ("Ni+", "Ni")  # '?' stripped
    assert dlf_notation("1C3") == "C"  # Materials Studio leading digits


def test_opls_notation():
    assert opls_notation("CA") == "C"
    with pytest.raises(AtomKeyConflictError):
        opls_notation("ne")
    with pytest.raises(AtomKeyError):
        opls_notation("ZZTOP")


def test_decipher_dispatch():
    assert decipher_atom_key("C81", "DLF") == "C"
    assert decipher_atom_key("CA", "OPLS") == "C"
    with pytest.raises(ForceFieldError):
        decipher_atom_key("C", "AMBER")


def test_swap_and_decipher_atom_keys():
    molsys = pw.MolecularSystem.load_system(
        {
            "atom_ids": np.array(["he", "C12", "N3"]),
            "coordinates": np.zeros((3, 3)),
        }
    )
    molsys.swap_atom_keys({"he": "H"})
    molsys.decipher_atom_keys("DLF")
    np.testing.assert_array_equal(
        molsys.system["elements"], np.array(["H", "C", "N"])
    )
