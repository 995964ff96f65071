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
from pywindow_tpu.io.inputs import (
    CorruptedFileError,
    Input,
    rdkit_like_mol,
)
from tests.conftest import DATA


def test_read_xyz():
    system = Input().load_file(DATA / "PUDXES.xyz")
    assert len(system["elements"]) == 168
    assert system["coordinates"].shape == (168, 3)
    assert system["elements"][0] in ("C", "N", "H")


def test_read_mol2():
    system = Input().load_file(DATA / "PUDXES.mol2")
    assert len(system["elements"]) == 168
    assert system["coordinates"].shape == (168, 3)
    # SYBYL type column supplies the symbol: N.2 -> N
    assert system["elements"][0] == "N"
    np.testing.assert_allclose(
        system["coordinates"][0], [13.3040, 13.5150, 6.8900]
    )


def test_read_mol2_corrupt(tmp_path):
    p = tmp_path / "bad.mol2"
    p.write_text("@<TRIPOS>MOLECULE\nname\n")
    with pytest.raises(CorruptedFileError):
        Input().load_file(p)
    p.write_text("@<TRIPOS>ATOM\n1 N1 nan_oops\n")
    with pytest.raises(CorruptedFileError):
        Input().load_file(p)


def test_load_rdkit_mol_duck_typed():
    """Drive Input.load_rdkit_mol through an rdkit-Mol-shaped object.

    Mirrors the reference's RDKit entry (io_tools.py:80-104) without
    the optional dependency: hydrogen stripping matches
    Chem.MolFromMol2File's default (168-atom PUDXES.mol2 -> 84 heavy
    atoms, the system reference examples/example_2.py validates).
    """
    raw = Input().load_file(DATA / "PUDXES.mol2")
    mol84 = rdkit_like_mol(raw)  # remove_hs=True default
    system = Input().load_rdkit_mol(mol84)
    assert len(system["elements"]) == 84
    assert not np.any(system["elements"] == "H")
    mol168 = rdkit_like_mol(raw, remove_hs=False)
    full = Input().load_rdkit_mol(mol168)
    np.testing.assert_array_equal(full["elements"], raw["elements"])
    np.testing.assert_allclose(full["coordinates"], raw["coordinates"])


def test_rdkit_mol_system_golden():
    """84-atom no-H PUDXES via load_rdkit_mol: reference example_2
    goldens for the cheap properties (pore 5.3970201773100097, max
    diameter 21.77602100564755, COM 12.4^3)."""
    raw = Input().load_file(DATA / "PUDXES.mol2")
    molsys = pw.MolecularSystem.load_rdkit_mol(rdkit_like_mol(raw))
    mol = molsys.system_to_molecule()
    assert mol.no_of_atoms == 84
    np.testing.assert_allclose(
        mol.calculate_centre_of_mass(), [12.4] * 3, atol=1e-7
    )
    assert abs(
        mol.calculate_pore_diameter() - 5.3970201773100097
    ) < 1e-8
    assert abs(
        mol.calculate_maximum_diameter() - 21.77602100564755
    ) < 1e-8


@pytest.mark.slow
def test_rdkit_mol_full_analysis_golden():
    """Full analysis of the 84-atom RDKit-path system vs reference
    examples/example_2.py:17-48 goldens (pore_opt 5.397020177310047,
    avg 13.599974908590866, 4 windows ~3.629-3.637)."""
    raw = Input().load_file(DATA / "PUDXES.mol2")
    molsys = pw.MolecularSystem.load_rdkit_mol(rdkit_like_mol(raw))
    mol = molsys.system_to_molecule()
    props = mol.full_analysis()
    assert abs(
        props["pore_diameter_opt"]["diameter"] - 5.397020177310047
    ) < 0.01
    assert abs(
        props["average_diameter"] - 13.599974908590866
    ) < 0.01
    got = np.sort(props["windows"]["diameters"])
    expect = np.sort(
        [3.63748192, 3.63649472, 3.62912867, 3.63426077]
    )
    assert got.shape == (4,)
    np.testing.assert_allclose(got, expect, atol=0.01)


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
