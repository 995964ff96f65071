"""Object-model API coverage: loads, dumps, round-trips, invariants
(analog of the reference's tests/test_molecular.py)."""

import json

import numpy as np
import pytest

import pywindow_tpu as pw
from tests.conftest import DATA


@pytest.fixture(scope="module")
def analysed_cc3():
    molsys = pw.MolecularSystem.load_file(DATA / "PUDXES.xyz")
    mol = molsys.system_to_molecule()
    mol.full_analysis()
    return molsys, mol


def test_load_file_vs_load_system(cc3):
    elements, coords = cc3
    a = pw.MolecularSystem.load_file(DATA / "PUDXES.xyz")
    b = pw.MolecularSystem.load_system(
        {"elements": elements, "coordinates": coords}, "PUDXES"
    )
    np.testing.assert_array_equal(a.system["elements"], b.system["elements"])
    np.testing.assert_allclose(
        a.system["coordinates"], b.system["coordinates"]
    )
    assert a.system_id == b.system_id == "PUDXES"


def test_dump_molecule_with_overlays(analysed_cc3, tmp_path):
    _, mol = analysed_cc3
    out = tmp_path / "cc3_overlay.pdb"
    mol.dump_molecule(out, include_coms=True)
    text = out.read_text()
    # 168 atoms + He (COM) + Ne (pore centre) + 4 Ar (window centres)
    assert text.count("\nATOM") + text.startswith("ATOM") == 174
    assert " He " in text or "He" in text
    assert text.count("Ar") >= 4
    # the He marker sits at the COM
    he_line = next(ln for ln in text.splitlines() if " He " in ln)
    he_xyz = [float(he_line[30:38]), float(he_line[38:46]), float(he_line[46:54])]
    np.testing.assert_allclose(he_xyz, [12.4, 12.4, 12.4], atol=1e-3)


def test_dump_properties_json_roundtrip(analysed_cc3, tmp_path):
    _, mol = analysed_cc3
    out = tmp_path / "props.json"
    mol.dump_properties_json(out)
    data = json.load(open(out))
    assert data["pore_diameter"]["diameter"] == pytest.approx(
        5.397020177310022, abs=1e-6
    )
    assert len(data["windows"]["diameters"]) == 4


def test_dump_system_json_roundtrip(analysed_cc3, tmp_path):
    molsys, _ = analysed_cc3
    out = tmp_path / "system.json"
    molsys.dump_system_json(out)
    data = json.load(open(out))
    reloaded = pw.MolecularSystem.load_system(
        {
            "elements": np.array(data["elements"]),
            "coordinates": np.array(data["coordinates"]),
        }
    )
    mol = reloaded.system_to_molecule()
    assert mol.no_of_atoms == 168


def test_dump_system_modular(tmp_path):
    molsys = pw.MolecularSystem.load_file(DATA / "system_periodic.pdb")
    molsys.make_modular(rebuild=True)
    out = tmp_path / "modular.pdb"
    molsys.dump_system(out, modular=True)
    text = out.read_text()
    assert text.count("\nATOM") == 8 * 168
    # modular json
    out2 = tmp_path / "modular.json"
    molsys.dump_system_json(out2, modular=True)
    data = json.load(open(out2))
    assert len(data) == 8


def test_dump_system_json_modular_requires_make_modular(tmp_path):
    molsys = pw.MolecularSystem.load_file(DATA / "PUDXES.xyz")
    with pytest.raises(RuntimeError):
        molsys.dump_system_json(tmp_path / "x.json", modular=True)


def test_shift_to_origin_translates_positions(analysed_cc3):
    molsys, _ = analysed_cc3
    mol = pw.MolecularSystem.load_file(
        DATA / "PUDXES.xyz"
    ).system_to_molecule()
    mol.full_analysis()
    pore_before = mol.pore_diameter
    wins_before = np.sort(mol.properties["windows"]["diameters"])
    com_before = np.array(mol.properties["centre_of_mass"])
    wcoms_before = np.array(mol.properties["windows"]["centre_of_mass"])
    mol.shift_to_origin()
    np.testing.assert_allclose(
        mol.properties["centre_of_mass"], [0, 0, 0], atol=1e-12
    )
    # positional properties translated by exactly -com
    np.testing.assert_allclose(
        np.asarray(mol.properties["windows"]["centre_of_mass"]),
        wcoms_before - com_before,
        atol=1e-10,
    )
    # invariant properties unchanged; re-analysis agrees
    props = mol.full_analysis()
    assert props["pore_diameter"]["diameter"] == pytest.approx(
        pore_before, abs=1e-8
    )
    np.testing.assert_allclose(
        np.sort(props["windows"]["diameters"]), wins_before, atol=1e-6
    )
    np.testing.assert_allclose(
        props["centre_of_mass"], [0, 0, 0], atol=1e-10
    )


def test_molecule_from_dict_without_atom_ids(cc3):
    elements, coords = cc3
    mol = pw.Molecule({"elements": elements, "coordinates": coords})
    assert mol.no_of_atoms == 168
    assert not hasattr(mol, "atom_ids")
    assert mol.molecular_weight() == pytest.approx(1117.548, abs=1e-3)


@pytest.mark.slow
def test_analyze_molecules_batched_matches_individual():
    molsys = pw.MolecularSystem.load_file(DATA / "system_periodic.pdb")
    molsys.make_modular(rebuild=True)
    out = molsys.analyze_molecules()
    assert sorted(out) == list(range(8))
    # every rebuilt CC3 copy must agree with the single-molecule result
    single = pw.MolecularSystem.load_file(
        DATA / "PUDXES.xyz"
    ).system_to_molecule()
    single.full_analysis()
    for props in out.values():
        assert props["pore_diameter"]["diameter"] == pytest.approx(
            single.pore_diameter, abs=0.01
        )
        assert len(props["windows"]["diameters"]) == 4


def test_analyze_molecules_requires_modular():
    molsys = pw.MolecularSystem.load_file(DATA / "PUDXES.xyz")
    with pytest.raises(RuntimeError):
        molsys.analyze_molecules()
