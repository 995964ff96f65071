"""Periodic reconstruction parity against the reference's golden rebuilds.

The golden PDB files (tests/data/system_periodic_rebuild.pdb,
mol_system_rebuild.pdb) were produced by the reference; the rebuilt
system must match them atom-for-atom in order and position
(reference: tests/test_molecular.py:4467-4554).
"""

import numpy as np

import pywindow_tpu as pw
from pywindow_tpu.ops.rebuild import connected_components_fast
from tests.conftest import DATA, load_pdb


def test_rebuild_molecule_count_and_golden_coordinates():
    molsys = pw.MolecularSystem.load_file(DATA / "system_periodic.pdb")
    rebuilt = molsys.rebuild_system()
    rebuilt_mols = pw.MolecularSystem.load_system(rebuilt.system)
    rebuilt_mols.make_modular()
    assert len(rebuilt_mols.molecules) == 8
    for mol in rebuilt_mols.molecules.values():
        assert mol.no_of_atoms == 168

    gold_el, gold_co = load_pdb(DATA / "system_periodic_rebuild.pdb")
    np.testing.assert_array_equal(
        np.asarray(rebuilt.system["elements"], dtype="<U2"), gold_el
    )
    # golden PDB stores 3 decimals
    np.testing.assert_allclose(
        rebuilt.system["coordinates"], gold_co, atol=5.1e-4
    )


def test_make_modular_without_rebuild_gives_fragments():
    molsys = pw.MolecularSystem.load_file(DATA / "system_periodic.pdb")
    molsys.make_modular(rebuild=False)
    assert len(molsys.molecules) == 33


def test_nonperiodic_single_molecule():
    molsys = pw.MolecularSystem.load_file(DATA / "system.pdb")
    molsys.make_modular()
    assert len(molsys.molecules) == 1
    assert molsys.molecules[0].no_of_atoms == 168


def test_fast_components_counts():
    molsys = pw.MolecularSystem.load_file(DATA / "system.pdb")
    labels = connected_components_fast(molsys.system)
    assert len(set(labels)) == 1
    molsys2 = pw.MolecularSystem.load_file(DATA / "system_periodic.pdb")
    labels2 = connected_components_fast(molsys2.system)
    assert len(set(labels2) - {-1}) == 33
