"""Chemical data tables."""

import numpy as np
import pytest

from pywindow_tpu import tables


def test_sizes():
    assert len(tables.atomic_mass) == 85
    assert len(tables.atomic_vdw_radius) == 85
    assert len(tables.atomic_covalent_radius) == 85
    assert len(tables.periodic_table) == 118
    assert len(tables.opls_atom_keys) == 18


def test_spot_values():
    assert tables.atomic_mass["C"] == 12.011
    assert tables.atomic_vdw_radius["C"] == 1.70
    assert tables.atomic_covalent_radius["H"] == 0.23
    assert tables.atomic_mass["X"] == 1  # dummy atom
    # the reference table predates the 2016 IUPAC names (Uuo == Og)
    assert tables.periodic_table["Uuo"] == 118
    assert "CA" in tables.opls_atom_keys["C"]


def test_element_ids_roundtrip():
    ids = tables.element_ids(np.array(["C", "n", "ZN"]))
    np.testing.assert_allclose(
        tables.ELEMENT_MASS[ids], [12.011, 14.007, 65.39]
    )


def test_unknown_element():
    with pytest.raises(tables.UnknownElementError):
        tables.element_ids(["Qq"])
