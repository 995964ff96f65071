"""Host-side utility functions and the properties comparator.

Public helpers mirroring the reference's ``utilities`` surface where it
is host-side string/dict work; the numeric kernels live in
:mod:`pywindow_tpu.ops`.
"""

from __future__ import annotations

import numpy as np

from pywindow_tpu.io.forcefield import (  # noqa: F401 (public re-exports)
    decipher_atom_key,
    dlf_notation,
    opls_notation,
)
from pywindow_tpu.io.outputs import to_list  # noqa: F401
from pywindow_tpu.ops.cell import (  # noqa: F401
    cart_to_frac,
    create_supercell,
    frac_to_cart,
    lattice_array_to_unit_cell,
    unit_cell_to_lattice_array,
    volume_from_cell_parameters,
    volume_from_lattice_array,
)


def is_number(value: str) -> bool:
    """True if the string converts to a float
    (reference: utilities.py:45-51)."""
    try:
        float(value)
    except (ValueError, TypeError):
        return False
    return True


def sphere_volume(radius: float) -> float:
    return float(4.0 / 3.0 * np.pi * radius**3)


#: the typed property paths the comparator understands
#: (reference: utilities.py:1699-1715).
POSSIBLE_PROPERTIES = {
    "centre_of_mass": "array",
    "maximum_diameter.atom_1": "int",
    "maximum_diameter.atom_2": "int",
    "maximum_diameter.diameter": "float",
    "no_of_atoms": "int",
    "pore_diameter.atom": "int",
    "pore_diameter.diameter": "float",
    "pore_diameter_opt.atom_1": "int",
    "pore_diameter_opt.centre_of_mass": "array",
    "pore_diameter_opt.diameter": "float",
    "pore_volume": "float",
    "pore_volume_opt": "float",
    "windows.centre_of_mass": "array",
    "windows.diameters": "array",
    "average_diameter": "float",
}


def compare_properties_dict(
    dict1: dict, dict2: dict, rtol: float = 1e-05, atol: float = 1e-08
) -> tuple[bool, str]:
    """Typed comparison of two properties dictionaries.

    Returns ``(True, "none")`` on agreement or ``(False, prop)`` naming
    the first disagreeing property (reference: utilities.py:1694-1754).
    Tolerances are configurable (the reference hard-codes numpy
    defaults); pass e.g. ``atol=0.01`` for the cross-implementation
    accuracy contract.
    """
    for prop, method in POSSIBLE_PROPERTIES.items():
        path = prop.split(".")
        head = path[0]
        in1, in2 = head in dict1, head in dict2
        if not in1 and not in2:
            continue
        if in1 != in2:
            return (False, prop)
        item1, item2 = dict1[head], dict2[head]
        if len(path) == 2:
            item1 = item1[path[1]]
            item2 = item2[path[1]]
        if (item1 is None) != (item2 is None):
            return (False, prop)
        if item1 is None:
            continue
        if method == "array" and not np.allclose(
            item1, item2, rtol=rtol, atol=atol
        ):
            return (False, prop)
        if method == "float" and not np.isclose(
            item1, item2, rtol=rtol, atol=atol
        ):
            return (False, prop)
        if method == "int" and item1 != item2:
            return (False, prop)
    return (True, "none")
