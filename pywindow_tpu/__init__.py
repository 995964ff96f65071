"""pywindow_tpu — TPU-native structural analysis of porous molecules.

A from-scratch JAX/XLA framework with the capabilities of pywindow
(https://github.com/marcinmiklitz/pywindow): pore diameters/volumes,
window detection, vdW-corrected molecular dimensions, periodic molecule
reconstruction and MD-trajectory analysis — with every geometric kernel
fused, batched and shardable across TPU devices.

Public surface mirrors the reference's flat exports
(reference: src/pywindow/__init__.py:3-19).
"""

from pywindow_tpu.config import DEFAULT_CONFIG, AnalysisConfig
from pywindow_tpu.io.inputs import Input
from pywindow_tpu.io.outputs import Output
from pywindow_tpu.molecular import MolecularSystem, Molecule
from pywindow_tpu.tables import periodic_table
from pywindow_tpu.trajectory import DLPOLY, PDB, XYZ, make_supercell
from pywindow_tpu.utilities import compare_properties_dict

__version__ = "0.1.0"

__all__ = [
    "DLPOLY",
    "PDB",
    "XYZ",
    "AnalysisConfig",
    "DEFAULT_CONFIG",
    "Input",
    "MolecularSystem",
    "Molecule",
    "Output",
    "compare_properties_dict",
    "make_supercell",
    "periodic_table",
]
