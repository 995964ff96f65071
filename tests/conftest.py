"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh with float64 enabled:
CPU-x64 is the golden-parity mode (matches the reference to ~1e-12);
the 8 virtual devices let sharding tests run without TPU hardware.
"""

import os
import pathlib

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the suite's cost is dominated by window
# pipeline compiles (one per golden system); repeat runs reuse them.
_CACHE = pathlib.Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA


def load_xyz(path):
    lines = open(path).readlines()
    body = [ln for ln in lines[2:] if ln.strip()]
    elements = np.array([ln.split()[0] for ln in body])
    coords = np.array([[float(x) for x in ln.split()[1:4]] for ln in body])
    return elements, coords


def load_pdb(path):
    elements, coords = [], []
    for ln in open(path):
        if ln[:6] in ("HETATM", "ATOM  "):
            elements.append(ln[76:78].strip())
            coords.append(
                [float(ln[30:38]), float(ln[38:46]), float(ln[46:54])]
            )
    return np.array(elements), np.array(coords)


def load_structure(name):
    """Golden structure by name, from tests/data (.xyz, else .pdb)."""
    p = DATA / f"{name}.xyz"
    if p.exists():
        return load_xyz(p)
    return load_pdb(DATA / f"{name}.pdb")


@pytest.fixture(scope="session")
def cc3():
    return load_xyz(DATA / "PUDXES.xyz")
