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


def pytest_collection_finish(session) -> None:
    """Disable the persistent compile cache for full-suite-scale runs.

    KNOWN FLAKE (bisected 2026-08-18, extended 2026-08-21; see
    scripts/repro_cache_flake.py): one process accumulating ~200
    compiled programs can die with a fatal signal inside jax/XLA —
    on the persistent-cache (de)serialisation paths
    (``put_executable_and_time`` cold, the deserialize path warm) AND,
    with the cache disabled, inside ``backend_compile_and_load``
    itself (full-suite run, 2026-08-21, segfault at ~95% in
    test_windows).  Every file passes standalone and each suite
    shard passes — the trigger is scale, not repo code, and the cache
    is an aggravator rather than the root cause.  Full-suite sessions
    still drop the cache (it removes the two most-seen crash sites);
    the RELIABLE way to run everything is the sharded wrapper
    ``python scripts/run_suite.py`` (used by CI too).  Per-file and
    ``-m "not slow"`` iteration runs keep the cache for speed.
    Escape hatch: PYWINDOW_TPU_KEEP_COMPILE_CACHE=1.
    """
    if os.environ.get("PYWINDOW_TPU_KEEP_COMPILE_CACHE") == "1":
        return
    slow_files = {
        item.path
        for item in session.items
        if item.get_closest_marker("slow") is not None
    }
    # threshold sits between the biggest run_suite.py shard (10 slow
    # files — which PASSES with the cache on, per the bisect's
    # "second half" leg) and the full suite (15): only a genuine
    # one-process full run drops the cache.
    if len(slow_files) >= 13:
        jax.config.update("jax_enable_compilation_cache", False)


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
