"""Shared helpers for the example scripts."""

import pathlib
import sys

# allow running the examples straight from a checkout
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

# persistent XLA compilation cache: example/script reruns skip the
# 20-40 s per-program TPU compiles (same policy as tests/conftest.py)
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# on TPU run the production mixed mode: float32 pipeline + float64
# pore-opt stage (config.pore_opt_dtype) — plateau-window accuracy at
# ~2% cost.  CPU runs keep whatever x64 setting the caller chose.
if jax.default_backend() == "tpu":
    import os as _os

    _os.environ["PYWINDOW_TPU_FORCE_F32"] = "1"
    jax.config.update("jax_enable_x64", True)

import numpy as np

import pywindow_tpu as pw

DATA = pathlib.Path(__file__).parent.parent / "tests" / "data"


def check(name: str, properties: dict, expected: dict, atol=0.01) -> None:
    """Validate computed properties against expected values (<atol A).

    Only the keys present in ``expected`` are compared.
    """
    subset = {k: properties[k] for k in expected if k in properties}
    ok, prop = pw.compare_properties_dict(subset, expected, atol=atol)
    if not ok:
        msg = f"{name}: property {prop!r} disagrees beyond {atol}"
        raise RuntimeError(msg)
    print(f"  {name}: OK")


def summarise(name: str, p: dict) -> None:
    wins = p["windows"]["diameters"]
    wins = None if wins is None else np.round(np.sort(wins), 3)
    print(
        f"  {name}: pore {p['pore_diameter']['diameter']:.3f} A, "
        f"pore_opt {p['pore_diameter_opt']['diameter']:.3f} A, "
        f"max {p['maximum_diameter']['diameter']:.3f} A, "
        f"windows {wins}"
    )
