"""Execute every example notebook clean-room (nbclient).

Rebuilds the notebooks from the walkthrough sources first, then runs
each in its own kernel with the CPU backend forced (deterministic in
CI / verification; on a user machine drop PYWINDOW_NB_FORCE_CPU to run
on the default backend).  Exits non-zero on the first failing cell.

Run: python scripts/run_notebooks.py [pattern]
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import nbformat
from nbclient import NotebookClient

from build_notebooks import DST, build


def run_all(pattern: str = "") -> int:
    build()
    os.environ["PYWINDOW_NB_FORCE_CPU"] = "1"
    failures = 0
    for path in sorted(DST.glob("*.ipynb")):
        if pattern and pattern not in path.name:
            continue
        nb = nbformat.read(path, as_version=4)
        t0 = time.perf_counter()
        try:
            NotebookClient(
                nb, timeout=900, kernel_name="python3"
            ).execute()
            nbformat.write(nb, path)  # keep executed outputs in place
            print(f"OK   {path.name} ({time.perf_counter() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures += 1
            print(f"FAIL {path.name}: {str(exc)[:500]}")
    return failures


if __name__ == "__main__":
    raise SystemExit(
        run_all(sys.argv[1] if len(sys.argv) > 1 else "")
    )
