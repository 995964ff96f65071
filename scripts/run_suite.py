"""One-command deterministic-green test-suite runner.

A single pytest process running the WHOLE suite can die late in the
run with a fatal signal inside jax/XLA once ~200 compiled programs
accumulate (see scripts/repro_cache_flake.py for the bisect history —
the crash hits the persistent-cache (de)serialisation paths AND, with
the cache disabled, plain ``backend_compile_and_load``; it is a
scale-dependent jax/XLA bug, not repo code).  Per-file and per-shard
runs never reach that scale.

This wrapper runs the suite as the same three shards the CI matrix
uses (.github/workflows/tests.yaml), each in its own subprocess, and
aggregates the exit status.  Shards inherit tests/conftest.py (cpu +
x64 + 8 virtual devices, persistent cache kept ON below the full-suite
threshold, so warm reruns are fast).

Usage: python scripts/run_suite.py [extra pytest args...]
"""

import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

SHARDS: list[list[str]] = [
    ["tests/test_windows.py"],
    [
        "tests/test_validation_suite.py",
        "tests/test_notebooks.py",
        "tests/test_walkthroughs.py",
        "tests/test_trajectory.py",
    ],
    [
        "tests/",
        "--ignore=tests/test_windows.py",
        "--ignore=tests/test_validation_suite.py",
        "--ignore=tests/test_notebooks.py",
        "--ignore=tests/test_walkthroughs.py",
        "--ignore=tests/test_trajectory.py",
    ],
]


def main() -> int:
    extra = sys.argv[1:]
    rc = 0
    t0 = time.perf_counter()
    for i, shard in enumerate(SHARDS):
        ts = time.perf_counter()
        print(f"=== shard {i + 1}/{len(SHARDS)}: {' '.join(shard)}",
              flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *shard, *extra],
            cwd=REPO,
        ).returncode
        print(
            f"=== shard {i + 1} rc={r} "
            f"({time.perf_counter() - ts:.0f}s)",
            flush=True,
        )
        rc = rc or r
    print(f"=== total {time.perf_counter() - t0:.0f}s rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
