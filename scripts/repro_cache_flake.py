"""Standalone repro attempt for the full-suite compile-cache crash.

THE BUG (bisected 2026-08-18, see .claude/skills/verify/SKILL.md and
tests/conftest.py::pytest_collection_finish): one process that
accumulates ~190 compiled XLA programs with the jax persistent
compilation cache ENABLED can die with a fatal signal
(``Fatal Python error: Segmentation fault`` / ``Aborted``) inside XLA's
executable (de)serialisation — ``put_executable_and_time`` on cold
cache dirs, the deserialize path on warm ones.  Every pytest file
passes standalone and each suite half passes; only the accumulated
scale triggers it, which points at jax/XLA, not repo code.

This script reproduces that scale WITHOUT pytest: it compiles
``--programs`` distinct programs (default 200) shaped like the suite's
window pipelines (vmapped while-loops + reductions over distinct
static shapes, so each is a separate cache entry of nontrivial size)
with the persistent cache pointed at ``--cache-dir``.

Usage:
    python scripts/repro_cache_flake.py                # cold serialize leg
    python scripts/repro_cache_flake.py                # warm deserialize leg
    python scripts/repro_cache_flake.py --no-cache     # control (never crashes)

Exit code 0 = survived (no repro this run); a crash kills the process
with the XLA fatal-signal banner.  The crash is probabilistic at this
scale — the suite needs the full ~190-program load to hit it reliably,
so run both legs a few times before concluding anything.  Keep
``--cache-dir`` OFF the repo tree so repo test runs are unaffected.
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
)

import jax
import jax.numpy as jnp
import numpy as np


def build_program(i: int):
    """One suite-scale program: vmapped bounded while-loop + reductions
    over a distinct static shape per ``i`` (distinct cache entries)."""
    n = 64 + (i % 37)  # distinct static shapes
    steps = 8 + (i % 5)

    def per_row(row):
        def body(c):
            k, x = c
            x = x + jnp.tanh(row * 0.25 + x).sum() * 1e-3
            return k + 1, x

        def cond(c):
            return c[0] < steps

        _, x = jax.lax.while_loop(cond, body, (0, row.sum() * 0.0))
        d = jnp.linalg.norm(row[:, None] - row[None, :], axis=-1)
        return x + jnp.sort(d.ravel())[: 8].sum()

    fn = jax.jit(jax.vmap(per_row))
    arg = jnp.asarray(np.random.RandomState(i).rand(16, n))
    return fn, arg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=200)
    ap.add_argument(
        "--cache-dir", default="/tmp/pywindow_flake_cache"
    )
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if not args.no_cache:
        pathlib.Path(args.cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    n_cached = (
        len(list(pathlib.Path(args.cache_dir).glob("*")))
        if not args.no_cache and pathlib.Path(args.cache_dir).exists()
        else 0
    )
    leg = (
        "control (cache off)"
        if args.no_cache
        else ("warm/deserialize" if n_cached else "cold/serialize")
    )
    print(
        f"leg: {leg}; compiling {args.programs} distinct programs "
        f"({n_cached} entries already cached)",
        flush=True,
    )
    for i in range(args.programs):
        fn, arg = build_program(i)
        np.asarray(fn(arg))  # compile + run + (de)serialize
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{args.programs} ok", flush=True)
    print("survived: no crash this run (the failure is probabilistic)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
