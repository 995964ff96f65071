"""Standalone repro attempt for the full-suite XLA scale crash.

THE BUG (bisected 2026-08-18, extended 2026-08-21; see
.claude/skills/verify/SKILL.md and tests/conftest.py): one process
that accumulates ~200 compiled XLA programs can die with a fatal
signal (``Fatal Python error: Segmentation fault`` / ``Aborted``).
Observed crash sites, all deep in jax/XLA:

* ``put_executable_and_time`` (persistent-cache serialize, cold dirs);
* the executable deserialize path (warm cache dirs);
* 2026-08-21: ``compiler.py backend_compile_and_load`` itself with the
  persistent cache DISABLED (full suite, cache off via the conftest
  mitigation, segfault at ~95% inside test_windows) — so the cache is
  an aggravator, not the root cause, and disabling it does NOT make
  one-process full runs safe.

Every pytest file passes standalone and each suite third/half passes;
only the accumulated scale triggers it, which points at jax/XLA, not
repo code.  ``scripts/run_suite.py`` is the deterministic-green
wrapper (sharded subprocesses).

This script reproduces the scale WITHOUT pytest: it compiles
``--programs`` distinct programs (default 200) shaped like the suite's
window pipelines (vmapped while-loops + reductions over distinct
static shapes, so each is a separate nontrivial executable), with the
persistent cache pointed at ``--cache-dir`` or disabled.

Usage:
    python scripts/repro_cache_flake.py                # cold serialize leg
    python scripts/repro_cache_flake.py                # warm deserialize leg
    python scripts/repro_cache_flake.py --no-cache     # pure-compile leg

Exit code 0 = survived (no repro this run); a crash kills the process
with the XLA fatal-signal banner.  The crash is probabilistic at this
scale — the suite needs the full ~200-program load to hit it at all —
so run each leg several times before concluding anything.  Keep
``--cache-dir`` OFF the repo tree so repo test runs are unaffected.

Observed while running the warm leg (2026-08-21): XLA's
``cpu_aot_loader`` warns that cached AOT results carry a
``+prefer-no-gather`` target feature "not supported on the host" and
"could lead to execution errors such as SIGILL".  That flag is an
XLA-internal pseudo-feature (the real ISA feature lists match), so
the warning is probably benign noise — but it demonstrates the cache
deserialize path executing machine-feature validation at all, which
is consistent with the crash living in (de)serialised-executable
handling.  200/200 programs survived both legs on this host.
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
