"""A/B probe: e2e sweep variants on the synthesized 21600-frame CC3
trajectory, interleaved in ONE process so tunnel-bandwidth swings hit
every variant equally.

Variants: (batch_size, ladder) pairs from the CLI, default
  4320/ladder, 4320/plain, 8640/ladder, 8640/plain
run round-robin for N rounds; prints per-rep seconds and the best per
variant.  Usage: python scripts/probe_e2e_ab.py [rounds]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
os.environ["PYWINDOW_TPU_FORCE_F32"] = "1"

REPO = pathlib.Path(__file__).resolve().parent.parent
N_FRAMES = 21600
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    import pywindow_tpu as pw

    sys.path.insert(0, str(REPO))
    from bench import synth_history

    path = synth_history(N_FRAMES)
    variants = [(4320, True), (4320, False), (8640, True), (8640, False)]
    times = {v: [] for v in variants}

    # warm every shape first (compiles / cache loads)
    for b, ladder in variants:
        os.environ["PYWINDOW_TPU_SWEEP_LADDER"] = "1" if ladder else "0"
        t0 = time.perf_counter()
        traj = pw.DLPOLY(path)
        traj.analysis_batched(
            frames=list(range(2 * b if ladder else b)),
            swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=b,
        )
        print(
            f"warm B={b} ladder={ladder}: "
            f"{time.perf_counter()-t0:.1f}s", flush=True,
        )

    for r in range(ROUNDS):
        for v in variants:
            b, ladder = v
            os.environ["PYWINDOW_TPU_SWEEP_LADDER"] = (
                "1" if ladder else "0"
            )
            t0 = time.perf_counter()
            traj = pw.DLPOLY(path)
            traj.analysis_batched(
                swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=b,
            )
            dt = time.perf_counter() - t0
            assert len(traj.analysis_output) == N_FRAMES
            times[v].append(dt)
            print(
                f"round {r} B={b} ladder={int(ladder)}: {dt:.2f}s "
                f"({N_FRAMES/dt:.0f} f/s)", flush=True,
            )

    print("\nbest per variant:")
    for v, ts in times.items():
        print(
            f"  B={v[0]} ladder={int(v[1])}: best {min(ts):.2f}s "
            f"({N_FRAMES/min(ts):.0f} f/s)  all={[f'{t:.2f}' for t in ts]}"
        )


if __name__ == "__main__":
    main()
