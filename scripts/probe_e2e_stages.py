"""Instrumented bench-e2e rep: where does the wall go?

Runs the exact measure_e2e workload (synth 21600-frame CC3 HISTORY,
analysis_batched at B=4320) with PYWINDOW_TPU_PROFILE=1 and prints the
per-stage host timers plus the phase wall-clock split of one timed rep
(map / decode handled inside the sweep; this times the whole call).
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("PYWINDOW_TPU_PROFILE", "1")
os.environ.setdefault("PYWINDOW_TPU_FORCE_F32", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4320
N_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 21600
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def main():
    import pywindow_tpu as pw
    from bench import synth_history
    from pywindow_tpu.profiling import METRICS

    path = synth_history(N_FRAMES)

    # warm (compile + tunnel)
    t0 = time.perf_counter()
    warm = pw.DLPOLY(path)
    warm.analysis_batched(
        frames=list(range(B)),
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=B,
    )
    print(f"warmup {time.perf_counter()-t0:.2f}s")

    for rep in range(REPS):
        METRICS.stage_seconds.clear()
        METRICS.stage_calls.clear()
        t0 = time.perf_counter()
        traj = pw.DLPOLY(path)
        t_map = time.perf_counter()
        traj.analysis_batched(
            swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=B
        )
        total = time.perf_counter() - t0
        print(
            f"rep {rep}: total {total:.2f}s = {N_FRAMES/total:.0f} f/s  "
            f"(map {t_map-t0:.2f}s)"
        )
        for name, secs in sorted(
            METRICS.stage_seconds.items(), key=lambda kv: -kv[1]
        ):
            print(
                f"   {name:<22} {secs*1e3:8.0f} ms  "
                f"x{METRICS.stage_calls[name]}"
            )


if __name__ == "__main__":
    main()
