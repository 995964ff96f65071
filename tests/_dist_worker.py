"""Worker process for the 2-process distributed sweep test.

Usage: python _dist_worker.py <pid> <nprocs> <port> <history> <out_json>
Each worker bootstraps jax.distributed over localhost, decodes only its
frame shard, analyses it, and (thanks to the trailing all-gather) holds
results for EVERY frame — dumped to out_json for the parent to compare.
"""

import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
_CACHE = pathlib.Path(__file__).parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main() -> None:
    pid, nprocs, port, history, out_json = sys.argv[1:6]
    # optional 6th arg: analyse only the first K frames ("all" default)
    # — exercises shard counts that do not divide by the process count
    n_frames = sys.argv[6] if len(sys.argv) > 6 else "all"
    from pywindow_tpu.parallel import distributed

    distributed.initialize(f"127.0.0.1:{port}", int(nprocs), int(pid))
    assert jax.process_count() == int(nprocs)

    import pywindow_tpu as pw

    traj = pw.DLPOLY(history)
    frames = "all" if n_frames == "all" else list(range(int(n_frames)))
    distributed.analysis_batched_distributed(
        traj, frames=frames, swap_atoms={"he": "H"}, forcefield="OPLS"
    )
    expected = (
        traj.no_of_frames if n_frames == "all" else int(n_frames)
    )
    assert sorted(traj.analysis_output) == list(range(expected))
    traj.save_analysis(out_json, override=True)
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
