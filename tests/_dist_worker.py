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
    from pywindow_tpu.parallel import distributed

    distributed.initialize(f"127.0.0.1:{port}", int(nprocs), int(pid))
    assert jax.process_count() == int(nprocs)

    import pywindow_tpu as pw

    traj = pw.DLPOLY(history)
    distributed.analysis_batched_distributed(
        traj, swap_atoms={"he": "H"}, forcefield="OPLS"
    )
    assert len(traj.analysis_output) == traj.no_of_frames
    traj.save_analysis(out_json, override=True)
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
