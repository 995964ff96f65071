"""Ad-hoc probe: honest end-to-end 10k-frame sweep timing + host split.

Synthesizes a 10k-frame HISTORY from the 20-frame fixture, runs
``DLPOLY.analysis_batched`` and reports wall time plus a coarse
breakdown (decode/prepare vs dispatch vs collect) via monkey-timing.
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

REPO = pathlib.Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "data" / "HISTORY_singlemol_short"


def synth_history(n_frames: int) -> pathlib.Path:
    out = pathlib.Path("/tmp") / f"HISTORY_synth_{n_frames}"
    if out.exists():
        return out
    text = FIXTURE.read_text()
    lines = text.split("\n")
    # header = first 2 lines; frames delimited by 'timestep' lines
    starts = [i for i, ln in enumerate(lines) if ln.startswith("timestep")]
    header = "\n".join(lines[: starts[0]]) + "\n"
    frames = []
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else len(lines)
        frames.append("\n".join(lines[s:e]).rstrip("\n") + "\n")
    with out.open("w") as fh:
        fh.write(header)
        ts = 0
        for k in range(n_frames):
            fr = frames[k % len(frames)]
            head, _, body = fr.partition("\n")
            parts = head.split()
            parts[1] = str(ts)
            ts += 25
            fh.write(" ".join(parts) + "\n" + body)
    return out


def main(n_frames=10000, batch_size=1440):
    import pywindow_tpu as pw

    path = synth_history(n_frames)
    t0 = time.perf_counter()
    traj = pw.DLPOLY(path)
    t_map = time.perf_counter() - t0
    print(f"map+check: {t_map:.2f}s  frames={traj.no_of_frames}")

    t0 = time.perf_counter()
    traj.analysis_batched(
        swap_atoms={"he": "H"},
        forcefield="OPLS",
        batch_size=batch_size,
    )
    dt = time.perf_counter() - t0
    n = traj.no_of_frames
    print(
        f"analysis_batched: {dt:.2f}s  {n / dt:.0f} f/s "
        f"(incl. map: {n / (dt + t_map):.0f} f/s)"
    )
    d = traj.analysis_output[0]["0"]
    print("frame0 pore:", d["pore_diameter"]["diameter"], "windows:",
          d["windows"]["diameters"])


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=1440)
    args = ap.parse_args()
    main(args.frames, args.batch)
