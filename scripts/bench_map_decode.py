"""Isolated host map/decode timings on the 21600-frame synth HISTORY.

Times (best of N) the native map pass and the whole-sweep native slab
decode, independent of the device — the two structural host costs on
the e2e critical path.  Run alone: the single host vCPU's scheduler
stalls inflate anything measured under load.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 21600
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import bench as b  # repo-root bench for synth_history
    import pywindow_tpu as pw
    from pywindow_tpu import native

    path = b.synth_history(n)
    size_mb = path.stat().st_size / 1e6

    # --- map ---
    buf = np.fromfile(path, dtype=np.uint8)
    cap = max(1024, buf.size // 1024)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        got = native.map_history(buf, cap)
        ts.append(time.perf_counter() - t0)
    starts, ends, header_end, warn = got
    mt = min(ts)
    print(
        f"map: {mt*1e3:.1f} ms best-of-{reps} ({size_mb:.0f} MB, "
        f"{size_mb/1e3/mt:.2f} GB/s, {mt/n*1e6:.2f} us/frame) "
        f"frames={len(starts)}"
    )
    chk = (int(starts.sum()), int(ends.sum()), int(header_end), int(warn))
    print(f"map checksum: {chk}")

    # --- whole-sweep slab decode (DLPOLY object owns the mmap) ---
    traj = pw.DLPOLY(path)
    frames = list(range(traj.no_of_frames))
    ts = []
    for _ in range(reps):
        opened = traj._sweep_open_native(frames, {"he": "H"}, "OPLS")
        elements, decode_slab, close = opened
        t0 = time.perf_counter()
        xyz, maxd = decode_slab(0, len(frames))
        ts.append(time.perf_counter() - t0)
        close()
    dt = min(ts)
    print(
        f"decode: {dt*1e3:.1f} ms best-of-{reps} "
        f"({size_mb/1e3/dt:.2f} GB/s, {dt/n*1e6:.2f} us/frame)"
    )
    print(
        "decode checksum:",
        float(np.sum(xyz[:: max(1, n // 64)])),
        float(np.sum(maxd)),
    )


if __name__ == "__main__":
    main()
