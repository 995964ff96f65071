"""Ad-hoc probe: per-phase cost split of one sweep chunk at B=4320.

Times, each with explicit synchronisation (serially, no overlap):
  assembly   host buf copy of one chunk's coordinates
  upload     jnp.asarray(buf) -> device, synced via a tiny reduction fetch
  compute    warm fn(mols) dispatch -> full result fetch (the kernel rep)
  fetch      np.asarray of an already-computed result array
  convert    to_properties_dicts_bulk on the fetched array

Then runs the REAL pipelined sweep loop (sweep_uniform) on 5 chunks and
prints per-chunk wall, so the serial costs can be compared with the
overlapped wall to see what fails to hide.
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

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4320


def main():
    import pywindow_tpu as pw
    from pywindow_tpu.config import DEFAULT_CONFIG, default_dtype, pad_multiple
    from pywindow_tpu.ops.analysis import static_sizes, to_properties_dicts_bulk
    from pywindow_tpu.ops.encoding import FAR_AWAY, MolArrays, _encode_host, round_up
    from pywindow_tpu.parallel.batch import _compiled_batch_analysis

    sys.path.insert(0, str(REPO))
    from bench import synth_history

    n_frames = 5 * B
    path = synth_history(21600)
    t0 = time.perf_counter()
    traj = pw.DLPOLY(path)
    t_map = time.perf_counter() - t0
    t0 = time.perf_counter()
    el, co, maxd_pf = traj._sweep_decode_native(
        list(range(n_frames)), {"he": "H"}, "OPLS"
    )
    t_decode = time.perf_counter() - t0
    print(f"map {t_map:.2f}s decode({n_frames}) {t_decode:.2f}s")

    dtype = np.dtype(default_dtype())
    n = co.shape[1]
    n_pad = round_up(n, pad_multiple())
    ref = float(np.max(maxd_pf))
    n_win, n_avg, l1, l2 = static_sizes(ref, DEFAULT_CONFIG)
    _, mass, vdw, cov, mask = _encode_host(el, np.zeros((n, 3)), n_pad, dtype)
    fields_dev = tuple(
        jax.numpy.asarray(np.broadcast_to(row, (B, n_pad)))
        for row in (mass, vdw, cov, mask)
    )
    fn = _compiled_batch_analysis(n_win, n_avg, l1, l2, DEFAULT_CONFIG)
    pad_cols = n_pad - n

    @jax.jit
    def _pad_dev(tight):
        return jax.numpy.pad(
            tight, ((0, 0), (0, pad_cols), (0, 0)),
            constant_values=np.asarray(FAR_AWAY, dtype),
        )

    coords_t = np.ascontiguousarray(co, dtype=dtype)

    # warm everything once
    buf = np.empty((B, n, 3), dtype=dtype)
    buf[:] = coords_t[:B]
    mols = MolArrays(_pad_dev(jax.numpy.asarray(buf)), *fields_dev)
    flat = fn(mols)
    _ = np.asarray(flat)

    # --- serial phase timings -----------------------------------------
    t0 = time.perf_counter()
    buf[:] = coords_t[B : 2 * B]
    t_asm = time.perf_counter() - t0

    t0 = time.perf_counter()
    dev = jax.numpy.asarray(buf)
    # sync the transfer: fetch a scalar derived from the device array
    _ = float(dev[0, 0, 0])
    t_up = time.perf_counter() - t0

    t0 = time.perf_counter()
    mols = MolArrays(_pad_dev(dev), *fields_dev)
    flat = fn(mols)
    out = np.asarray(flat)
    t_comp = time.perf_counter() - t0

    # fetch-only: recompute then fetch separately (enqueue returns fast;
    # the final np.asarray includes remaining compute + transfer, so do
    # a second rep where we sleep past compute first)
    flat = fn(mols)
    time.sleep(t_comp)  # let compute drain (axon has no usable block)
    t0 = time.perf_counter()
    out = np.asarray(flat)
    t_fetch = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = to_properties_dicts_bulk(out, DEFAULT_CONFIG.max_windows)
    t_conv = time.perf_counter() - t0

    up_mb = buf.nbytes / 1e6
    down_mb = out.nbytes / 1e6
    print(
        f"serial split (B={B}): asm {t_asm*1e3:.0f} ms | "
        f"upload {t_up*1e3:.0f} ms ({up_mb:.1f} MB) | "
        f"dispatch+compute+fetch {t_comp*1e3:.0f} ms | "
        f"fetch-after-drain {t_fetch*1e3:.0f} ms ({down_mb:.1f} MB) | "
        f"convert {t_conv*1e3:.0f} ms"
    )

    # --- real pipelined sweep ------------------------------------------
    from pywindow_tpu.parallel.batch import sweep_uniform

    walls = []
    marks = {"t": time.perf_counter()}

    def on_batch(part, results):
        now = time.perf_counter()
        walls.append(now - marks["t"])
        marks["t"] = now

    t0 = time.perf_counter()
    sweep_uniform(
        el, co[:n_frames], maxd_pf[:n_frames], on_batch,
        batch_size=B, reference_max_diameter=ref,
    )
    total = time.perf_counter() - t0
    print(
        f"pipelined sweep: {total:.2f}s = {n_frames/total:.0f} f/s; "
        f"per-chunk walls: {[f'{w:.2f}' for w in walls]}"
    )


if __name__ == "__main__":
    main()
