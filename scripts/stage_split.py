"""Ad-hoc probe: per-stage device time of the batched pipeline.

Times each stage of the fused analysis separately (own jit, fetch-sync
on a reduced scalar so tunnel transfer stays constant) at a production
batch size, attributing the warm-rep milliseconds that the XLA trace
only shows as anonymous ``while``/``fusion`` ops.  Overhead (dispatch +
scalar fetch round-trip) is measured with a no-op and subtracted.

Usage: python scripts/stage_split.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYWINDOW_TPU_FORCE_F32", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

import pywindow_tpu as pw
from pywindow_tpu.config import DEFAULT_CONFIG
from pywindow_tpu.ops import rays
from pywindow_tpu.ops.analysis import (
    full_analysis_device,
    optimise_pore_centre_res,
    pack_results,
    static_sizes,
)
from pywindow_tpu.ops.cluster import dbscan
from pywindow_tpu.ops.encoding import encode_batch
from pywindow_tpu.ops.geometry import center_of_mass, max_dim, pore_diameter
from pywindow_tpu.ops.windows import find_windows, open_cap

HISTORY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "HISTORY_singlemol_short",
)


def timeit(label, fn, *args, reps=5, sink=None, quiet=False):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    # roofline accounting: XLA's flop/byte counts over the measured
    # rep time vs the v5e peaks (see bench._roofline for the peaks'
    # provenance).  Pallas kernels are opaque to the cost model (their
    # flops do not appear), so rows dominated by a fused kernel report
    # the jnp-visible portion only — noted per row as "jnp-visible".
    note = ""
    roof = None
    try:
        import bench as _bench

        roof = _bench._roofline(fn.lower(*args).compile(), dt)
        if roof:
            note = (
                f"  [{roof.get('pct_hbm_roofline', 0):5.1f}% HBM, "
                f"{roof.get('pct_vpu_f32_roofline', 0):5.1f}% VPU-f32 "
                f"(jnp-visible)]"
            )
    except Exception:
        pass
    if not quiet:
        print(f"{label:34s} {dt*1e3:8.1f} ms{note}")
    if sink is not None:
        sink.append({"stage": label, "ms": round(dt * 1e3, 1),
                     **(roof or {})})
    return dt


def run(batch=4320, reps=5, quiet=False):
    """Time every pipeline stage at ``batch``; returns the row dicts
    (stage, ms, roofline fractions).  Used by the CLI below and by
    ``bench.py`` for the per-kernel roofline record."""
    rows: list[dict] = []
    cfg = DEFAULT_CONFIG
    traj = pw.DLPOLY(HISTORY)
    el, co, maxd_pf = traj._sweep_decode_native(
        list(range(traj.no_of_frames)), {"he": "H"}, "OPLS"
    )
    maxd = float(max(maxd_pf))
    n_win, n_avg, l1, l2 = static_sizes(maxd, cfg)
    if not quiet:
        print(f"B={batch} P_win={n_win} P_avg={n_avg} l1={l1} l2={l2} "
              f"K={open_cap(n_win, cfg.open_cap_frac)}")
    mols = encode_batch([(el, co[i % len(co)]) for i in range(batch)])

    def timeit(label, fn, *args):
        return globals()["timeit"](
            label, fn, *args, reps=reps, sink=rows, quiet=quiet
        )

    # overhead: dispatch + scalar fetch round trip
    noop = jax.jit(lambda m: jnp.sum(m.coords[:, 0, 0]))
    ovh = timeit("noop (dispatch+fetch overhead)", noop, mols)

    def red(fn):
        """jit a stage reduced to one scalar (constant fetch cost)."""
        return jax.jit(
            lambda *a: jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
                fn(*a),
                jnp.float32(0),
            )
        )

    vb = lambda f: jax.vmap(f)  # noqa: E731

    timeit("full step (pack_results)", jax.jit(vb(
        lambda m: pack_results(full_analysis_device(
            m, n_win, n_avg, l1, l2, cfg)))), mols)

    # PRODUCTION step: the exact compiled program the sweep dispatches
    # (Pallas pore routing on TPU, full packed-result fetch) — the row
    # the ledger's kernel f/s derives from.
    from pywindow_tpu.parallel.batch import _compiled_batch_analysis

    timeit("PRODUCTION step (routed, full fetch)",
           _compiled_batch_analysis(n_win, n_avg, l1, l2, cfg), mols)

    from pywindow_tpu.ops.analysis import route_pore_stage

    if route_pore_stage(cfg):
        from pywindow_tpu.config import effective_budgets
        from pywindow_tpu.ops.lbfgsb_pallas import pore_centres_pallas

        opt_maxiter, _ = effective_budgets(cfg)
        timeit("pore_centres_pallas (production)", jax.jit(
            lambda m: pore_centres_pallas(m, opt_maxiter)[0]), mols)

    timeit("pore_opt stable (jnp driver)", red(vb(
        lambda m: optimise_pore_centre_res(m, cfg))), mols)

    timeit("max_dim + pore_diameter + com", red(vb(
        lambda m: (max_dim(m)[2], pore_diameter(m)[0],
                   center_of_mass(m)))), mols)

    timeit("average_diameter", red(vb(
        lambda m: rays.average_diameter(m, n_avg, max_dim(m)[2]))), mols)

    def pre_and_centre(m):
        centre, _ = optimise_pore_centre_res(m, cfg)
        shifted = m._replace(coords=m.coords - centre[None, :])
        return shifted

    def preanalysis(m):
        shifted = pre_and_centre(m)
        _, _, md = max_dim(shifted)
        points = rays.golden_spiral(n_win, md / 2.0, dtype=m.coords.dtype)
        return rays.preanalysis_open(points, shifted)

    t_pre = timeit("pore_opt + preanalysis_open", red(vb(preanalysis)),
                   mols)

    def coarse(m):
        shifted = pre_and_centre(m)
        _, _, md = max_dim(shifted)
        radius = md / 2.0
        points = rays.golden_spiral(n_win, radius, dtype=m.coords.dtype)
        open_pre = rays.preanalysis_open(points, shifted)
        kcap = open_cap(n_win, cfg.open_cap_frac)
        pos = jnp.cumsum(open_pre.astype(jnp.int32)) - 1
        slot = jnp.arange(kcap, dtype=jnp.int32)
        onehot = (pos[None, :] == slot[:, None]) & open_pre[None, :]
        cpoints = jnp.matmul(onehot.astype(m.coords.dtype), points,
                             precision=jax.lax.Precision.HIGHEST)
        path = rays.path_analysis(cpoints, shifted, cfg.increment, l1)
        return cpoints, path, radius, open_pre

    timeit("... + compaction + coarse path", red(vb(
        lambda m: coarse(m)[1].width)), mols)

    def through_dbscan(m):
        cpoints, path, radius, open_pre = coarse(m)
        kcap = open_cap(n_win, cfg.open_cap_frac)
        n_open = jnp.sum(open_pre.astype(jnp.int32))
        slot_valid = jnp.arange(kcap, dtype=jnp.int32) < jnp.minimum(
            n_open, kcap)
        survives = slot_valid & path.ok
        eps = rays.mean_knn_eps_scaled(n_win, radius)
        labels, n_clusters = dbscan(
            cpoints, survives, eps,
            min_samples=cfg.dbscan_min_samples,
            max_clusters=cfg.max_windows)
        return labels

    timeit("... + dbscan", red(vb(through_dbscan)), mols)

    timeit("find_windows (full)", red(vb(
        lambda m: find_windows(m, n_win, l1, l2, cfg).diameters)), mols)

    if not quiet:
        print(f"(overhead {ovh*1e3:.1f} ms included in each row)")
    return rows


def main():
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 4320)


if __name__ == "__main__":
    main()
