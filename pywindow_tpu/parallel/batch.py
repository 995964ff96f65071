"""Batched full-analysis over many frames/molecules, sharded over devices.

This is the TPU-native replacement for the reference's process pools:
a (B, N) padded batch of molecules runs the complete analysis pipeline
as one ``vmap``-ed, device-sharded jit.  Throughput scales with both the
batch axis (pipeline parallelism inside a chip) and the mesh axis
(frames sharded across chips over ICI).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pywindow_tpu.config import DEFAULT_CONFIG, AnalysisConfig
from pywindow_tpu.ops.analysis import (
    full_analysis_device,
    max_dim_bound,
    pack_results,
    static_sizes,
    to_properties_dicts_bulk,
)
from pywindow_tpu.ops.encoding import MolArrays, encode_batch
from pywindow_tpu.parallel.mesh import (
    batch_sharding,
    frame_mesh,
    host_batch_sharding,
    host_device_mesh,
    pad_batch_to_devices,
)


def _make_batched(n_win, n_avg, l1, l2, cfg, allow_pallas_pore=True):
    """The (B,)-batched full-analysis callable shared by the jit
    wrappers below.

    With ``allow_pallas_pore`` (TPU production path, unsharded) the
    pore-centre stage runs the fused Pallas optimiser kernel over the
    WHOLE batch (a pallas_call does not auto-partition, so sharded
    meshes pass False and keep the vmapped jnp driver), then the rest
    of the pipeline vmaps as usual with the centres injected per
    molecule.
    """

    def fn(mol, pore_centre=None, pore_capped=None):
        return pack_results(
            full_analysis_device(
                mol,
                n_points_windows=n_win,
                n_points_avg=n_avg,
                l1=l1,
                l2=l2,
                cfg=cfg,
                pore_centre=pore_centre,
                pore_capped=pore_capped,
            )
        )

    from pywindow_tpu.ops.analysis import route_pore_stage

    if allow_pallas_pore and route_pore_stage(cfg):
        from pywindow_tpu.config import effective_budgets
        from pywindow_tpu.ops.lbfgsb_pallas import pore_centres_pallas

        opt_maxiter, _ = effective_budgets(cfg)

        def batched(mols):
            centres, capped = pore_centres_pallas(mols, opt_maxiter)
            return jax.vmap(fn)(mols, centres, capped)

        return batched
    return jax.vmap(fn)


@functools.lru_cache(maxsize=32)
def _compiled_batch_analysis(n_win, n_avg, l1, l2, cfg, mesh_key=None):
    """mesh_key: None (unsharded), "frames" (1-D device mesh),
    ("hosts", n_hosts) for the single-process hosts x frames grid, or
    ("procs", mesh, sharding) for a real multi-process mesh built by
    :mod:`pywindow_tpu.parallel.distributed` (Mesh/NamedSharding are
    hashable, so the compiled program is still memoised per mesh)."""
    batched = _make_batched(
        n_win, n_avg, l1, l2, cfg, allow_pallas_pore=mesh_key is None
    )
    if mesh_key is None:
        return jax.jit(batched)
    if isinstance(mesh_key, tuple) and mesh_key[0] == "procs":
        sharding = mesh_key[2]
    elif isinstance(mesh_key, tuple) and mesh_key[0] == "hosts":
        mesh = host_device_mesh(n_hosts=mesh_key[1])
        sharding = host_batch_sharding(mesh)
    else:
        mesh = frame_mesh()
        sharding = batch_sharding(mesh)
    shardings = MolArrays(
        coords=sharding, mass=sharding, vdw=sharding, cov=sharding,
        mask=sharding,
    )
    out_shardings = sharding if (
        isinstance(mesh_key, tuple) and mesh_key[0] == "procs"
    ) else None
    if out_shardings is not None:
        return jax.jit(
            batched,
            in_shardings=(shardings,),
            out_shardings=out_shardings,
        )
    return jax.jit(batched, in_shardings=(shardings,))


@functools.lru_cache(maxsize=32)
def _compiled_sweep_step(n_win, n_avg, l1, l2, cfg, pad_cols, mesh_key=None):
    """ONE-dispatch sweep step: tight ``(c, n, 3)`` coordinates in,
    packed results out.

    The device-side atom padding (same FAR_AWAY constant as the host
    encode — bitwise-identical pipeline input) and the MolArrays
    assembly happen INSIDE the jit: a sweep chunk then costs a single
    execute round-trip where the separate pad jit + analysis jit cost
    two (measured ~27 ms of latency per call over the tunneled TPU,
    ~147 ms/chunk of sweep_dispatch at B=4320 before the fusion).
    """
    from pywindow_tpu.ops.encoding import FAR_AWAY

    batched = _make_batched(
        n_win, n_avg, l1, l2, cfg, allow_pallas_pore=mesh_key is None
    )

    def stepf(tight, mass, vdw, cov, mask):
        coords = jnp.pad(
            tight,
            ((0, 0), (0, pad_cols), (0, 0)),
            constant_values=np.asarray(FAR_AWAY, tight.dtype),
        )
        return batched(MolArrays(coords, mass, vdw, cov, mask))

    if mesh_key is None:
        return jax.jit(stepf)
    if isinstance(mesh_key, tuple) and mesh_key[0] == "hosts":
        mesh = host_device_mesh(n_hosts=mesh_key[1])
        sharding = host_batch_sharding(mesh)
    else:
        mesh = frame_mesh()
        sharding = batch_sharding(mesh)
    return jax.jit(stepf, in_shardings=(sharding,) * 5)


#: HBM working budget for auto-sizing (v5e has 15.75 GiB usable; leave
#: headroom for XLA workspace and the programs themselves).
HBM_BUDGET_BYTES = int(14 * 1024**3)

#: Sweep chunks dispatched ahead of the one being fetched.  Two keeps
#: the tunnel streaming chunk k+2's coordinates while chunk k+1
#: computes and chunk k's results come back; THREE adds one chunk of
#: slack so a host scheduling stall or tunnel hiccup in the collector
#: does not starve the device (A/B on the real TPU, 21600 CC3 frames
#: at B=4320: depth 2 best-of-3 8.9-9.6k f/s, depth 3 9.6-10.7k,
#: depth 4 worse — with 5-chunk sweeps it defers all collection to the
#: drain).  Inputs/outputs of queued chunks are small (~10 MB each)
#: next to the executing chunk's temps.
_PIPELINE_DEPTH = 3

#: Learned sticky cap escalations per (system hash, padded atoms, base
#: config) — see the sticky-escalation block in :func:`_sweep_frames`.
_LEARNED_CAPS: dict = {}


def max_safe_batch(
    n_atoms: int,
    max_diameter: float,
    cfg: AnalysisConfig = DEFAULT_CONFIG,
    hbm_budget: int = HBM_BUDGET_BYTES,
) -> int:
    """Largest batch that keeps the pipeline's HBM temps in budget.

    With the ray sweeps fused into Pallas kernels (no (B, P*L, N)
    products), the brute-grid gather fixed, and the open-ray compaction
    shrinking the clustering to K = open_cap(P) slots, the per-frame
    temp model is the compacted DBSCAN buffers + the (K, P) one-hot
    compaction matrix + the window refinement's live (W, L2, N_pad)
    sets:

        per_frame ~ 4 bytes * (0.6 * K^2 + 0.4 * K * P
                               + 0.95 * W * L2 * N_pad)

    (recalibrated round 4, after the fused Pallas optimiser kernels
    halved the refinement temps, against ``compiled.memory_analysis()``
    temp sizes: CC3 measured 1.494 MB/frame vs model 1.72 (cap 8744 at
    the 14 GiB budget; B=8640 measured 12.89 GiB temps on-device);
    MIBQAR/REYMAL measured 3.19 MB/frame vs model 3.64 — a ~15%
    safety margin on both shapes.)
    """
    from pywindow_tpu.config import pad_multiple
    from pywindow_tpu.ops.encoding import round_up
    from pywindow_tpu.ops.windows import open_cap

    n_pad = round_up(max(n_atoms, 1), pad_multiple())
    n_win, _, _, l2 = static_sizes(max_diameter, cfg)
    # open-ray compaction shrinks the DBSCAN buffers to the cap (plus
    # the (K, P) one-hot compaction matrix)
    k = open_cap(n_win, cfg.open_cap_frac) or n_win
    per_frame = 4.0 * (
        0.6 * k * k
        + 0.4 * k * n_win
        + 0.95 * cfg.max_windows * l2 * n_pad
    )
    return max(1, int(hbm_budget // max(int(per_frame), 1)))


def chunk_plan(
    n_frames: int,
    c: int,
    *,
    ladder: bool = False,
    n_dev: int = 1,
) -> list[tuple[int, int, int]]:
    """Sweep chunk plan: ``(lo, hi, compiled_shape)`` triples.

    Single-shape by default (every chunk padded to ``c``).  With the
    ladder (large chunks, multi-chunk sweeps), the sweep opens on a
    quarter-size starter chunk followed by a 3/4-size realign chunk,
    so every later boundary sits on a multiple of ``c``, and the tail
    closes on the smallest ladder shape that fits.  At most four
    compiled shapes per size tuple.

    The ladder is OFF by default: a same-process A/B on the real TPU
    (21600 CC3 frames, 2 rounds round-robin, 2026-08-19) measured it
    as a clear loss — B=4320 ladder 6350 f/s vs plain 8243 f/s, B=8640
    ladder 4936 vs plain 6218 — the extra (smaller) chunks add more
    per-chunk fixed cost than their earlier first-dispatch and
    tail-fit savings recover, and small batches underutilise the
    device.  Kept as an opt-in (``PYWINDOW_TPU_SWEEP_LADDER=1``) for
    sweeps with pathological tails (e.g. ``1.01 * c`` frames), where
    the tail fit dominates.
    """
    from pywindow_tpu.parallel.mesh import pad_batch_to_devices

    shapes = [c]
    if ladder and c >= 1024 and n_frames > c:
        q = c // 4
        if n_dev > 1:
            q = pad_batch_to_devices(q, n_dev)
        shapes = sorted({q, 2 * q, 3 * q, c})
    starter = shapes[0] if len(shapes) > 1 else 0

    def fit_shape(r: int) -> int:
        for s in shapes:
            if r <= s:
                return s
        return c

    plan: list[tuple[int, int, int]] = []
    lo = 0
    if starter:
        plan.append((0, starter, starter))
        lo = min(c, n_frames)
        if lo > starter:
            plan.append((starter, lo, fit_shape(lo - starter)))
    while lo < n_frames:
        hi = min(lo + c, n_frames)
        plan.append((lo, hi, fit_shape(hi - lo)))
        lo = hi
    return plan


@functools.lru_cache(maxsize=8)
def _jit_batch_maxd():
    from pywindow_tpu.ops.geometry import max_dim_value

    return jax.jit(
        lambda m: jnp.max(jax.vmap(max_dim_value)(m))
    )


def _largest_exact_maxd(systems, bounds) -> float:
    """Exact maximum diameter of the batch's largest member.

    Computed on device in encoded chunks: the host O(N^2) pairwise scan
    costs ~1.4 ms/frame and the descending-bound early exit never fires
    for same-size trajectory frames (the O(N) bound always exceeds the
    exact value), which silently turned trajectory sweeps into
    O(B * N^2) host work.  One batched device kernel replaces it.  On
    TPU the reduction runs in float32 — a sampling-size flip at an
    exact log10 integer boundary is possible but inside the documented
    batched-vs-serial contract (and CPU x64 parity mode is exact).
    """
    del bounds
    best = 0.0
    chunk = 2048
    for lo in range(0, len(systems), chunk):
        mols = encode_batch(systems[lo : lo + chunk])
        best = max(best, float(_jit_batch_maxd()(mols)))
    return best


def dispatch_batch(
    systems: list[tuple[np.ndarray, np.ndarray]],
    cfg: AnalysisConfig = DEFAULT_CONFIG,
    reference_max_diameter: float | None = None,
    shard: bool | None = None,
    pad_atoms: int | None = None,
    mesh_key: str | tuple | None = None,
    pad_batch_to: int | None = None,
):
    """Encode + asynchronously dispatch one batch; returns a handle.

    Dispatch returns before the device finishes, so the host can decode
    the next batch while this one computes (collect with
    :func:`collect_batch`).

    ``pad_batch_to``: pad the batch axis up to this size with copies of
    the first system (results sliced off on collect).  Sweeps use it to
    keep every chunk — including the final remainder — on ONE compiled
    shape: an odd-sized last chunk otherwise costs a fresh ~15 s XLA
    compile that dwarfs the sweep itself.
    """
    n_dev = len(jax.devices())
    if shard is None:
        shard = n_dev > 1
    b = len(systems)
    b_target = max(b, pad_batch_to or 0)
    b_pad = pad_batch_to_devices(b_target, n_dev) if shard else b_target
    padded = list(systems) + [systems[0]] * (b_pad - b)
    mols = encode_batch(padded, pad_to=pad_atoms)

    # static sizes must cover the LARGEST molecule in the batch: sizing
    # from systems[0] alone silently truncates ray paths and samples
    # bigger members too sparsely.
    bounds = [max_dim_bound(e, c) for e, c in systems]
    if reference_max_diameter is None:
        # device reduction over the already-encoded batch (see
        # _largest_exact_maxd for why not the host pairwise scan)
        reference_max_diameter = float(_jit_batch_maxd()(mols))
    n_win, n_avg, l1, l2 = static_sizes(reference_max_diameter, cfg)
    _, _, l1_b, l2_b = static_sizes(max(bounds), cfg)
    l1, l2 = max(l1, l1_b), max(l2, l2_b)
    if mesh_key is None:
        mesh_key = "frames"
    fn = _compiled_batch_analysis(
        n_win, n_avg, l1, l2, cfg, mesh_key=mesh_key if shard else None
    )
    return (fn(mols), b, cfg, reference_max_diameter)


def collect_batch(handle) -> list[dict]:
    """Fetch a dispatched batch and convert to properties dicts.

    The handle carries the config the batch was dispatched with, so the
    packed layout is always unpacked with the right window count (and
    the sampling pin the dispatch resolved, for escalation retries).
    """
    from pywindow_tpu.profiling import METRICS, stage

    flat_dev, b, cfg, _ref = handle
    with stage("sweep_fetch"):
        flat = np.asarray(flat_dev)  # ONE device->host transfer
    with stage("sweep_to_dicts"):
        results = to_properties_dicts_bulk(flat[:b], cfg.max_windows)
    METRICS.count("molecules_analysed", b)
    METRICS.count(
        "windows_found",
        sum(
            0
            if r["windows"]["diameters"] is None
            else len(r["windows"]["diameters"])
            for r in results
        ),
    )
    return results


def analyze_batch(
    systems: list[tuple[np.ndarray, np.ndarray]],
    cfg: AnalysisConfig = DEFAULT_CONFIG,
    reference_max_diameter: float | None = None,
    shard: bool | None = None,
    pad_atoms: int | None = None,
    mesh_key: str | tuple | None = None,
    pad_batch_to: int | None = None,
) -> list[dict]:
    """Analyse many (elements, coordinates) systems in one device sweep.

    The sampling-point count is a per-batch static derived from
    ``reference_max_diameter`` (default: the first system's maximum
    diameter).  For trajectory frames of one system this matches the
    reference's per-frame point count except at log-scale boundaries,
    where diameters may differ by ~1e-3 A; pass an explicit value to pin
    it.  Returns one reference-schema properties dict per system.
    """
    if not systems:
        return []
    import logging

    from pywindow_tpu.profiling import stage

    # memory guard: split into HBM-safe sub-batches (a 2048-atom system
    # exceeds a 16 GiB chip already at batch ~50).
    n_max = max(len(e) for e, _ in systems)
    bounds = [max_dim_bound(e, c) for e, c in systems]
    maxd = max(bounds)
    safe = max_safe_batch(n_max, maxd, cfg)
    if len(systems) > safe:
        # pin the sampling size for all sub-batches: results must not
        # depend on chunk boundaries, and one size = one compile.
        if reference_max_diameter is None:
            reference_max_diameter = _largest_exact_maxd(systems, bounds)
        logging.getLogger("pywindow_tpu").info(
            "splitting batch of %d into HBM-safe chunks of %d",
            len(systems),
            safe,
        )
        out: list[dict] = []
        for lo in range(0, len(systems), safe):
            out.extend(
                analyze_batch(
                    systems[lo : lo + safe],
                    cfg,
                    reference_max_diameter=reference_max_diameter,
                    shard=shard,
                    pad_atoms=pad_atoms,
                    mesh_key=mesh_key,
                    # remainder chunks reuse the full-chunk program
                    pad_batch_to=safe,
                )
            )
        return out

    with stage("batch_analysis"):
        handle = dispatch_batch(
            systems,
            cfg,
            reference_max_diameter=reference_max_diameter,
            shard=shard,
            pad_atoms=pad_atoms,
            mesh_key=mesh_key,
            pad_batch_to=pad_batch_to,
        )
        results = collect_batch(handle)
    # the retry reuses the sampling pin dispatch_batch resolved (not the
    # possibly-None caller value): the escalated subset must keep the
    # same sampling-point count as the rest of its sweep
    return retry_saturated_windows(
        systems,
        results,
        cfg,
        reference_max_diameter=handle[3],
        shard=shard,
        pad_atoms=pad_atoms,
        mesh_key=mesh_key,
    )


def sweep_uniform(
    elements: np.ndarray,
    coords: np.ndarray,
    maxd_per_frame: np.ndarray,
    on_batch,
    cfg: AnalysisConfig = DEFAULT_CONFIG,
    batch_size: int | None = None,
    reference_max_diameter: float | None = None,
    exact_sizes: bool = False,
) -> None:
    """Full-analysis sweep over frames sharing ONE element list.

    ``batch_size=None`` auto-sizes each group's chunk to the largest
    HBM-safe batch (``max_safe_batch``): the pipeline's while-loop
    latency chains amortise better at large B (measured +13% going
    1440 -> 4320 on CC3), so bigger is better until HBM runs out.

    The whole-sweep fast path behind ``Trajectory.analysis_batched``:
    ``coords`` is (F, N, 3) float64 (e.g. from the native batch
    decoder), ``maxd_per_frame`` the exact per-frame vdW-corrected
    maximum diameters (pins the sampling sizes without a second decode
    pass).  Because every frame shares the element list, the per-atom
    mass/vdW/covalent/mask arrays are transferred to the device ONCE and
    reused by every chunk; only the (B, N, 3) coordinates move per
    chunk.  Chunks are pipelined one deep (dispatch chunk k+1 while
    chunk k is fetched), and ``on_batch(frame_positions, results)`` is
    invoked as each chunk completes.

    ``exact_sizes``: bucket frames by their exact per-frame sampling
    sizes (same key as the generic pre-scan path) so results match the
    serial per-frame path bit-for-bit at log10 boundaries.
    """
    f_total, n, _ = coords.shape
    if f_total == 0:
        return

    if exact_sizes:
        buckets: dict = {}
        for i in range(f_total):
            n_win, n_avg, _, _ = static_sizes(
                float(maxd_per_frame[i]), cfg
            )
            entry = buckets.setdefault((n_win, n_avg), ([], 0.0))
            buckets[(n_win, n_avg)] = (
                entry[0] + [i],
                max(entry[1], float(maxd_per_frame[i])),
            )
        groups = [
            (np.asarray(idxs, dtype=np.int64), ref)
            for idxs, ref in buckets.values()
        ]
    else:
        ref = (
            float(reference_max_diameter)
            if reference_max_diameter is not None
            else float(np.max(maxd_per_frame))
        )
        groups = [(np.arange(f_total, dtype=np.int64), ref)]

    for idxs, ref in groups:
        # identity group over f64 frames (the whole-sweep fast path):
        # hand the caller's array to the pipeline as its f64 store
        # instead of copying all (F, N, 3) bytes again — the duplicate
        # doubled peak host memory against _SWEEP_DECODE_BUDGET.
        preloaded = (
            coords
            if (
                len(idxs) == f_total
                and coords.dtype == np.float64
                and not exact_sizes
            )
            else None
        )

        def decode_slab(lo, hi, idxs=idxs, preloaded=preloaded):
            if preloaded is not None:
                return None, maxd_per_frame[lo:hi]
            sel = idxs[lo:hi]
            return coords[sel], maxd_per_frame[sel]

        def group_on_batch(pos, results, idxs=idxs):
            on_batch(idxs[pos], results)

        _sweep_frames(
            elements,
            len(idxs),
            decode_slab,
            group_on_batch,
            cfg,
            batch_size,
            ref=ref,
            bound_maxd=float(np.max(maxd_per_frame[idxs])),
            preloaded_co64=preloaded,
        )


def sweep_stream(
    elements: np.ndarray,
    n_frames: int,
    decode_slab,
    on_batch,
    cfg: AnalysisConfig = DEFAULT_CONFIG,
    batch_size: int | None = None,
    reference_max_diameter: float | None = None,
    size_gate: dict | None = None,
) -> None:
    """Overlapped decode -> device sweep (frames share ONE element list).

    Unlike :func:`sweep_uniform` this does NOT need the frames decoded
    up front: ``decode_slab(lo, hi) -> (coords (k, N, 3) f64, maxd (k,))``
    decodes frame positions [lo, hi) on demand (a GIL-releasing native
    call), and the pipeline decodes slab k+1 on a prefetch thread while
    the device computes chunk k — the decode cost of a long trajectory
    (~1/3 of the previous end-to-end wall) hides behind device compute.

    The sampling-size pin comes from the largest max-diameter seen so
    far; if a later slab escalates the discrete sizes, the sweep
    restarts over the already-decoded frames with the new pin (results
    are re-delivered through ``on_batch``, overwriting).  Results are
    identical to the decode-everything-first path: the pin affects
    results ONLY through the discrete ``static_sizes`` tuple, and the
    final pass runs the same tuple the up-front maximum would give.

    ``size_gate``: optional dict whose ``"final"`` key the sweep keeps
    up to date — True exactly while a mid-stream size escalation can no
    longer occur (all frames decoded, current pass runs the final size
    tuple).  Callers use it to defer checkpoint writes: a checkpoint
    taken pre-escalation would mix results computed under a smaller
    ``static_sizes`` tuple into the resumed sweep.
    """
    _sweep_frames(
        elements,
        n_frames,
        decode_slab,
        on_batch,
        cfg,
        batch_size,
        ref=(
            float(reference_max_diameter)
            if reference_max_diameter is not None
            else None
        ),
        bound_maxd=None,
        size_gate=size_gate,
    )


def _sweep_frames(
    elements: np.ndarray,
    n_frames: int,
    decode_slab,
    on_batch,
    cfg: AnalysisConfig,
    batch_size: int | None,
    ref: float | None,
    bound_maxd: float | None,
    size_gate: dict | None = None,
    preloaded_co64: np.ndarray | None = None,
) -> None:
    """The chunked device pipeline shared by sweep_uniform/sweep_stream.

    ``ref``: the sampling pin, or None to pin from the running decoded
    maximum.  ``bound_maxd``: the known maximum frame diameter (sizes
    final, no escalation checks), or None to track the running maximum
    and restart when the discrete sizes grow (streaming mode).
    ``size_gate``: see :func:`sweep_stream`.  ``preloaded_co64``: the
    already-decoded (n_frames, N, 3) float64 frames — used directly as
    the sweep's f64 store (``decode_slab`` then only supplies the
    per-frame max diameters), avoiding a second full-size host copy.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pywindow_tpu import profiling
    from pywindow_tpu.config import default_dtype, pad_multiple
    from pywindow_tpu.ops.encoding import (
        _encode_host,
        round_up,
    )

    if n_frames == 0:
        return
    n = len(elements)
    dtype = np.dtype(default_dtype())
    n_pad = round_up(max(n, 1), pad_multiple())

    # constant per-atom fields: one host encode, one device transfer,
    # reused by every chunk
    _, mass, vdw, cov, mask = _encode_host(
        elements, np.zeros((n, 3)), n_pad, dtype
    )

    # decoded frames accumulate here in the pipeline dtype; a restart
    # never re-decodes.  The separate f64 store exists only when the
    # pipeline itself is f64 (x64 mode) or the frames were preloaded:
    # in f32 production mode the escalation retries re-encode from the
    # f32 store, which is the SAME value the pipeline would see from a
    # f64 source (f64 -> f32 rounds once, here or there), so keeping a
    # (F, N, 3) f64 block alive cost 2x the decode's memory writes for
    # nothing.
    direct_out = bool(getattr(decode_slab, "supports_out", False))
    f32_out = dtype == np.float32
    keep64 = preloaded_co64 is not None or not f32_out
    co64 = (
        preloaded_co64
        if preloaded_co64 is not None
        else (
            np.empty((n_frames, n, 3), dtype=np.float64)
            if keep64
            else None
        )
    )
    coords_t = np.empty((n_frames, n, 3), dtype=dtype)
    # the retry/restart coordinate source: f64 when we have it
    co_retry = co64 if keep64 else coords_t
    maxd_pf = np.empty(n_frames, dtype=np.float64)
    state = {"decoded": 0}

    def decode_into(hi: int) -> None:
        with profiling.stage("sweep_decode"):
            lo = state["decoded"]
            if direct_out:
                _, md = decode_slab(
                    lo, hi,
                    out64=co64[lo:hi] if keep64 else None,
                    out32=coords_t[lo:hi] if f32_out else None,
                )
                if not f32_out:
                    coords_t[lo:hi] = co64[lo:hi]
            else:
                co, md = decode_slab(lo, hi)
                if co is not None and keep64:
                    co64[lo:hi] = co
                coords_t[lo:hi] = (
                    co64[lo:hi] if co is None or keep64 else co
                )
            maxd_pf[lo:hi] = md
            state["decoded"] = hi

    n_dev = len(jax.devices())
    shard = n_dev > 1
    streaming = bound_maxd is None

    # sticky cap escalation: when MOST of a chunk outgrows a static cap
    # (open-ray compaction overflow or window-slot saturation — e.g.
    # every MIBQAR frame overflows the CC3-sized open cap), dispatching
    # later chunks at the escalated config directly replaces a
    # doubled-work serial retry on EVERY chunk (measured: the 424-atom
    # MIBQAR e2e sweep ran each 1200-frame chunk twice,
    # dispatch+collect serialised, 1.6k f/s vs a 10.2k f/s kernel).
    # Survives streaming restarts; per-frame budget escalations stay
    # per-chunk (full budgets would slow every vmapped lane).  The
    # learned caps are remembered per (system, base config) for the
    # life of the process — chunks already in the pipeline when the
    # first escalation lands still pay the per-chunk retry, so a NEW
    # sweep of the same system (a resume, the next trajectory segment)
    # should open directly at the learned caps, like a compile cache
    # for cap autotuning.
    esc_key = (hash(elements.tobytes()), n_pad, cfg)
    cfg_live = {"cfg": _LEARNED_CAPS.get(esc_key, cfg)}

    def current_sizes() -> tuple:
        run_max = (
            bound_maxd
            if bound_maxd is not None
            else float(np.max(maxd_pf[: state["decoded"]]))
        )
        pin = ref if ref is not None else run_max
        n_win, n_avg, l1, l2 = static_sizes(pin, cfg)
        # path lengths must cover the LARGEST member even when the
        # sampling pin is smaller (e.g. a caller-pinned reference):
        # sizing from the pin alone silently truncates ray paths.
        _, _, l1_b, l2_b = static_sizes(run_max, cfg)
        return pin, (n_win, n_avg, max(l1, l1_b), max(l2, l2_b))

    while True:  # streaming restarts when the discrete sizes escalate
        if state["decoded"] == 0:
            decode_into(min(n_frames, batch_size or 4320))
        pin, sizes = current_sizes()
        if size_gate is not None:
            # the size tuple is final once every frame is decoded; a
            # pass that starts earlier may still escalate, so callers
            # must not checkpoint its results yet
            size_gate["final"] = (
                not streaming or state["decoded"] == n_frames
            )
        n_win, n_avg, l1, l2 = sizes
        # an EXPLICIT batch_size is authoritative (the model keeps a
        # ~15% safety margin, so a caller-measured size one notch above
        # the model cap — e.g. CC3 at 8640, 12.9 GiB measured temps —
        # must not be silently shrunk into a padded extra chunk); the
        # model only sizes the auto (None) case.
        c = (
            max_safe_batch(n_pad, pin, cfg)
            if batch_size is None
            else int(batch_size)
        )
        c = max(1, min(c, n_frames))
        if shard:
            c = pad_batch_to_devices(c, n_dev)

        # chunk plan (see chunk_plan): single-shape by default;
        # ``PYWINDOW_TPU_SWEEP_LADDER=1`` opts into the shape ladder
        # (measured slower on the bench sweep — see chunk_plan).
        plan = chunk_plan(
            n_frames,
            c,
            ladder=(
                os.environ.get("PYWINDOW_TPU_SWEEP_LADDER", "0") == "1"
            ),
            n_dev=n_dev if shard else 1,
        )

        fields_cache: dict[int, tuple] = {}

        def fields_for(m: int) -> tuple:
            if m not in fields_cache:
                fields_cache[m] = tuple(
                    jnp.asarray(np.broadcast_to(row, (m, n_pad)))
                    for row in (mass, vdw, cov, mask)
                )
            return fields_cache[m]

        # host->device bytes are the sweep's bottleneck next to the
        # fused device pipeline (~20-130 MB/s over the tunneled TPU),
        # so chunks ship TIGHT — (c, n, 3), no atom padding — and the
        # compiled step pads to n_pad ON DEVICE inside the same jit
        # (bitwise-identical pipeline input, 33% fewer bytes for CC3's
        # 168->256 padding, ONE execute round-trip per chunk).
        pad_cols = n_pad - n

        def step_for(c_cfg):
            # _compiled_sweep_step is lru_cached on (sizes, cfg), so
            # the escalated variant compiles once per sweep
            return _compiled_sweep_step(
                n_win, n_avg, l1, l2, c_cfg, pad_cols,
                mesh_key="frames" if shard else None,
            )

        step_for(cfg_live["cfg"])  # compile the opening config eagerly

        # buffer reuse only off-CPU: the CPU backend may alias numpy
        # buffers zero-copy in device_put, where reuse would corrupt an
        # in-flight chunk (accelerators always copy across the transfer)
        reuse_bufs = jax.default_backend() != "cpu"
        n_bufs = _PIPELINE_DEPTH + 2
        bufs = [np.empty((c, n, 3), dtype=dtype) for _ in range(n_bufs)]

        def dispatch(lo, hi, m, k):
            buf = (
                bufs[k % n_bufs][:m]
                if reuse_bufs
                else np.empty((m, n, 3), dtype=dtype)
            )
            with profiling.stage("sweep_assemble"):
                buf[: hi - lo] = coords_t[lo:hi]
                # padding slots replay the chunk's first frame (results
                # sliced off on collect) so every chunk runs a ladder
                # shape
                if hi - lo < m:
                    buf[hi - lo :] = coords_t[lo]
            with profiling.stage("sweep_h2d"):
                tight = jnp.asarray(buf)
            with profiling.stage("sweep_dispatch"):
                c_cfg = cfg_live["cfg"]
                return (
                    step_for(c_cfg)(tight, *fields_for(m)),
                    hi - lo,
                    c_cfg,
                    pin,
                )

        def finish(lo, hi, handle):
            import dataclasses

            from pywindow_tpu.config import MAX_WINDOWS_CEILING

            chunk_cfg = handle[2]
            results = collect_batch(handle)
            esc: dict = {}
            results = retry_saturated_windows(
                [(elements, co_retry[i]) for i in range(lo, hi)],
                results,
                chunk_cfg,
                escalation_sink=esc,
                reference_max_diameter=pin,
            )
            # sticky escalation for LATER chunks: only when the marker
            # is endemic (majority of the chunk) — a stray frame is
            # cheaper through the per-chunk retry it just took.  The
            # single-collector ordering makes this deterministic.
            endemic = (hi - lo) // 2
            live = cfg_live["cfg"]
            if esc.get("open_overflow", 0) > endemic:
                frac = 2.0 * chunk_cfg.open_cap_frac
                if frac > live.open_cap_frac:
                    live = dataclasses.replace(
                        live, open_cap_frac=frac
                    )
            if esc.get("window_sat", 0) > endemic:
                w = min(
                    2 * chunk_cfg.max_windows, MAX_WINDOWS_CEILING
                )
                if w > live.max_windows:
                    live = dataclasses.replace(live, max_windows=w)
            if live is not cfg_live["cfg"]:
                # HBM guard: an escalated program has bigger temps; if
                # the model says the chunk no longer fits, keep the
                # per-chunk retry path instead
                if max_safe_batch(n_pad, pin, live) >= c:
                    cfg_live["cfg"] = live
                    if len(_LEARNED_CAPS) > 32:
                        _LEARNED_CAPS.clear()
                    _LEARNED_CAPS[esc_key] = live
            with profiling.stage("sweep_on_batch"):
                on_batch(np.arange(lo, hi, dtype=np.int64), results)

        # two-deep pipeline, a single collector thread and a single
        # decoder thread: up to _PIPELINE_DEPTH chunks are dispatched
        # ahead of the one being fetched, so chunk k+2's host->device
        # coordinate transfer streams over the tunnel WHILE chunk k+1
        # computes and chunk k's results transfer back (a one-deep
        # pipeline serialised those on the tunnel: measured ~0.46 s
        # steady chunk period vs 0.385 s device compute at B=4320).
        # The decoder parses slab text (native call, GIL released);
        # ONE collector worker keeps on_batch calls strictly ordered;
        # exceptions surface at .result().
        from collections import deque

        escalated = False
        with (
            ThreadPoolExecutor(max_workers=1) as collector,
            ThreadPoolExecutor(max_workers=1) as decoder,
        ):
            inflight: deque = deque()  # dispatched, collect not queued
            collects: deque = deque()  # queued collect futures
            pending = None  # in-flight decode future

            def queue_collect() -> None:
                lo0, hi0, h0 = inflight.popleft()
                collects.append(collector.submit(finish, lo0, hi0, h0))

            for k, (lo, hi, m) in enumerate(plan):
                # drain decodes until this chunk's frames are ready
                while state["decoded"] < hi and not escalated:
                    if pending is not None:
                        pending.result()
                        pending = None
                    else:
                        decode_into(
                            min(state["decoded"] + c, n_frames)
                        )
                    escalated = (
                        streaming and current_sizes()[1] != sizes
                    )
                # an already-finished prefetch may also escalate
                if pending is not None and pending.done():
                    pending.result()
                    pending = None
                    escalated = (
                        streaming and current_sizes()[1] != sizes
                    )
                if escalated:
                    break
                if (
                    size_gate is not None
                    and pending is None
                    and state["decoded"] == n_frames
                ):
                    # all decodes finished and survived the escalation
                    # checks: this pass runs the final size tuple
                    size_gate["final"] = True
                # prefetch the next slab while the device computes
                if pending is None and state["decoded"] < n_frames:
                    pending = decoder.submit(
                        decode_into,
                        min(state["decoded"] + c, n_frames),
                    )
                inflight.append((lo, hi, dispatch(lo, hi, m, k)))
                if len(inflight) > _PIPELINE_DEPTH:
                    queue_collect()
                # retire finished collects (propagates exceptions and
                # bounds the queue; a scratch buffer is only rewritten
                # n_bufs chunks later, by which point its chunk's
                # collect — two positions back in this queue — has
                # been awaited, so its transfer is long complete)
                while len(collects) > 1:
                    with profiling.stage("sweep_collect_wait"):
                        collects.popleft().result()
            # drain all three pipelines (also on the escalated break:
            # the prefetch writes arrays the restart pass reads).  On
            # an exception the with-blocks join the worker threads.
            if pending is not None:
                pending.result()
            while inflight:
                queue_collect()
            while collects:
                collects.popleft().result()
        if not escalated:
            return
        import logging

        logging.getLogger("pywindow_tpu").info(
            "sweep sampling sizes escalated mid-stream (%s -> %s); "
            "restarting over the %d decoded frames",
            sizes,
            current_sizes()[1],
            state["decoded"],
        )


def retry_saturated_windows(
    systems,
    results: list[dict],
    cfg: AnalysisConfig,
    escalation_sink: dict | None = None,
    **analyze_kwargs,
) -> list[dict]:
    """Escalate molecules whose device run outgrew a static cap.

    Two markers from ``to_properties_dict`` trigger a re-run:

    - ``_open_cap_overflow``: the open-ray count exceeded the
      compaction cap — re-run with a doubled ``open_cap_frac``
      (>= 1.0 reverts to the uncompacted full sweep), recursively.
    - ``_window_cap_saturated``: more window clusters than slots —
      re-run with a doubled ``max_windows`` (recursively, up to
      ``MAX_WINDOWS_CEILING``) so no window is ever silently truncated
      (the reference has no cap at all).

    Pops both markers from every result.

    ``escalation_sink``: when given, receives the per-marker counts
    (``open_overflow`` / ``budget`` / ``window_sat``) so a sweep can
    escalate its OWN config for later chunks instead of paying this
    retry on every chunk (see the sticky-escalation block in
    :func:`_sweep_frames`).
    """
    import dataclasses
    import logging

    from pywindow_tpu.config import MAX_WINDOWS_CEILING

    over = [
        i
        for i, r in enumerate(results)
        if r.pop("_open_cap_overflow", False)
    ]
    if escalation_sink is not None:
        escalation_sink["open_overflow"] = len(over)
    if over:
        cfg2 = dataclasses.replace(
            cfg, open_cap_frac=2.0 * cfg.open_cap_frac
        )
        redo = analyze_batch(
            [systems[i] for i in over], cfg2, **analyze_kwargs
        )
        for i, r in zip(over, redo):
            # the escalated run handled its own saturation/overflow
            results[i] = r

    budget = [
        i
        for i, r in enumerate(results)
        if r.pop("_opt_budget_exceeded", False)
    ]
    if escalation_sink is not None:
        escalation_sink["budget"] = len(budget)
    if budget and cfg.fast_budgets:
        # full optimiser budgets for the stray lanes only: the fused
        # batch runs capped (the vmapped while_loops pay the SLOWEST
        # lane), and the few frames that genuinely need more
        # iterations re-run here at full budget.
        cfg2 = dataclasses.replace(cfg, fast_budgets=False)
        redo = analyze_batch(
            [systems[i] for i in budget], cfg2, **analyze_kwargs
        )
        for i, r in zip(budget, redo):
            results[i] = r

    idxs = [
        i
        for i, r in enumerate(results)
        if r.pop("_window_cap_saturated", False)
    ]
    if escalation_sink is not None:
        escalation_sink["window_sat"] = len(idxs)
    if not idxs:
        return results
    if cfg.max_windows >= MAX_WINDOWS_CEILING:
        logging.getLogger("pywindow_tpu").warning(
            "%d molecule(s) still saturate max_windows=%d at the "
            "escalation ceiling; raise AnalysisConfig.max_windows",
            len(idxs),
            cfg.max_windows,
        )
        return results
    cfg2 = dataclasses.replace(cfg, max_windows=2 * cfg.max_windows)
    redo = analyze_batch(
        [systems[i] for i in idxs], cfg2, **analyze_kwargs
    )
    for i, r in zip(idxs, redo):
        results[i] = r
    return results
