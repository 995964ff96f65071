"""Multi-process (multi-host / DCN) trajectory analysis.

The reference's only cross-frame parallelism is a single-host
``multiprocessing.Pool`` fan-out (reference: trajectory.py:553-586).
The TPU-native equivalent scales over *hosts*: every process

1. byte-maps the trajectory and decodes ONLY its own frame shard
   (contiguous byte ranges through the native threaded decoder — no
   host ever touches another host's frames),
2. encodes and analyses the shard on its local devices, as one shard of
   a global batch laid out over a ``('hosts', 'frames')`` mesh (DCN
   outer axis follows process boundaries, ICI inner axis the local
   devices), and
3. all-gathers the small packed property vectors — the only cross-host
   traffic a frame sweep needs.

Bootstrap is :func:`initialize` (a thin ``jax.distributed.initialize``
wrapper); the whole path is exercised on CPU with two localhost
processes by ``tests/test_distributed.py`` and the driver's
``dryrun_multichip`` 2-process leg — no TPU pod required.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from pywindow_tpu.config import DEFAULT_CONFIG, AnalysisConfig


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bootstrap the JAX distributed runtime for a multi-host sweep.

    Arguments default to the standard environment variables
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``), matching how cluster launchers export them; on
    TPU pods with auto-detection all three may be omitted entirely.
    """
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is not None:
        kwargs["coordinator_address"] = addr
    n = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if n is not None:
        kwargs["num_processes"] = int(n)
    pid = (
        process_id
        if process_id is not None
        else os.environ.get("JAX_PROCESS_ID")
    )
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


_BARRIER_SEQ: dict[str, int] = {}


def _compile_barrier(tag: str, timeout_ms: int = 1_800_000) -> None:
    """Block until every process reaches this (sequenced) barrier.

    Uses the coordination-service barrier (plain gRPC to the
    coordinator) rather than a device collective: it must be safe to
    enter with arbitrary skew, which Gloo collectives are not.  The
    per-tag sequence number keeps repeated sweeps (escalation retries
    re-enter with the same shapes) on distinct barrier ids.
    """
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:  # single-process: nothing to synchronise
        return
    seq = _BARRIER_SEQ.get(tag, 0)
    _BARRIER_SEQ[tag] = seq + 1
    client.wait_at_barrier(f"pywindow_tpu_{tag}_{seq}", timeout_ms)


def _shard_frames(todo: list[int], n_procs: int) -> list[list[int]]:
    """Contiguous equal-size frame shards (padded by repeating the last
    frame) — contiguous so each process reads one byte range."""
    per = (len(todo) + n_procs - 1) // n_procs
    shards = []
    for p in range(n_procs):
        shard = todo[p * per : (p + 1) * per]
        if not shard:
            shard = [todo[-1]]
        shard = shard + [shard[-1]] * (per - len(shard))
        shards.append(shard)
    return shards


def analysis_batched_distributed(
    traj,
    frames="all",
    swap_atoms: dict | None = None,
    forcefield: str | None = None,
    override: bool = False,
    reference_max_diameter: float | None = None,
    cfg: AnalysisConfig = DEFAULT_CONFIG,
) -> None:
    """Distributed whole-sweep analysis over every participating process.

    Each process decodes and analyses its own frame shard; results for
    ALL frames land in ``traj.analysis_output`` on EVERY process (the
    packed result vectors are all-gathered).  Results are identical to
    the single-process fast path with the same sampling pin (the pin is
    the all-process maximum diameter, i.e. the sweep-wide pin).

    Requires :func:`initialize` (or single-process: degenerates to the
    local mesh).  The analysis itself needs no other collectives —
    frames are independent.
    """
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from pywindow_tpu.config import default_dtype, pad_multiple
    from pywindow_tpu.ops.analysis import (
        packed_size,
        static_sizes,
        to_properties_dict,
        unpack_results,
    )
    from pywindow_tpu.ops.encoding import (
        FAR_AWAY,
        MolArrays,
        _encode_host,
        round_up,
    )
    from pywindow_tpu.parallel.batch import _compiled_batch_analysis

    n_procs = jax.process_count()
    pid = jax.process_index()

    todo = traj._resolve_frames(frames)
    if not override:
        todo = [f for f in todo if f not in traj.analysis_output]
    if not todo:
        return

    shards = _shard_frames(todo, n_procs)
    my_frames = shards[pid]

    # --- per-process decode of ONLY this shard -------------------------
    decoded = traj._sweep_decode_native(my_frames, swap_atoms, forcefield)
    if decoded is None:
        # python per-frame fallback (still shard-local)
        from pywindow_tpu.ops.analysis import max_dim_host

        systems = []
        for f in my_frames:
            molsys = traj._get_frame(
                frame_no=f, swap_atoms=swap_atoms, forcefield=forcefield
            )
            mol = molsys.system_to_molecule()
            systems.append((np.asarray(mol.elements), mol.coordinates))
        elements = systems[0][0]
        coords = np.stack([c for _, c in systems])
        maxd = np.array(
            [max_dim_host(e, c) for e, c in systems], dtype=np.float64
        )
    else:
        elements, coords, maxd = decoded

    # --- sweep-wide sampling pin (one scalar over DCN) -----------------
    local_max = float(np.max(maxd))
    if n_procs > 1:
        all_max = np.asarray(
            multihost_utils.process_allgather(
                np.asarray([local_max], dtype=np.float64)
            )
        )
        global_max = float(np.max(all_max))
    else:
        global_max = local_max
    ref = (
        float(reference_max_diameter)
        if reference_max_diameter is not None
        else global_max
    )
    n_win, n_avg, l1, l2 = static_sizes(ref, cfg)
    _, _, l1_b, l2_b = static_sizes(global_max, cfg)
    l1, l2 = max(l1, l1_b), max(l2, l2_b)

    # --- local shard -> one global (hosts x frames)-sharded batch ------
    dtype = np.dtype(default_dtype())
    n = len(elements)
    n_pad = round_up(max(n, 1), pad_multiple())
    local_b = coords.shape[0]
    per_dev = round_up(local_b, jax.local_device_count())
    local_chunk = np.full((per_dev, n_pad, 3), FAR_AWAY, dtype=dtype)
    local_chunk[:local_b, :n] = coords
    if per_dev > local_b:  # pad slots replay frame 0 (sliced off later)
        local_chunk[local_b:, :n] = coords[0]
    _, mass, vdw, cov, mask = _encode_host(
        elements, np.zeros((n, 3)), n_pad, dtype
    )
    fields_local = tuple(
        np.ascontiguousarray(np.broadcast_to(row, (per_dev, n_pad)))
        for row in (mass, vdw, cov, mask)
    )

    mesh = Mesh(
        np.asarray(jax.devices()).reshape(n_procs, -1),
        axis_names=("hosts", "frames"),
    )
    sharding = NamedSharding(mesh, PartitionSpec(("hosts", "frames")))
    mols = MolArrays(
        jax.make_array_from_process_local_data(sharding, local_chunk),
        *(
            jax.make_array_from_process_local_data(sharding, f)
            for f in fields_local
        ),
    )

    fn = _compiled_batch_analysis(
        n_win, n_avg, l1, l2, cfg, mesh_key=("procs", mesh, sharding)
    )
    if n_procs > 1:
        # Compile ahead-of-time, then rendezvous at a coordination-
        # service barrier before executing.  Gloo's communicator setup
        # has a hard ~30 s key-value deadline; per-process compile
        # times of the (fresh-shape) pipeline program can differ by
        # minutes, and a process that starts executing while a peer is
        # still compiling would time its collectives out.  The gRPC
        # coordination barrier has its own explicit (long) timeout and
        # needs no Gloo context.
        compiled = fn.lower(mols).compile()
        _compile_barrier(f"sweep_compiled_{n_win}_{l1}_{l2}_{per_dev}")
        out = compiled(mols)
    else:
        out = fn(mols)  # (n_procs*per_dev, K), sharded hosts x frames

    # --- gather the packed vectors (the ONLY cross-host traffic) -------
    if n_procs > 1:
        full = np.asarray(
            multihost_utils.process_allgather(out, tiled=True)
        )
    else:
        full = np.asarray(out)
    assert full.shape == (n_procs * per_dev, packed_size(cfg.max_windows))

    # --- results for every frame, on every process ---------------------
    import dataclasses

    from pywindow_tpu.config import MAX_WINDOWS_CEILING

    saturated: list[int] = []
    overflowed: list[int] = []
    budget_capped: list[int] = []
    for p in range(n_procs):
        shard = shards[p]
        for k, frame in enumerate(shard):
            if k > 0 and shard[k] == shard[k - 1]:
                continue  # trailing padding repeats the last frame
            props = to_properties_dict(
                unpack_results(full[p * per_dev + k], cfg.max_windows)
            )
            if props.pop("_open_cap_overflow", False):
                overflowed.append(frame)
            if props.pop("_opt_budget_exceeded", False) and cfg.fast_budgets:
                budget_capped.append(frame)
            if props.pop("_window_cap_saturated", False):
                saturated.append(frame)
            props.pop("molecular_weight", None)
            props["no_of_atoms"] = int(n)
            traj.analysis_output.setdefault(frame, {})["0"] = props

    # --- cap escalations: all processes re-run the same subsets --------
    if overflowed:
        analysis_batched_distributed(
            traj,
            frames=sorted(set(overflowed)),
            swap_atoms=swap_atoms,
            forcefield=forcefield,
            override=True,
            reference_max_diameter=ref,
            cfg=dataclasses.replace(
                cfg, open_cap_frac=2.0 * cfg.open_cap_frac
            ),
        )
        saturated = [f for f in saturated if f not in set(overflowed)]
        budget_capped = [
            f for f in budget_capped if f not in set(overflowed)
        ]
    if budget_capped:
        # full optimiser budgets for the stray frames only
        analysis_batched_distributed(
            traj,
            frames=sorted(set(budget_capped)),
            swap_atoms=swap_atoms,
            forcefield=forcefield,
            override=True,
            reference_max_diameter=ref,
            cfg=dataclasses.replace(cfg, fast_budgets=False),
        )
        saturated = [f for f in saturated if f not in set(budget_capped)]
    if saturated and cfg.max_windows < MAX_WINDOWS_CEILING:
        analysis_batched_distributed(
            traj,
            frames=sorted(set(saturated)),
            swap_atoms=swap_atoms,
            forcefield=forcefield,
            override=True,
            reference_max_diameter=ref,
            cfg=dataclasses.replace(
                cfg, max_windows=2 * cfg.max_windows
            ),
        )
