"""MD trajectory analysis: DL_POLY HISTORY, PDB and XYZ trajectories.

Same user surface as the reference (reference: trajectory.py:103-1045):
mmap-based byte maps per frame, ``get_frames``, ``analysis`` with
resume-by-default semantics, ``save_analysis`` / ``save_frames``.  The
per-frame math runs through the fused device pipeline; the batched
multi-frame fast path lives in :mod:`pywindow_tpu.parallel.batch`.

Fixed reference quirks (documented):
* tuple frame ranges work (the reference unconditionally raised,
  trajectory.py:443-454),
* ``make_supercell`` uses ``supercell[2]`` for the c direction (the
  reference used ``supercell[1]``, trajectory.py:98).
"""

from __future__ import annotations

import pathlib
from contextlib import closing
from mmap import ACCESS_READ, mmap

import numpy as np

from pywindow_tpu.io.outputs import Output, to_list
from pywindow_tpu.molecular import MolecularSystem
from pywindow_tpu.ops.cell import (
    create_supercell,
    lattice_array_to_unit_cell,
    unit_cell_to_lattice_array,
)


#: frames held by the exact-sizes pre-scan cache before falling back to
#: the decode-twice strategy (bounds sweep memory at ~CC3 x 4096 frames
#: ~= 60 MB; beyond that the second decode is the cheaper trade)
_FRAME_CACHE_LIMIT = 4096


class TrajectoryError(ValueError):
    """Corrupted or inconsistent trajectory file."""


class SweepDecodeError(RuntimeError):
    """A native slab decode failed mid-sweep (parse error or atom ids
    diverging from frame 0's) — callers fall back to the generic
    per-frame path."""


def make_supercell(system: dict, supercell=None) -> MolecularSystem:
    """Expand a unit cell into a supercell MolecularSystem
    (reference: trajectory.py:75-100, with the c-axis bug fixed)."""
    if supercell is None:
        supercell = [1, 1, 1]
    user_supercell = [
        [1, supercell[0]],
        [1, supercell[1]],
        [1, supercell[2]],
    ]
    system = create_supercell(system=system, supercell=user_supercell)
    return MolecularSystem.load_system(system)


class Trajectory:
    """Base trajectory: byte-mapped frames + analysis orchestration."""

    def __init__(self, filepath: pathlib.Path | str) -> None:
        self.filepath = pathlib.Path(filepath)
        self.filename = self.filepath.name
        self.system_id = self.filename.split(".")[0]
        self.frames: dict = {}
        self.analysis_output: dict = {}
        self.trajectory_map: dict = {}
        self.no_of_frames = 0

    # -- frame access ---------------------------------------------------

    def _decode_frame(self, frame: list) -> dict:
        raise NotImplementedError

    def _decode_raw(self, raw: str) -> dict:
        frame = [ln.split() for ln in raw.split("\n")][:-1]
        return self._decode_frame(frame)

    def _raw_frame_dict(self, frame_no: int) -> dict:
        """One frame's raw decoded dict (no MolecularSystem wrapping)."""
        return self._decode_raw(self._frame_slice(frame_no).decode("utf-8"))

    def _frame_slice(self, frame_no: int) -> bytes:
        start, end = self.trajectory_map[frame_no]
        with (
            self.filepath.open() as fh,
            closing(mmap(fh.fileno(), 0, access=ACCESS_READ)) as mapped,
        ):
            return mapped[start:end]

    def _get_frame(
        self,
        frame_coordinates=None,
        frame_no: int = 0,
        swap_atoms: dict | None = None,
        forcefield: str | None = None,
        extract_data: bool = True,
    ):
        raw = self._frame_slice(frame_no).decode("utf-8")
        if not extract_data:
            return raw
        molsys = MolecularSystem.load_system(
            self._decode_raw(raw),
            "_".join([self.system_id, str(frame_no)]),
        )
        if swap_atoms is not None:
            molsys.swap_atom_keys(swap_atoms)
        if forcefield is not None:
            molsys.decipher_atom_keys(forcefield)
        return molsys

    def _resolve_frames(self, frames) -> list[int]:
        if isinstance(frames, int):
            return [frames]
        if isinstance(frames, list):
            bad = [f for f in frames if not isinstance(f, int)]
            if bad:
                msg = "the frames list must contain integers only"
                raise TypeError(msg)
            return list(frames)
        if isinstance(frames, tuple):
            if len(frames) != 2 or not all(
                isinstance(f, int) for f in frames
            ):
                msg = (
                    "a frames tuple must hold exactly two integers "
                    "(start, stop)"
                )
                raise TypeError(msg)
            return list(range(frames[0], frames[1]))
        if isinstance(frames, str) and frames in ("all", "everything"):
            return list(range(self.no_of_frames))
        msg = f"unrecognised frames specification: {frames!r}"
        raise ValueError(msg)

    def get_frames(
        self,
        frames="all",
        override: bool = False,
        swap_atoms: dict | None = None,
        forcefield: str | None = None,
        extract_data: bool = True,
    ) -> dict:
        """Extract frame(s) as :class:`MolecularSystem` objects
        (reference: trajectory.py:112-212)."""
        if override:
            self.frames = {}
        collected = {}
        cacheable = swap_atoms is None and forcefield is None and extract_data
        for frame in self._resolve_frames(frames):
            if cacheable:
                if frame not in self.frames:
                    self.frames[frame] = self._get_frame(
                        frame_no=frame, extract_data=True
                    )
                collected[frame] = self.frames[frame]
            else:
                # processed/raw frames are not cached: the cache holds
                # bare frames only, so option changes cannot poison it
                collected[frame] = self._get_frame(
                    frame_no=frame,
                    swap_atoms=swap_atoms,
                    forcefield=forcefield,
                    extract_data=extract_data,
                )
        return collected

    # -- native whole-sweep decode (fast path) ---------------------------

    #: coordinate-block budget for the whole-sweep decode (bytes of
    #: (F, N, 3) float64); sweeps above it use the generic chunked path.
    _SWEEP_DECODE_BUDGET = 2 * 1024**3

    def _sweep_batch_fn(self):
        """Native whole-sweep decoder hook; None = no native fast path.

        Format subclasses return
        ``batch_fn(buf, starts, ends, n_atoms, ref_ids, vdw,
        out64=None, out32=None)`` wrapping their native batch decoder
        (``out64``/``out32`` are optional caller-owned output slabs the
        decode fills directly — see native._decode_frames_batch).
        """
        return None

    def _sweep_decode_native(self, frames, swap_atoms, forcefield):
        """Whole-sweep native decode; None = use the generic path.

        Returns ``(elements, coords (F, N, 3) f64, per-frame max
        diameters)`` — the decode-everything-up-front form used by the
        exact-sizes path and ad-hoc tooling; the streaming sweep uses
        :meth:`_sweep_open_native` instead.
        """
        opened = self._sweep_open_native(frames, swap_atoms, forcefield)
        if opened is None:
            return None
        elements, decode_slab, close = opened
        try:
            xyz, maxd = decode_slab(0, len(frames))
        except SweepDecodeError:
            return None
        finally:
            close()
        return elements, xyz, maxd

    def _sweep_open_native(self, frames, swap_atoms, forcefield):
        """Open the native slab-decode fast path for ``frames``.

        One representative frame goes through the exact per-frame
        swap/decipher semantics (same MolecularSystem methods, same
        exception if elements cannot be derived); coordinates then
        decode per slab through the format's threaded native call —
        :func:`pywindow_tpu.parallel.batch.sweep_stream` decodes slab
        k+1 while the device computes chunk k.

        Returns ``(elements, decode_slab, close)`` or None (native
        library unavailable, memory budget exceeded, format guards).
        ``decode_slab(lo, hi)`` decodes frame positions [lo, hi) and
        returns ``(coords (k, N, 3) f64, maxd (k,))``; it raises
        :class:`SweepDecodeError` when a frame fails to parse or its
        atom ids diverge from frame 0's (callers fall back to the
        generic per-frame path).  ``close()`` releases the file map.
        """
        batch_fn = self._sweep_batch_fn()
        if batch_fn is None:
            return None
        from pywindow_tpu import native, tables

        if native.lib() is None:
            return None
        d0 = self._raw_frame_dict(frames[0])
        ids_key = "atom_ids" if "atom_ids" in d0 else "elements"
        ids0 = np.asarray(d0[ids_key], dtype="<U8")
        n_atoms = len(ids0)
        if n_atoms == 0:
            return None
        if len(frames) * n_atoms * 24 > self._SWEEP_DECODE_BUDGET:
            return None
        molsys = MolecularSystem.load_system(
            {ids_key: ids0.copy(), "coordinates": np.zeros((n_atoms, 3))},
            "_".join([self.system_id, "sweep"]),
        )
        if swap_atoms is not None:
            molsys.swap_atom_keys(swap_atoms)
        if forcefield is not None:
            molsys.decipher_atom_keys(forcefield)
        elements = np.asarray(molsys.system_to_molecule().elements)
        vdw = tables.ELEMENT_VDW[tables.element_ids(elements)].astype(
            np.float64
        )
        ref_ids = ids0.astype("S9").tobytes()
        starts = np.array(
            [self.trajectory_map[f][0] for f in frames], dtype=np.int64
        )
        ends = np.array(
            [self.trajectory_map[f][1] for f in frames], dtype=np.int64
        )
        fh = self.filepath.open()
        try:
            mapped = mmap(fh.fileno(), 0, access=ACCESS_READ)
        except (ValueError, OSError):
            fh.close()  # empty/truncated file: mmap(0 bytes) raises
            return None
        try:
            holder = {"buf": np.frombuffer(mapped, dtype=np.uint8)}
        except ValueError:
            mapped.close()
            fh.close()
            return None

        def decode_slab(lo: int, hi: int, out64=None, out32=None):
            got = batch_fn(
                holder["buf"], starts[lo:hi], ends[lo:hi], n_atoms,
                ref_ids, vdw, out64=out64, out32=out32,
            )
            if got is None:
                raise SweepDecodeError("native parse failed")
            xyz, ids_match, maxd = got
            if not ids_match:
                raise SweepDecodeError("atom ids vary across frames")
            return xyz, maxd

        # the pipeline may hand its own output slabs (see
        # parallel.batch._sweep_frames): both dtype copies then fill in
        # ONE native pass instead of decode -> f64 copy -> f32 copy
        decode_slab.supports_out = True

        def close() -> None:
            holder.clear()  # release the buffer export before close
            mapped.close()
            fh.close()

        return elements, decode_slab, close

    def _sweep_on_batch(
        self, todo, n_atoms, autosave, autosave_every, size_gate=None
    ):
        """The per-chunk result recorder shared by the fast/stream sweeps.

        ``size_gate``: the streaming sweep's escalation flag (see
        :func:`pywindow_tpu.parallel.batch.sweep_stream`) — autosave
        checkpoints are suppressed while a mid-stream sampling-size
        escalation is still possible, so a resumed sweep never mixes
        results computed under different size tuples.
        """
        import gc

        state = {"collected": 0}

        def on_batch(part, results):
            # mutate in place: every props dict arriving here is freshly
            # built for this chunk (to_properties_dicts_bulk /
            # retry_saturated_windows), never shared — the defensive
            # per-frame dict copy was ~2 us/frame of collector time.
            out = self.analysis_output
            for pos, props in zip(part.tolist(), results):
                props.pop("molecular_weight", None)
                props["no_of_atoms"] = n_atoms
                out.setdefault(todo[pos], {})["0"] = props
            state["collected"] += 1
            if (
                autosave is not None
                and state["collected"] % max(autosave_every, 1) == 0
                and (size_gate is None or size_gate.get("final"))
            ):
                self.save_analysis(autosave, override=True)
            if state["collected"] % 20 == 0:
                gc.collect()

        return on_batch

    def _analysis_batched_fast(
        self,
        todo,
        decoded,
        batch_size,
        reference_max_diameter,
        autosave,
        autosave_every,
        exact_sizes,
    ) -> None:
        """Device sweep over natively decoded frames (uniform elements)."""
        import gc

        from pywindow_tpu.parallel.batch import sweep_uniform

        elements, coords, maxd = decoded
        on_batch = self._sweep_on_batch(
            todo, len(elements), autosave, autosave_every
        )

        # the cyclic GC is pathological on long sweeps (see
        # analysis_batched); same suspend + bounded manual collect here
        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            sweep_uniform(
                elements,
                coords,
                maxd,
                on_batch,
                batch_size=batch_size,
                reference_max_diameter=reference_max_diameter,
                exact_sizes=exact_sizes,
            )
        finally:
            if gc_was_enabled:
                gc.enable()
        if autosave is not None:
            self.save_analysis(autosave, override=True)

    def _analysis_batched_stream(
        self,
        todo,
        elements,
        decode_slab,
        batch_size,
        reference_max_diameter,
        autosave,
        autosave_every,
    ) -> bool:
        """Streamed device sweep: slab decode overlaps device compute
        (see :func:`pywindow_tpu.parallel.batch.sweep_stream`).

        Returns False when a slab fails to decode mid-sweep (parse
        error / varying atom ids) — the caller falls back to the
        generic per-frame path, overwriting any partial results.
        """
        import gc

        from pywindow_tpu.parallel.batch import sweep_stream

        size_gate: dict = {"final": False}
        on_batch = self._sweep_on_batch(
            todo, len(elements), autosave, autosave_every,
            size_gate=size_gate,
        )
        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            sweep_stream(
                elements,
                len(todo),
                decode_slab,
                on_batch,
                batch_size=batch_size,
                reference_max_diameter=reference_max_diameter,
                size_gate=size_gate,
            )
        except SweepDecodeError:
            return False
        finally:
            if gc_was_enabled:
                gc.enable()
        if autosave is not None:
            self.save_analysis(autosave, override=True)
        return True

    # -- analysis ---------------------------------------------------------

    def analysis(
        self,
        frames="all",
        ncpus: int = 1,
        ncpus_analysis: int = 1,
        override: bool = False,
        modular: bool = False,
        rebuild: bool = False,
        swap_atoms: dict | None = None,
        forcefield: str | None = None,
    ) -> None:
        """Analyse frames; results populate :attr:`analysis_output`.

        Resume semantics: with ``override=False`` already-analysed frames
        are skipped (reference: trajectory.py:463-471).  ``ncpus`` /
        ``ncpus_analysis`` are accepted for API compatibility; frame
        batching across the device replaces process pools.
        """
        del ncpus, ncpus_analysis
        todo = self._resolve_frames(frames)
        if not override:
            todo = [f for f in todo if f not in self.analysis_output]
        for frame in todo:
            self.analysis_output[frame] = self._analyse_frame(
                frame,
                modular=modular,
                rebuild=rebuild,
                swap_atoms=swap_atoms,
                forcefield=forcefield,
            )

    def analysis_batched(
        self,
        frames="all",
        batch_size: int | None = None,
        override: bool = False,
        modular: bool = False,
        rebuild: bool = False,
        swap_atoms: dict | None = None,
        forcefield: str | None = None,
        reference_max_diameter: float | None = None,
        autosave: pathlib.Path | str | None = None,
        autosave_every: int = 10,
        exact_sizes: bool = False,
        _frame_cache: dict | None = None,
    ) -> None:
        """Device-batched analysis: frames are decoded on the host and
        swept through the fused pipeline ``batch_size`` at a time,
        sharded across all available devices.  ``batch_size=None``
        (default) auto-sizes to the largest HBM-safe device batch on
        the fast uniform path (big batches amortise the optimiser
        latency chains; see parallel.batch.max_safe_batch) and to a
        host-memory-friendly 256 frames on the generic path.

        This is the TPU-native replacement for the reference's
        ``ncpus``-process pool (reference: trajectory.py:553-586).
        Results land in :attr:`analysis_output` with the same schema as
        :meth:`analysis`.

        ``autosave``: checkpoint path — :attr:`analysis_output` is
        flushed there every ``autosave_every`` collected batches (and at
        the end), so long sweeps can resume after interruption: reload
        the JSON into :attr:`analysis_output` (keys back to int) and
        rerun with ``override=False``.

        ``exact_sizes``: by default one sampling-point count (derived
        from the largest member) serves the whole sweep, which can
        differ from the reference's per-frame count at log-scale
        boundaries (~1e-3 A effect).  With ``exact_sizes=True`` frames
        are pre-scanned and bucketed by their exact per-frame point
        counts, making batched results identical to the serial path at
        the cost of one extra decode pass.
        """
        from pywindow_tpu.parallel.batch import (
            collect_batch,
            dispatch_batch,
        )

        todo = self._resolve_frames(frames)
        if not override:
            todo = [f for f in todo if f not in self.analysis_output]
        else:
            # a re-run fully replaces the frame entries (merging would
            # leave stale molecule keys from a previous modular run)
            for f in todo:
                self.analysis_output.pop(f, None)
        if not todo:
            return

        if not modular and _frame_cache is None:
            # whole-sweep native fast path: threaded native decode (GIL
            # released), constant per-atom fields transferred once,
            # exact f64 sampling pin from the decoder — falls through
            # to the generic path when inapplicable (varying atom
            # ids/counts, huge sweeps, no native library).  The default
            # route STREAMS: slab k+1 decodes while the device computes
            # chunk k (the up-front whole-trajectory decode was ~1/3 of
            # end-to-end wall); exact_sizes needs every frame's max
            # diameter before the first dispatch, so it keeps the
            # decode-everything form.
            if not exact_sizes:
                opened = self._sweep_open_native(
                    todo, swap_atoms, forcefield
                )
                if opened is not None:
                    elements, decode_slab, close = opened
                    try:
                        ok = self._analysis_batched_stream(
                            todo,
                            elements,
                            decode_slab,
                            batch_size=batch_size,
                            reference_max_diameter=reference_max_diameter,
                            autosave=autosave,
                            autosave_every=autosave_every,
                        )
                    finally:
                        close()
                    if ok:
                        return
            else:
                fast = self._sweep_decode_native(
                    todo, swap_atoms, forcefield
                )
                if fast is not None:
                    self._analysis_batched_fast(
                        todo,
                        fast,
                        batch_size=batch_size,
                        reference_max_diameter=reference_max_diameter,
                        autosave=autosave,
                        autosave_every=autosave_every,
                        exact_sizes=exact_sizes,
                    )
                    return

        if batch_size is None:
            batch_size = 256  # generic path: bounds decoded-frame memory

        if exact_sizes:
            # bucket frames by their exact per-frame sampling sizes and
            # run one sweep per bucket (each with its own point count).
            from pywindow_tpu.config import DEFAULT_CONFIG
            from pywindow_tpu.ops.analysis import (
                max_dim_host,
                static_sizes,
            )

            # the pre-scan already decodes every frame; keep the decoded
            # systems for the sweep (bounded: a 10k+-frame sweep would
            # hold the whole trajectory in memory, there the second
            # decode is the cheaper trade).
            cache: dict | None = (
                {} if len(todo) <= _FRAME_CACHE_LIMIT else None
            )
            buckets: dict = {}
            for frame in todo:
                molsys = self._get_frame(
                    frame_no=frame,
                    swap_atoms=swap_atoms,
                    forcefield=forcefield,
                )
                if cache is not None:
                    cache[frame] = molsys
                maxd = max_dim_host(
                    molsys.system["elements"],
                    molsys.system["coordinates"],
                )
                n_win, n_avg, _, _ = static_sizes(maxd, DEFAULT_CONFIG)
                key = (n_win, n_avg)
                entry = buckets.setdefault(key, ([], 0.0))
                buckets[key] = (entry[0] + [frame], max(entry[1], maxd))
            for (n_win, n_avg), (bucket, maxd) in buckets.items():
                self.analysis_batched(
                    frames=bucket,
                    batch_size=batch_size,
                    override=override,
                    modular=modular,
                    rebuild=rebuild,
                    swap_atoms=swap_atoms,
                    forcefield=forcefield,
                    reference_max_diameter=maxd,
                    autosave=autosave,
                    autosave_every=autosave_every,
                    exact_sizes=False,
                    _frame_cache=cache,
                )
            return

        def prepare_one(frame):
            # consume (pop) the exact-sizes pre-scan cache so memory
            # is released as the sweep progresses
            molsys = None
            if _frame_cache is not None:
                molsys = _frame_cache.pop(frame, None)
            if molsys is None:
                molsys = self._get_frame(
                    frame_no=frame,
                    swap_atoms=swap_atoms,
                    forcefield=forcefield,
                )
            if modular:
                molsys.make_modular(rebuild=rebuild)
                mols = molsys.molecules
            else:
                mols = {"0": molsys.system_to_molecule()}
            return [
                ((frame, key), (mol.elements, mol.coordinates))
                for key, mol in mols.items()
            ]

        def prepare(chunk):
            jobs = []  # (frame, molecule key) — keys as make_modular emits
            systems = []
            # (a ThreadPoolExecutor over frames was tried here and
            # regressed badly — the per-frame python layers serialize on
            # the GIL and thrash; the native decoder alone is too small
            # a fraction to win)
            for items in (prepare_one(f) for f in chunk):
                for job, system in items:
                    jobs.append(job)
                    systems.append(system)
            return jobs, systems

        def store(chunk, jobs, systems, results, resolved_ref):
            from pywindow_tpu.config import DEFAULT_CONFIG
            from pywindow_tpu.parallel.batch import (
                retry_saturated_windows,
            )

            # molecules whose window clusters saturated the slot cap
            # re-run with an escalated cap before anything is recorded.
            # The retry reuses the sampling pin the original dispatch
            # resolved, so the escalated subset keeps the sweep's
            # sampling-point count.
            results = retry_saturated_windows(
                systems,
                results,
                DEFAULT_CONFIG,
                reference_max_diameter=resolved_ref,
            )
            for idx, ((frame, key), props) in enumerate(
                zip(jobs, results)
            ):
                props = dict(props)
                props.pop("molecular_weight", None)
                props["no_of_atoms"] = len(systems[idx][0])
                self.analysis_output.setdefault(frame, {})[key] = props
            # frames that produced no molecules (e.g. modular rebuild
            # kept nothing) still count as analysed for resume purposes.
            for frame in chunk:
                self.analysis_output.setdefault(frame, {})

        def dispatch_all(systems):
            """Bucketed, HBM-guarded dispatch.

            Systems are grouped by padded atom count so a varying-N
            sweep neither max-pads every frame to the chunk's largest
            member nor recompiles per chunk (one XLA program per pad
            bucket), then each bucket splits into HBM-safe
            sub-dispatches.  Sampling sizes are pinned across buckets
            (results must not depend on bucket composition; the extra
            per-bucket path-length headroom is result-neutral — masked
            static steps).  Returns (handles, dispatch-order indices,
            resolved sampling pin).
            """
            from pywindow_tpu.config import pad_multiple
            from pywindow_tpu.ops.analysis import max_dim_bound
            from pywindow_tpu.ops.encoding import round_up
            from pywindow_tpu.parallel.batch import (
                _largest_exact_maxd,
                max_safe_batch,
            )

            pad = pad_multiple()
            pads = [round_up(max(len(e), 1), pad) for e, _ in systems]
            bounds = [max_dim_bound(e, c) for e, c in systems]
            ref = reference_max_diameter
            if ref is None:
                # pin the sampling size across every bucket AND every
                # HBM sub-dispatch: without a pin each sub-dispatch
                # derives its own reference diameter and the
                # sampling-point count can flip at a log10 boundary
                # between chunks (results would depend on batch_size)
                ref = _largest_exact_maxd(systems, bounds)

            handles = []
            order: list[int] = []
            for p in sorted(set(pads)):
                idxs = [i for i, q in enumerate(pads) if q == p]
                maxd = max(bounds[i] for i in idxs)
                safe = max_safe_batch(p, maxd)
                for lo in range(0, len(idxs), safe):
                    part = idxs[lo : lo + safe]
                    # one compiled shape per sweep: remainder chunks pad
                    # up to the steady chunk size (otherwise every odd
                    # size costs a fresh XLA compile) — but never
                    # INFLATE a batch beyond the sweep's natural size
                    # (modular frames can emit few systems per chunk;
                    # padding those to `safe` would be a monster batch)
                    target = min(safe, max(batch_size, len(part), 1))
                    handles.append(
                        dispatch_batch(
                            [systems[i] for i in part],
                            reference_max_diameter=ref,
                            pad_atoms=p,
                            pad_batch_to=target,
                        )
                    )
                    order.extend(part)
            return handles, order, ref

        def collect_all(handles_order):
            handles, order = handles_order
            flat = []
            for h in handles:
                flat.extend(collect_batch(h))
            out = [None] * len(flat)
            for pos, idx in enumerate(order):
                out[idx] = flat[pos]
            return out

        # one-deep software pipeline: while the device crunches batch k,
        # the host decodes/encodes batch k+1 (dispatch is asynchronous).
        chunks = [
            todo[lo : lo + batch_size]
            for lo in range(0, len(todo), batch_size)
        ]
        collected = 0

        def checkpoint(final=False):
            if autosave is None:
                return
            if final or collected % max(autosave_every, 1) == 0:
                self.save_analysis(autosave, override=True)

        # the cyclic GC is pathological here: analysis_output grows by
        # thousands of small dicts per batch and gen-2 collections turn
        # a 10k-frame sweep from ~8 s into ~3 min (measured 23x).  The
        # loop itself is cycle-free, so collection is suspended and a
        # bounded manual collect runs every ~20 batches to reclaim any
        # cycles produced elsewhere (e.g. jit machinery) during very
        # long sweeps.
        import gc

        gc_was_enabled = gc.isenabled()
        gc.disable()
        try:
            pending = None  # (chunk, jobs, systems, handles, ref)
            for chunk in chunks:
                jobs, systems = prepare(chunk)
                if not systems:
                    # nothing to analyse in this chunk; mark as done
                    for frame in chunk:
                        self.analysis_output.setdefault(frame, {})
                    continue
                handles, order, ref = dispatch_all(systems)
                if pending is not None:
                    p_chunk, p_jobs, p_systems, p_handles, p_ref = pending
                    store(
                        p_chunk,
                        p_jobs,
                        p_systems,
                        collect_all(p_handles),
                        p_ref,
                    )
                    collected += 1
                    checkpoint()
                    if collected % 20 == 0:
                        gc.collect()
                pending = (chunk, jobs, systems, (handles, order), ref)
            if pending is not None:
                p_chunk, p_jobs, p_systems, p_handles, p_ref = pending
                store(
                    p_chunk,
                    p_jobs,
                    p_systems,
                    collect_all(p_handles),
                    p_ref,
                )
                collected += 1
                checkpoint(final=True)
        finally:
            if gc_was_enabled:
                gc.enable()

    def _analyse_frame(
        self,
        frame: int,
        modular: bool,
        rebuild: bool,
        swap_atoms: dict | None,
        forcefield: str | None,
    ) -> dict:
        molsys = self._get_frame(
            frame_no=frame,
            swap_atoms=swap_atoms,
            forcefield=forcefield,
        )
        if modular:
            molsys.make_modular(rebuild=rebuild)
            molecules = molsys.molecules
        else:
            molecules = {"0": molsys.system_to_molecule()}
        return {
            key: mol.full_analysis() for key, mol in molecules.items()
        }

    # -- persistence -------------------------------------------------------

    def load_analysis(self, filepath: pathlib.Path | str) -> None:
        """Reload a :meth:`save_analysis` JSON for resume: frames already
        present are then skipped by ``analysis*/override=False``."""
        import json

        with pathlib.Path(filepath).open() as fh:
            data = json.load(fh)
        for frame_key, mols in data.items():
            try:
                frame: int | str = int(frame_key)
            except ValueError:
                frame = frame_key
            self.analysis_output[frame] = mols

    def save_analysis(
        self,
        filepath: pathlib.Path | str | None = None,
        override: bool = False,
    ) -> None:
        """Serialise ``analysis_output`` to JSON (also the autosave
        checkpoint format; reference: trajectory.py:745)."""
        # no deepcopy: json.dump only reads, and the autosave checkpoint
        # calls this repeatedly during long sweeps.
        dict_obj = self.analysis_output
        if filepath is None:
            filepath = (
                pathlib.Path.cwd() / f"{self.system_id}_pywindow_analysis"
            )
        Output().dump2json(
            dict_obj, pathlib.Path(filepath), default=to_list,
            override=override,
        )

    def save_frames(
        self,
        frames="all",
        filepath: pathlib.Path | str | None = None,
        decipher: bool = True,
        swap_atoms: dict | None = None,
        forcefield: str | None = None,
        **kwargs,
    ) -> None:
        """Write selected frames to per-frame ``.pdb``/``.xyz`` files,
        optionally swapping/deciphering forcefield atom keys first
        (reference: trajectory.py:669)."""
        if filepath is None:
            filepath = pathlib.Path.cwd() / str(self.system_id)
        filepath = pathlib.Path(filepath)
        if filepath.suffix not in (".pdb", ".xyz"):
            msg = (
                f"the {filepath.suffix} extension is not supported for "
                "dumping frames; use .pdb or .xyz"
            )
            raise ValueError(msg)
        to_get = self._resolve_frames(frames)
        for frame in to_get:
            # fresh decode: swapping/deciphering must not mutate any
            # cached frame in self.frames
            molsys = self._get_frame(frame_no=frame)
            if decipher and forcefield is not None:
                if swap_atoms is not None:
                    if not isinstance(swap_atoms, dict):
                        msg = "swap_atoms must be a dictionary"
                        raise TypeError(msg)
                    molsys.swap_atom_keys(swap_atoms)
                molsys.decipher_atom_keys(forcefield)
            if "elements" not in molsys.system:
                msg = (
                    "the frame needs an 'elements' key; set decipher=True "
                    "with a forcefield (see manual)"
                )
                raise ValueError(msg)
            ffilepath = filepath.with_name(
                f"{filepath.stem}_{frame}{filepath.suffix}"
            )
            Output().dump2file(
                molsys.system,
                ffilepath,
                atom_ids_key=(
                    "elements"
                    if "atom_ids" not in molsys.system
                    else "atom_ids"
                ),
                **kwargs,
            )


class DLPOLY(Trajectory):
    """DL_POLY_C HISTORY trajectory (reference: trajectory.py:589-833)."""

    IMCON = {
        0: "nonperiodic",
        1: "cubic",
        2: "orthorhombic",
        3: "parallelepiped",
        4: "truncated octahedral",
        5: "rhombic dodecahedral",
        6: "x-y parallelogram",
        7: "hexagonal prism",
    }
    KEYTRJ = {
        0: "coordinates",
        1: "coordinates and velocities",
        2: "coordinates, velocities and forces",
    }

    def __init__(self, filepath: pathlib.Path | str) -> None:
        super().__init__(filepath)
        if not self._map_history_native():
            self._check_history()
            self._map_history()

    def _map_history_native(self) -> bool:
        """One-pass native map + integrity check (C++ scanner).

        Combines :meth:`_check_history` and :meth:`_map_history` in a
        single buffer scan; returns False to fall back to the Python
        pair when the native library is unavailable.
        """
        from pywindow_tpu import native

        if native.lib() is None:
            return False
        err_msg = None
        with self.filepath.open() as fh:
            mapped = mmap(fh.fileno(), 0, access=ACCESS_READ)
            try:
                buf = np.frombuffer(mapped, dtype=np.uint8)
                try:
                    try:
                        # capacity: guess-and-retry instead of an exact
                        # "timestep" counting pre-pass — the pre-pass
                        # rescanned the whole buffer and cost ~2x the
                        # map scan itself.  A frame is ≥ ~1 KB for any
                        # real system; tiny-frame files retry with 8x
                        # capacity until the scan fits.
                        cap = max(1024, buf.size // 1024)
                        while True:
                            got = native.map_history(buf, cap)
                            if got is not None or cap > buf.size:
                                break
                            cap *= 8
                    except ValueError as exc:
                        # raise AFTER the mmap closes: an in-flight
                        # exception's frames would pin the buffer
                        # export and make close() fail
                        kind, _, line = str(exc).partition(":")
                        if kind == "empty":
                            err_msg = (
                                f"Line {line}: the file contains an "
                                "empty line"
                            )
                        else:
                            err_msg = (
                                f"Line {line}: the trajectory is "
                                "discontinuous"
                            )
                        got = None
                finally:
                    del buf  # release the buffer export before close
                if err_msg is None:
                    if got is None:
                        return False
                    starts, ends, header_end, warn = got
                    if len(starts) == 0:
                        # no timestep records at all: let the Python
                        # path produce its exact error behaviour
                        return False
                    self.check_log = ""
                    if warn & 1:
                        self.check_log += (
                            "Line 1: no comment line present as the "
                            "file header\n"
                        )
                    if warn & 2:
                        self.check_log += (
                            "Line 2: second header line (periodicity "
                            "/ trajectory type) is missing\n"
                        )
                    self._decode_header(mapped[0:header_end])
                    # tolist() first: per-element int(np_scalar) was
                    # ~2x slower across a long trajectory's map
                    s_l, e_l = starts.tolist(), ends.tolist()
                    self.trajectory_map = {
                        i: [s, e]
                        for i, (s, e) in enumerate(zip(s_l, e_l))
                    }
                    self.no_of_frames = len(s_l)
            finally:
                mapped.close()
        if err_msg is not None:
            raise TrajectoryError(err_msg)
        return True

    def _map_history(self) -> None:
        """Byte-map every frame (reference: trajectory.py:647-689)."""
        self.trajectory_map = {}
        with (
            self.filepath.open() as fh,
            closing(mmap(fh.fileno(), 0, access=ACCESS_READ)) as mapped,
        ):
            progress = 0
            frame = 0
            frame_start = 0
            header_done = False
            while True:
                bline = mapped.readline()
                if len(bline) == 0:
                    self.trajectory_map[frame] = [frame_start, progress]
                    frame += 1
                    break
                sline = bline.decode("utf-8").split()
                if sline and sline[0] == "timestep":
                    if header_done:
                        self.trajectory_map[frame] = [
                            frame_start,
                            progress,
                        ]
                        frame += 1
                    else:
                        self._decode_header(mapped[0:progress])
                        header_done = True
                    frame_start = progress
                progress += len(bline)
        self.no_of_frames = frame

    def _decode_header(self, raw: bytes) -> None:
        header = [ln.split() for ln in raw.decode("utf-8").split("\n")]
        keytrj, imcon, natms = (int(v) for v in header[1][:3])
        self.periodic_boundary = self.IMCON[imcon]
        self.content_type = self.KEYTRJ[keytrj]
        self.no_of_atoms = natms
        self._keytrj = keytrj
        self._imcon = imcon

    def _sweep_batch_fn(self):
        from pywindow_tpu import native

        keytrj = getattr(self, "_keytrj", None)
        if keytrj is None or keytrj not in (0, 1, 2):
            return None
        has_cell = self._imcon in (1, 2, 3)
        if not has_cell and self._imcon != 0:
            return None
        return lambda buf, s, e, n, rid, vdw, out64=None, out32=None: (
            native.decode_dlpoly_frames_batch(
                buf, s, e, keytrj, has_cell, n, rid, vdw=vdw,
                out64=out64, out32=out32,
            )
        )

    def _decode_raw(self, raw: str) -> dict:
        """Decode one HISTORY frame, native text parser when available.

        The C++ parser covers every keytrj (coordinates, velocities,
        forces); the Python stride decode is the fallback.
        """
        head = raw[: raw.find("\n")].split()
        info = {
            "nstep": int(head[1]),
            "natms": int(head[2]),
            "keytrj": int(head[3]),
            "imcon": int(head[4]),
            "tstep": float(head[5]),
        }
        if info["keytrj"] in (0, 1, 2):
            from pywindow_tpu import native

            got = native.decode_dlpoly_frame(
                raw.encode(),
                keytrj=info["keytrj"],
                has_cell=info["imcon"] in (1, 2, 3),
                n_atoms_hint=info["natms"],
            )
            if got is not None and len(got[0]) == info["natms"]:
                ids, coords, lattice, vel, frc = got
                out = {
                    "frame_info": info,
                    "atom_ids": ids,
                    "coordinates": coords,
                }
                if lattice is not None:
                    out["lattice"] = lattice
                    out["unit_cell"] = lattice_array_to_unit_cell(lattice)
                if vel is not None:
                    out["velocities"] = vel
                if frc is not None:
                    out["forces"] = frc
                return out
        frame = [ln.split() for ln in raw.split("\n")][:-1]
        return self._decode_frame(frame)

    def _decode_frame(self, frame: list) -> dict:
        """Decode one HISTORY frame (reference: trajectory.py:712-766)."""
        info = {
            "nstep": int(frame[0][1]),
            "natms": int(frame[0][2]),
            "keytrj": int(frame[0][3]),
            "imcon": int(frame[0][4]),
            "tstep": float(frame[0][5]),
        }
        out: dict = {"frame_info": info}
        start = 1
        if info["imcon"] in (1, 2, 3):
            out["lattice"] = np.array(frame[1:4], dtype=float).T
            out["unit_cell"] = lattice_array_to_unit_cell(out["lattice"])
            start = 4
        stride = info["keytrj"] + 2
        body = frame[start:]
        ids = [body[i][0] for i in range(0, len(body), stride)]
        coords = [body[i] for i in range(1, len(body), stride)]
        out["atom_ids"] = np.array(ids)
        out["coordinates"] = np.array(coords, dtype=float)
        if stride >= 3:
            out["velocities"] = np.array(
                [body[i] for i in range(2, len(body), stride)], dtype=float
            )
        if stride >= 4:
            out["forces"] = np.array(
                [body[i] for i in range(3, len(body), stride)], dtype=float
            )
        return out

    def _check_history(self) -> None:
        """Integrity check: monotone timesteps, no empty lines, header
        shape warnings (reference: trajectory.py:768-833)."""
        self.check_log = ""
        line_no = 0
        timestep = 0
        with (
            self.filepath.open() as fh,
            closing(mmap(fh.fileno(), 0, access=ACCESS_READ)) as mapped,
        ):
            while True:
                bline = mapped.readline()
                if len(bline) == 0:
                    break
                line_no += 1
                sline = bline.decode("utf-8").strip("\n").split()
                if len(sline) == 0:
                    msg = f"Line {line_no}: the file contains an empty line"
                    raise TrajectoryError(msg)
                if line_no == 1 and sline[0] != "DLFIELD":
                    self.check_log += (
                        f"Line {line_no}: no comment line present as the "
                        "file header\n"
                    )
                if line_no == 2 and len(sline) != 3:
                    self.check_log += (
                        f"Line {line_no}: second header line (periodicity "
                        "/ trajectory type) is missing\n"
                    )
                if sline[0] == "timestep":
                    new_timestep = int(sline[1])
                    if timestep > new_timestep:
                        msg = (
                            f"Line {line_no}: the trajectory is "
                            "discontinuous"
                        )
                        raise TrajectoryError(msg)
                    timestep = new_timestep


class XYZ(Trajectory):
    """XYZ trajectory (reference: trajectory.py:836-931)."""

    def __init__(self, filepath: pathlib.Path | str) -> None:
        super().__init__(filepath)
        self._map_trajectory()

    def _map_trajectory(self) -> None:
        self.trajectory_map = {}
        with (
            self.filepath.open() as fh,
            closing(mmap(fh.fileno(), 0, access=ACCESS_READ)) as mapped,
        ):
            progress = 0
            frame = -1
            frame_start = 0
            while True:
                bline = mapped.readline()
                if len(bline) == 0:
                    frame += 1
                    self.trajectory_map[frame] = [frame_start, progress]
                    break
                sline = bline.decode("utf-8").strip("\n").split()
                if (
                    len(sline) == 1
                    and sline[0].lstrip("+-").isdigit()
                    and progress > 0
                ):
                    frame += 1
                    self.trajectory_map[frame] = [frame_start, progress]
                    frame_start = progress
                progress += len(bline)
        self.no_of_frames = frame + 1

    def _decode_raw(self, raw: str) -> dict:
        head, _, _ = raw.partition("\n")
        rest = raw[len(head) + 1 :]
        remark, _, _ = rest.partition("\n")
        natms = int(head.split()[0])

        from pywindow_tpu import native

        got = native.decode_xyz_frame(raw.encode(), n_atoms_hint=natms)
        if got is not None and len(got[0]) == natms:
            ids, coords = got
            return {
                "frame_info": {
                    "natms": natms,
                    "remarks": " ".join(remark.split()),
                },
                "atom_ids": ids,
                "coordinates": coords,
            }
        frame = [ln.split() for ln in raw.split("\n")][:-1]
        return self._decode_frame(frame)

    def _decode_frame(self, frame: list) -> dict:
        out = {
            "frame_info": {
                "natms": int(frame[0][0]),
                "remarks": " ".join(frame[1]),
            }
        }
        # elements land in atom_ids (deciphering may be needed) — same
        # contract as the reference (trajectory.py:916-931).
        out["atom_ids"] = np.array([row[0] for row in frame[2:]])
        out["coordinates"] = np.array(
            [row[1:4] for row in frame[2:]], dtype=float
        )
        return out

    def _sweep_batch_fn(self):
        from pywindow_tpu import native

        return lambda buf, s, e, n, rid, vdw, out64=None, out32=None: (
            native.decode_xyz_frames_batch(
                buf, s, e, n, rid, vdw=vdw, out64=out64, out32=out32
            )
        )


class PDB(Trajectory):
    """PDB trajectory, frames separated by END lines
    (reference: trajectory.py:934-1045)."""

    def __init__(self, filepath: pathlib.Path | str) -> None:
        super().__init__(filepath)
        self._map_trajectory()

    def _map_trajectory(self) -> None:
        self.trajectory_map = {}
        with (
            self.filepath.open() as fh,
            closing(mmap(fh.fileno(), 0, access=ACCESS_READ)) as mapped,
        ):
            progress = 0
            frame = -1
            frame_start = 0
            while True:
                bline = mapped.readline()
                if len(bline) == 0:
                    if progress - frame_start > 10:
                        frame += 1
                        self.trajectory_map[frame] = [
                            frame_start,
                            progress,
                        ]
                    break
                sline = bline.decode("utf-8").strip("\n").split()
                if len(sline) == 1 and sline[0] == "END":
                    frame += 1
                    self.trajectory_map[frame] = [frame_start, progress]
                    frame_start = progress
                progress += len(bline)
        self.no_of_frames = frame + 1

    def _get_frame(self, frame_coordinates=None, frame_no: int = 0, **kw):
        # PDB frames are decoded from raw fixed-column lines, not
        # whitespace splits.
        raw = self._frame_slice(frame_no).decode("utf-8")
        if not kw.get("extract_data", True):
            return raw
        molsys = MolecularSystem.load_system(
            self._decode_raw_pdb(raw),
            "_".join([self.system_id, str(frame_no)]),
        )
        if kw.get("swap_atoms") is not None:
            molsys.swap_atom_keys(kw["swap_atoms"])
        if kw.get("forcefield") is not None:
            molsys.decipher_atom_keys(kw["forcefield"])
        return molsys

    def _raw_frame_dict(self, frame_no: int) -> dict:
        return self._decode_raw_pdb(
            self._frame_slice(frame_no).decode("utf-8")
        )

    def _sweep_batch_fn(self):
        from pywindow_tpu import native

        return lambda buf, s, e, n, rid, vdw, out64=None, out32=None: (
            native.decode_pdb_frames_batch(
                buf, s, e, n, rid, vdw=vdw, out64=out64, out32=out32
            )
        )

    def _decode_raw_pdb(self, raw: str) -> dict:
        """Native fixed-column decode with python fallback.

        REMARK records are rare in MD frames; they fall back to the
        python path so the dict shape stays identical.
        """
        if "REMARK" not in raw:
            from pywindow_tpu import native

            cap = raw.count("\n") + 1
            got = native.decode_pdb_frame(raw.encode(), n_atoms_hint=cap)
            if got is not None:
                ids, coords, cryst = got
                out: dict = {
                    "atom_ids": ids,
                    "coordinates": coords,
                }
                if cryst is not None:
                    out["CRYST1"] = cryst
                    out["unit_cell"] = cryst
                    out["lattice"] = unit_cell_to_lattice_array(cryst)
                return out
        return self._decode_frame(raw.split("\n"))

    def _decode_frame(self, lines: list[str]) -> dict:
        out: dict = {}
        elements = []
        coordinates = []
        for ln in lines:
            if ln[:6] == "REMARK":
                out.setdefault("REMARKS", []).append(ln[6:])
            elif ln[:6] == "CRYST1":
                cryst = np.array(
                    [
                        ln[6:15],
                        ln[15:24],
                        ln[24:33],
                        ln[33:40],
                        ln[40:47],
                        ln[47:54],
                    ],
                    dtype=float,
                )
                if cryst[0:3].sum() != 0:
                    out["CRYST1"] = cryst
                    # make the cell usable by the rebuild pipeline (the
                    # reference left CRYST1 unconverted, so periodic PDB
                    # trajectories could never rebuild —
                    # trajectory.py:1022-1037)
                    out["unit_cell"] = cryst
                    out["lattice"] = unit_cell_to_lattice_array(cryst)
            elif ln[:6] in ("HETATM", "ATOM  "):
                elements.append(ln[12:16].strip())
                coordinates.append([ln[30:38], ln[38:46], ln[46:54]])
        out["atom_ids"] = np.array(elements, dtype="<U8")
        out["coordinates"] = np.array(coordinates, dtype=float)
        return out
