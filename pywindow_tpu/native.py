"""ctypes bindings for the native host-side core.

The C++ library (``pywindow_tpu/_native/rebuild_core.cpp``) provides the hot
host-side loops that feed the device pipeline: the exact-parity BFS for
periodic molecule reconstruction and the DL_POLY frame decoder.  The
library is built on demand with the system compiler; every caller has a
pure-numpy fallback, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess

import numpy as np

logger = logging.getLogger("pywindow_tpu")

_NATIVE_DIR = pathlib.Path(__file__).parent / "_native"


def _so_path() -> pathlib.Path:
    """Build-output location: next to the sources when writable (source
    checkout), else a per-user cache dir (installed package)."""
    import os

    if os.access(_NATIVE_DIR, os.W_OK):
        return _NATIVE_DIR / "libpywindow_native.so"
    cache = pathlib.Path(
        os.environ.get("XDG_CACHE_HOME", pathlib.Path.home() / ".cache")
    ) / "pywindow_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    return cache / "libpywindow_native.so"


_SO = _so_path()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build() -> bool:
    # build to a unique temp path and rename atomically: concurrent
    # processes must never dlopen a half-written library.
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(
        suffix=".so", prefix="pywindow_native_", dir=str(_SO.parent)
    )
    os.close(fd)
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-ffp-contract=off", "-fno-fast-math", "-pthread",
                "-o", tmp, str(_NATIVE_DIR / "rebuild_core.cpp"),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _SO)
    except (OSError, subprocess.SubprocessError) as exc:
        logger.info("native build unavailable (%s); using numpy paths", exc)
        pathlib.Path(tmp).unlink(missing_ok=True)
        return False
    return _SO.is_file()


def lib() -> ctypes.CDLL | None:
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _NATIVE_DIR / "rebuild_core.cpp"
    if not _SO.is_file() or (
        src.is_file() and src.stat().st_mtime > _SO.stat().st_mtime
    ):
        if not _build():
            return None
    try:
        L = ctypes.CDLL(str(_SO))
    except OSError as exc:  # pragma: no cover
        logger.info("native library failed to load (%s)", exc)
        return None

    c_d = ctypes.POINTER(ctypes.c_double)
    c_u8 = ctypes.POINTER(ctypes.c_uint8)
    c_i64 = ctypes.POINTER(ctypes.c_int64)
    c_i32 = ctypes.POINTER(ctypes.c_int32)
    L.pw_bfs_molecule.restype = ctypes.c_long
    L.pw_bfs_molecule.argtypes = [
        ctypes.c_long, c_d, c_d, c_u8, c_i64,
        ctypes.c_long, c_d, c_d, c_u8, c_i64, c_i64,
        ctypes.c_double, ctypes.c_double, ctypes.c_long,
        c_u8, c_i32, c_i64, ctypes.c_long,
    ]
    L.pw_decode_dlpoly_frame.restype = ctypes.c_long
    L.pw_decode_dlpoly_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        c_d, ctypes.c_char_p, c_d, c_d, c_d, ctypes.c_long,
    ]
    L.pw_decode_xyz_frame.restype = ctypes.c_long
    L.pw_decode_xyz_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, c_d,
        ctypes.c_long,
    ]
    L.pw_decode_pdb_frame.restype = ctypes.c_long
    L.pw_decode_pdb_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, c_d, c_d,
        ctypes.POINTER(ctypes.c_long), ctypes.c_long,
    ]
    c_vp = ctypes.c_void_p
    L.pw_map_history.restype = ctypes.c_long
    L.pw_map_history.argtypes = [
        c_vp, ctypes.c_long, c_i64, c_i64, ctypes.c_long,
        c_i64, c_i64, c_i64,
    ]
    c_f = ctypes.POINTER(ctypes.c_float)
    L.pw_decode_dlpoly_frames_batch.restype = ctypes.c_long
    L.pw_decode_dlpoly_frames_batch.argtypes = [
        c_vp, c_i64, c_i64, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_char_p, c_d, c_f, c_d,
        c_d, ctypes.c_long, c_i64,
    ]
    L.pw_decode_xyz_frames_batch.restype = ctypes.c_long
    L.pw_decode_xyz_frames_batch.argtypes = [
        c_vp, c_i64, c_i64, ctypes.c_long, ctypes.c_long,
        ctypes.c_char_p, c_d, c_f, c_d, c_d, ctypes.c_long, c_i64,
    ]
    L.pw_decode_pdb_frames_batch.restype = ctypes.c_long
    L.pw_decode_pdb_frames_batch.argtypes = [
        c_vp, c_i64, c_i64, ctypes.c_long, ctypes.c_long,
        ctypes.c_char_p, c_d, c_f, c_d, c_d, ctypes.c_long, c_i64,
    ]
    _LIB = L
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


_FASTPROPS = None
_FASTPROPS_TRIED = False


def fastprops():
    """The ``_pw_fastprops`` CPython extension module, or None.

    Unlike the ctypes library above this one needs the Python and numpy
    headers (it builds Python dicts directly — see
    ``_native/fastprops.cpp``), so it is compiled separately, on first
    use, and imported from its build path.  Callers fall back to the
    numpy implementation when unavailable.
    """
    global _FASTPROPS, _FASTPROPS_TRIED
    if _FASTPROPS is not None or _FASTPROPS_TRIED:
        return _FASTPROPS
    _FASTPROPS_TRIED = True
    import importlib.util
    import os
    import sysconfig
    import tempfile

    so = _so_path().parent / "_pw_fastprops.so"
    src = _NATIVE_DIR / "fastprops.cpp"
    if not so.is_file() or (
        src.is_file() and src.stat().st_mtime > so.stat().st_mtime
    ):
        fd, tmp = tempfile.mkstemp(
            suffix=".so", prefix="pw_fastprops_", dir=str(so.parent)
        )
        os.close(fd)
        try:
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-I", sysconfig.get_paths()["include"],
                    "-I", np.get_include(),
                    "-o", tmp, str(src),
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so)
        except (OSError, subprocess.SubprocessError) as exc:
            logger.info(
                "fastprops build unavailable (%s); using numpy path", exc
            )
            pathlib.Path(tmp).unlink(missing_ok=True)
            return None
    try:
        spec = importlib.util.spec_from_file_location(
            "_pw_fastprops", so
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    except (ImportError, OSError) as exc:  # pragma: no cover
        logger.info("fastprops failed to load (%s); using numpy path", exc)
        return None
    _FASTPROPS = mod
    return _FASTPROPS


def bfs_molecule(
    seed: int,
    unassigned: np.ndarray,
    coords: np.ndarray,
    cov: np.ndarray,
    heavy: np.ndarray,
    key_id: np.ndarray,
    scoords: np.ndarray | None,
    scov: np.ndarray | None,
    sheavy: np.ndarray | None,
    skey_id: np.ndarray | None,
    s_match_unit: np.ndarray | None,
    max_dist: float,
    tol: float,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native BFS for one molecule; returns (src, idx) arrays or None if
    the native library is unavailable.  ``unassigned`` is mutated."""
    L = lib()
    if L is None:
        return None
    n = len(coords)
    ns = 0 if scoords is None else len(scoords)
    if ns == 0:
        scoords = np.zeros((0, 3))
        scov = np.zeros(0)
        sheavy = np.zeros(0, dtype=np.uint8)
        skey_id = np.zeros(0, dtype=np.int64)
        s_match_unit = np.zeros(0, dtype=np.int64)
    cap = n + ns
    out_src = np.empty(cap, dtype=np.int32)
    out_idx = np.empty(cap, dtype=np.int64)
    if unassigned.dtype != np.uint8 or not unassigned.flags["C_CONTIGUOUS"]:
        msg = "unassigned must be a C-contiguous uint8 array (mutated in place)"
        raise TypeError(msg)
    got = L.pw_bfs_molecule(
        n,
        _ptr(np.ascontiguousarray(coords, dtype=np.float64), ctypes.c_double),
        _ptr(np.ascontiguousarray(cov, dtype=np.float64), ctypes.c_double),
        _ptr(np.ascontiguousarray(heavy, dtype=np.uint8), ctypes.c_uint8),
        _ptr(np.ascontiguousarray(key_id, dtype=np.int64), ctypes.c_int64),
        ns,
        _ptr(np.ascontiguousarray(scoords, dtype=np.float64), ctypes.c_double),
        _ptr(np.ascontiguousarray(scov, dtype=np.float64), ctypes.c_double),
        _ptr(np.ascontiguousarray(sheavy, dtype=np.uint8), ctypes.c_uint8),
        _ptr(np.ascontiguousarray(skey_id, dtype=np.int64), ctypes.c_int64),
        _ptr(
            np.ascontiguousarray(s_match_unit, dtype=np.int64),
            ctypes.c_int64,
        ),
        float(max_dist),
        float(tol),
        int(seed),
        _ptr(unassigned, ctypes.c_uint8),
        _ptr(out_src, ctypes.c_int32),
        _ptr(out_idx, ctypes.c_int64),
        cap,
    )
    if got < 0:  # pragma: no cover - capacity bound is n + ns
        return None
    return out_src[:got], out_idx[:got]


def decode_dlpoly_frame(
    raw: bytes, keytrj: int, has_cell: bool, n_atoms_hint: int
) -> (
    tuple[
        np.ndarray,
        np.ndarray,
        np.ndarray | None,
        np.ndarray | None,
        np.ndarray | None,
    ]
    | None
):
    """Native text decode of one HISTORY frame.

    Returns (atom_ids '<U8', coordinates (N,3), lattice (3,3) or None,
    velocities (N,3) or None, forces (N,3) or None) — velocities for
    keytrj >= 1, forces for keytrj == 2 (reference trajectory
    stride semantics: trajectory.py:712-766).  None when the native
    library is unavailable / parsing fails.
    """
    L = lib()
    if L is None:
        return None
    cap = max(n_atoms_hint, 1)
    ids = ctypes.create_string_buffer(cap * 9)
    xyz = np.empty((cap, 3), dtype=np.float64)
    cell = np.zeros((3, 3), dtype=np.float64)
    null_d = ctypes.cast(None, ctypes.POINTER(ctypes.c_double))
    vel = np.empty((cap, 3), dtype=np.float64) if keytrj >= 1 else None
    frc = np.empty((cap, 3), dtype=np.float64) if keytrj >= 2 else None
    got = L.pw_decode_dlpoly_frame(
        raw,
        len(raw),
        int(keytrj),
        int(bool(has_cell)),
        _ptr(cell, ctypes.c_double),
        ids,
        _ptr(xyz, ctypes.c_double),
        _ptr(vel, ctypes.c_double) if vel is not None else null_d,
        _ptr(frc, ctypes.c_double) if frc is not None else null_d,
        cap,
    )
    if got < 0:
        return None
    id_arr = np.frombuffer(ids.raw, dtype="S9", count=got).astype("<U8")
    lattice = cell.T if has_cell else None
    return (
        id_arr,
        xyz[:got].copy(),
        lattice,
        vel[:got].copy() if vel is not None else None,
        frc[:got].copy() if frc is not None else None,
    )


def decode_xyz_frame(
    raw: bytes, n_atoms_hint: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native decode of one XYZ trajectory frame body.

    Returns (atom_ids '<U8', coordinates (N,3)) or None when the native
    library is unavailable / parsing fails.  Header lines (count,
    remark) are skipped here and handled by the caller.
    """
    L = lib()
    if L is None:
        return None
    cap = max(n_atoms_hint, 1)
    ids = ctypes.create_string_buffer(cap * 9)
    xyz = np.empty((cap, 3), dtype=np.float64)
    got = L.pw_decode_xyz_frame(
        raw, len(raw), ids, _ptr(xyz, ctypes.c_double), cap
    )
    if got < 0:
        return None
    id_arr = np.frombuffer(ids.raw, dtype="S9", count=got).astype("<U8")
    return id_arr, xyz[:got].copy()


def map_history(buf: np.ndarray, cap_frames: int):
    """One-pass HISTORY map + integrity check (native).

    ``buf`` is a uint8 view of the file bytes (e.g. ``np.frombuffer``
    over an mmap — zero copy).  Returns ``(starts, ends, header_end,
    warn_flags)`` int64 arrays/ints, or None when the native library is
    unavailable.  Raises ValueError mirroring the reference's integrity
    errors (reference: trajectory.py:768-833): the caller converts to
    TrajectoryError with the exact message format.
    """
    L = lib()
    if L is None:
        return None
    cap = max(cap_frames, 1)
    starts = np.empty(cap, dtype=np.int64)
    ends = np.empty(cap, dtype=np.int64)
    header_end = np.zeros(1, dtype=np.int64)
    warn_flags = np.zeros(1, dtype=np.int64)
    err_line = np.zeros(1, dtype=np.int64)
    got = L.pw_map_history(
        buf.ctypes.data_as(ctypes.c_void_p),
        len(buf),
        _ptr(starts, ctypes.c_int64),
        _ptr(ends, ctypes.c_int64),
        cap,
        _ptr(header_end, ctypes.c_int64),
        _ptr(warn_flags, ctypes.c_int64),
        _ptr(err_line, ctypes.c_int64),
    )
    if got == -1:
        msg = f"empty:{int(err_line[0])}"
        raise ValueError(msg)
    if got == -2:
        msg = f"discontinuous:{int(err_line[0])}"
        raise ValueError(msg)
    if got < 0:  # capacity exceeded — caller's count was wrong
        return None
    return (
        starts[:got].copy(),
        ends[:got].copy(),
        int(header_end[0]),
        int(warn_flags[0]),
    )


def _decode_frames_batch(fn_name, buf, starts, ends, n_atoms, ref_ids,
                         vdw=None, extra=(), n_threads=None,
                         out64=None, out32=None):
    L = lib()
    if L is None:
        return None
    import os

    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    f = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    if out64 is not None:
        # caller-provided f64 store: must be a C-contiguous slice of
        # the sweep's (F, N, 3) array — decode writes straight into it
        assert out64.shape == (f, n_atoms, 3)
        assert out64.dtype == np.float64 and out64.flags.c_contiguous
        xyz = out64
    elif out32 is not None:
        # f32-only mode: no f64 store at all — the decoder parses into
        # a per-thread one-frame scratch (see batch_decode) and writes
        # only the pipeline-dtype copy.  Saves the per-slab (F, N, 3)
        # f64 allocation + its stream of cold-page writes on the
        # single-vCPU host.
        xyz = None
    else:
        xyz = np.empty((f, n_atoms, 3), dtype=np.float64)
    if out32 is not None:
        # fused pipeline-dtype copy, filled in the same decode pass
        assert out32.shape == (f, n_atoms, 3)
        assert out32.dtype == np.float32 and out32.flags.c_contiguous
    ids_match = np.zeros(1, dtype=np.int64)
    null_d = ctypes.cast(None, ctypes.POINTER(ctypes.c_double))
    null_f = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    maxd = None
    if vdw is not None:
        vdw = np.ascontiguousarray(vdw, dtype=np.float64)
        maxd = np.empty(f, dtype=np.float64)
    got = getattr(L, fn_name)(
        buf.ctypes.data_as(ctypes.c_void_p),
        _ptr(starts, ctypes.c_int64),
        _ptr(ends, ctypes.c_int64),
        f,
        *extra,
        n_atoms,
        ref_ids,
        _ptr(xyz, ctypes.c_double) if xyz is not None else null_d,
        _ptr(out32, ctypes.c_float) if out32 is not None else null_f,
        _ptr(vdw, ctypes.c_double) if vdw is not None else null_d,
        _ptr(maxd, ctypes.c_double) if maxd is not None else null_d,
        n_threads,
        _ptr(ids_match, ctypes.c_int64),
    )
    if got < 0:
        return None
    return xyz, bool(ids_match[0]), maxd


def decode_dlpoly_frames_batch(
    buf: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    keytrj: int,
    has_cell: bool,
    n_atoms: int,
    ref_ids: bytes,
    vdw: np.ndarray | None = None,
    n_threads: int | None = None,
    out64: np.ndarray | None = None,
    out32: np.ndarray | None = None,
):
    """Threaded whole-sweep HISTORY decode
    -> ((F, N, 3) f64, ids_match, per-frame maxd or None).

    ``ref_ids`` is frame 0's atom-id block (``ids.astype('S9').tobytes()``);
    ``ids_match`` is True when every frame's ids equal it — the
    precondition for sharing one deciphered element array across the
    sweep.  With ``vdw`` (per-atom radii) the exact vdW-corrected
    maximum diameter per frame is computed too (bitwise equal to
    ``max_dim_host``).  Returns None on parse failure / unavailable
    library (the caller falls back to the per-frame Python path).  The
    ctypes call releases the GIL, so the decode overlaps device compute.
    """
    return _decode_frames_batch(
        "pw_decode_dlpoly_frames_batch", buf, starts, ends, n_atoms,
        ref_ids, vdw=vdw, extra=(int(keytrj), int(bool(has_cell))),
        n_threads=n_threads, out64=out64, out32=out32,
    )


def decode_xyz_frames_batch(
    buf, starts, ends, n_atoms, ref_ids, vdw=None, n_threads=None,
    out64=None, out32=None,
):
    """Threaded whole-sweep XYZ-trajectory decode; see
    :func:`decode_dlpoly_frames_batch`."""
    return _decode_frames_batch(
        "pw_decode_xyz_frames_batch", buf, starts, ends, n_atoms,
        ref_ids, vdw=vdw, n_threads=n_threads, out64=out64,
        out32=out32,
    )


def decode_pdb_frames_batch(
    buf, starts, ends, n_atoms, ref_ids, vdw=None, n_threads=None,
    out64=None, out32=None,
):
    """Threaded whole-sweep PDB-trajectory decode; see
    :func:`decode_dlpoly_frames_batch`.  Per-frame CRYST1 cells are
    ignored (the fast sweep path never rebuilds)."""
    return _decode_frames_batch(
        "pw_decode_pdb_frames_batch", buf, starts, ends, n_atoms,
        ref_ids, vdw=vdw, n_threads=n_threads, out64=out64,
        out32=out32,
    )


def decode_pdb_frame(
    raw: bytes, n_atoms_hint: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None] | None:
    """Native decode of one PDB trajectory frame.

    Returns (atom_ids '<U8' from the atom-name columns, coordinates
    (N,3), CRYST1 (6,) or None) or None when unavailable / parse error.
    """
    L = lib()
    if L is None:
        return None
    cap = max(n_atoms_hint, 1)
    ids = ctypes.create_string_buffer(cap * 9)
    xyz = np.empty((cap, 3), dtype=np.float64)
    cryst = np.zeros(6, dtype=np.float64)
    has_cryst = ctypes.c_long(0)
    got = L.pw_decode_pdb_frame(
        raw, len(raw), ids, _ptr(xyz, ctypes.c_double),
        _ptr(cryst, ctypes.c_double), ctypes.byref(has_cryst), cap
    )
    if got < 0:
        return None
    id_arr = np.frombuffer(ids.raw, dtype="S9", count=got).astype("<U8")
    return (
        id_arr,
        xyz[:got].copy(),
        cryst if has_cryst.value else None,
    )
