"""DL_POLY trajectory engine tests on HISTORY_singlemol_short
(20 frames x 168 atoms, keytrj=0, imcon=0)."""

import json

import numpy as np
import pytest

import pywindow_tpu as pw
from pywindow_tpu.trajectory import TrajectoryError
from tests.conftest import DATA

HISTORY = DATA / "HISTORY_singlemol_short"


@pytest.fixture(scope="module")
def traj():
    return pw.DLPOLY(HISTORY)


def test_mapping(traj):
    assert traj.no_of_frames == 20
    assert traj.no_of_atoms == 168
    assert traj.periodic_boundary == "nonperiodic"
    assert traj.content_type == "coordinates"


def test_get_frame(traj):
    frames = traj.get_frames(0)
    molsys = frames[0]
    assert len(molsys.system["atom_ids"]) == 168
    assert molsys.system["coordinates"].shape == (168, 3)
    # processed request bypasses the cache (OPLS keys, conflicting 'he'
    # swapped to H - reference: examples/example_7.py:33-37)
    processed = traj.get_frames(
        0, swap_atoms={"he": "H"}, forcefield="OPLS"
    )[0]
    assert set(processed.system["elements"]) <= {"C", "H", "N", "Ni"}
    # the cached bare frame is untouched
    assert "elements" not in traj.frames[0].system


def test_get_frames_ranges(traj):
    assert sorted(traj.get_frames([1, 3])) == [1, 3]
    assert sorted(traj.get_frames((4, 6))) == [4, 5]
    raw = traj.get_frames(7, extract_data=False, override=True)
    assert isinstance(raw[7], str) and "timestep" in raw[7]


@pytest.mark.slow
def test_analysis_and_resume(traj, tmp_path):
    traj.analysis_output = {}
    traj.analysis(frames=[0, 1], forcefield="opls", swap_atoms={"he": "H"})
    assert sorted(traj.analysis_output) == [0, 1]
    props = traj.analysis_output[0]["0"]
    assert props["pore_diameter"]["diameter"] > 0
    assert props["windows"]["diameters"] is not None
    # resume: already-analysed frames skipped (marker object unchanged)
    marker = traj.analysis_output[0]
    traj.analysis(frames=[0, 2], forcefield="opls", swap_atoms={"he": "H"})
    assert traj.analysis_output[0] is marker
    assert 2 in traj.analysis_output
    # save
    out = tmp_path / "analysis.json"
    traj.save_analysis(out)
    data = json.load(open(out))
    assert set(data) == {"0", "1", "2"}


def test_frame_independence_matches_single(traj):
    """Frame 0 analysed via trajectory == analysed via Molecule API."""
    traj.analysis(frames=[0], forcefield="opls", swap_atoms={"he": "H"})
    molsys = traj.get_frames(
        0, swap_atoms={"he": "H"}, forcefield="OPLS"
    )[0]
    mol = molsys.system_to_molecule()
    props = mol.full_analysis()
    traj_props = traj.analysis_output[0]["0"]
    assert props["pore_diameter"]["diameter"] == pytest.approx(
        traj_props["pore_diameter"]["diameter"], abs=1e-10
    )


def test_save_frames(traj, tmp_path):
    traj.save_frames(0, tmp_path / "f.pdb", forcefield="opls", swap_atoms={"he": "H"})
    text = (tmp_path / "f_0.pdb").read_text()
    assert text.count("ATOM") == 168


def test_discontinuous_history_rejected(tmp_path):
    bad = tmp_path / "HISTORY_bad"
    text = HISTORY.read_text()
    # rewind a later frame's timestep to break monotonicity
    assert "timestep    146857" in text
    bad.write_text(
        text.replace("timestep    146857", "timestep         1")
    )
    with pytest.raises(TrajectoryError):
        pw.DLPOLY(bad)


def test_xyz_trajectory_roundtrip(tmp_path, traj):
    """Write frames as an XYZ trajectory, read back with pw.XYZ."""
    sys0 = traj.get_frames(0, override=True)[0].system
    sys1 = traj.get_frames(1)[1].system
    out = tmp_path / "two.xyz"
    blocks = []
    for s in (sys0, sys1):
        lines = [str(len(s["atom_ids"])), "frame"]
        lines += [
            f"{el} {x:.6f} {y:.6f} {z:.6f}"
            for el, (x, y, z) in zip(s["atom_ids"], s["coordinates"])
        ]
        blocks.append("\n".join(lines))
    out.write_text("\n".join(blocks) + "\n")
    xyz = pw.XYZ(out)
    assert xyz.no_of_frames == 2
    f1 = xyz.get_frames(1)[1]
    np.testing.assert_allclose(
        f1.system["coordinates"], sys1["coordinates"], atol=1e-5
    )


@pytest.mark.slow
def test_xyz_trajectory_batched(tmp_path, traj):
    sys0 = traj.get_frames(0, override=True)[0].system
    out = tmp_path / "batched.xyz"
    blocks = []
    for _ in range(3):
        lines = [str(len(sys0["atom_ids"])), "frame"]
        lines += [
            f"{el} {x:.6f} {y:.6f} {z:.6f}"
            for el, (x, y, z) in zip(
                sys0["atom_ids"], sys0["coordinates"]
            )
        ]
        blocks.append("\n".join(lines))
    out.write_text("\n".join(blocks) + "\n")
    xyz = pw.XYZ(out)
    xyz.analysis_batched(
        frames="all", forcefield="opls", swap_atoms={"he": "H"}
    )
    assert sorted(xyz.analysis_output) == [0, 1, 2]
    d = xyz.analysis_output[1]["0"]["pore_diameter"]["diameter"]
    assert d == pytest.approx(4.8527, abs=0.01)


@pytest.mark.slow
def test_exact_sizes_batched_matches_serial(tmp_path):
    t1 = pw.DLPOLY(HISTORY)
    t1.analysis_batched(
        frames=[0, 5], exact_sizes=True,
        forcefield="opls", swap_atoms={"he": "H"},
    )
    t2 = pw.DLPOLY(HISTORY)
    t2.analysis(frames=[0, 5], forcefield="opls", swap_atoms={"he": "H"})
    # Tolerances: XLA's CPU codegen contracts mul-add chains into FMAs
    # differently inside vmapped vs unvmapped fusion clusters (verified:
    # identical inputs to the 3x3 subspace solve return 1-ulp-different
    # results per layout), and the kink-riding L-BFGS-B amplifies that
    # 1 ulp through branch flips to ~1e-9 in the pore centre and ~1e-4
    # in window diameters.  Both paths sit well inside the golden
    # contract (<0.01 A; scipy releases themselves disagree at 1e-2 on
    # kink ridges) — bitwise batched==serial is not achievable across
    # compilation layouts.  See docs/design.md "Batched vs serial".
    for f in (0, 5):
        a = t1.analysis_output[f]["0"]
        b = t2.analysis_output[f]["0"]
        assert a["pore_diameter"]["diameter"] == pytest.approx(
            b["pore_diameter"]["diameter"], abs=1e-6
        )
        assert a["average_diameter"] == pytest.approx(
            b["average_diameter"], abs=1e-6
        )
        assert len(a["windows"]["diameters"]) == len(
            b["windows"]["diameters"]
        )
        np.testing.assert_allclose(
            np.sort(a["windows"]["diameters"]),
            np.sort(b["windows"]["diameters"]),
            atol=2e-3,
        )


# --- keytrj 1/2: velocities and forces (reference trajectory.py:712-766)


def _write_history(path, keytrj, imcon=0, nframes=2, natms=4):
    """Synthetic HISTORY with hand-computable per-line values:
    coord  = f*10 + i + 0.1*k
    vel    = 100 + f*10 + i + 0.1*k   (keytrj >= 1)
    force  = 200 + f*10 + i + 0.1*k   (keytrj == 2)
    for frame f, atom i, component k."""
    names = ["ni", "ca", "o2", "h1", "c7", "n3"][:natms]
    lines = [
        "DLFIELD synthetic keytrj test history",
        f"{keytrj:>10}{imcon:>10}{natms:>10}",
    ]
    for f in range(nframes):
        lines.append(
            f"timestep{100 + f:>10}{natms:>10}{keytrj:>10}{imcon:>10}"
            "    0.000700"
        )
        if imcon in (1, 2, 3):
            for r in range(3):
                lines.append(
                    "  ".join(
                        f"{(30.0 + f if r == c else 0.0):12.6f}"
                        for c in range(3)
                    )
                )
        for i in range(natms):
            lines.append(f"{names[i]:<8}{i + 1:>10}  12.000000   0.000000")
            for base in (0.0, 100.0, 200.0)[: keytrj + 1]:
                lines.append(
                    "  ".join(
                        f"{base + f * 10 + i + 0.1 * k:14.6f}"
                        for k in range(3)
                    )
                )
    path.write_text("\n".join(lines) + "\n")


def _expected(base, f, natms):
    return np.array(
        [[base + f * 10 + i + 0.1 * k for k in range(3)]
         for i in range(natms)]
    )


@pytest.mark.parametrize("keytrj", [1, 2])
@pytest.mark.parametrize("imcon", [0, 2])
def test_keytrj_velocities_forces(tmp_path, keytrj, imcon):
    path = tmp_path / "HISTORY_kt"
    _write_history(path, keytrj=keytrj, imcon=imcon)
    t = pw.DLPOLY(path)
    assert t.no_of_frames == 2
    assert t.no_of_atoms == 4
    expected_type = {
        1: "coordinates and velocities",
        2: "coordinates, velocities and forces",
    }[keytrj]
    assert t.content_type == expected_type
    for f in (0, 1):
        sys_ = t.get_frames(f, override=True)[f].system
        assert list(sys_["atom_ids"]) == ["ni", "ca", "o2", "h1"]
        np.testing.assert_array_equal(
            sys_["coordinates"], _expected(0.0, f, 4)
        )
        np.testing.assert_array_equal(
            sys_["velocities"], _expected(100.0, f, 4)
        )
        if keytrj == 2:
            np.testing.assert_array_equal(
                sys_["forces"], _expected(200.0, f, 4)
            )
        else:
            assert "forces" not in sys_
        if imcon == 2:
            np.testing.assert_allclose(
                np.diag(sys_["lattice"]), 30.0 + f
            )


@pytest.mark.parametrize("keytrj", [1, 2])
def test_keytrj_native_matches_python(tmp_path, keytrj, monkeypatch):
    """The C++ decoder and the Python stride fallback must agree on
    every array, and the native path must actually engage."""
    from pywindow_tpu import native

    path = tmp_path / "HISTORY_kt"
    _write_history(path, keytrj=keytrj, imcon=2, nframes=1, natms=5)
    t = pw.DLPOLY(path)

    raw = t._frame_slice(0).decode("utf-8")
    got = native.decode_dlpoly_frame(
        raw.encode(), keytrj=keytrj, has_cell=True, n_atoms_hint=5
    )
    assert got is not None, "native decoder must be available here"
    native_out = t._decode_raw(raw)

    monkeypatch.setattr(native, "decode_dlpoly_frame",
                        lambda *a, **k: None)
    python_out = t._decode_raw(raw)

    assert list(native_out["atom_ids"]) == list(python_out["atom_ids"])
    for key in ("coordinates", "velocities", "lattice") + (
        ("forces",) if keytrj == 2 else ()
    ):
        np.testing.assert_array_equal(native_out[key], python_out[key])


@pytest.mark.slow
def test_varying_n_trajectory_buckets_by_pad(tmp_path, monkeypatch):
    """A mixed-size sweep groups frames by padded atom count: every
    dispatched sub-batch is homogeneous (no max-padding small frames to
    the largest member, one XLA program per bucket) and per-frame
    results still match the serial path."""
    import pywindow_tpu.parallel.batch as pb
    from pywindow_tpu.config import pad_multiple
    from pywindow_tpu.ops.encoding import round_up
    from tests.conftest import load_xyz

    cc3_e, cc3_c = load_xyz(DATA / "PUDXES.xyz")       # 168 atoms
    yaq_e, yaq_c = load_xyz(DATA / "YAQHOQ.xyz")       # 60 atoms

    def xyz_block(elements, coords):
        lines = [str(len(elements)), "frame"]
        lines += [
            f"{el} {x:.6f} {y:.6f} {z:.6f}"
            for el, (x, y, z) in zip(elements, coords)
        ]
        return "\n".join(lines)

    out = tmp_path / "mixed.xyz"
    blocks = [
        xyz_block(cc3_e, cc3_c),
        xyz_block(yaq_e, yaq_c),
        xyz_block(cc3_e, cc3_c + 0.01),
        xyz_block(yaq_e, yaq_c + 0.01),
    ]
    out.write_text("\n".join(blocks) + "\n")

    calls = []
    orig = pb.dispatch_batch

    def spy(systems, *a, **kw):
        calls.append(
            (
                sorted({len(e) for e, _ in systems}),
                kw.get("pad_atoms"),
            )
        )
        return orig(systems, *a, **kw)

    # analysis_batched imports dispatch_batch at call time from this
    # module, so one patch point suffices
    monkeypatch.setattr(pb, "dispatch_batch", spy)

    traj = pw.XYZ(out)
    traj.analysis_batched(frames="all", batch_size=4, forcefield="DLF")

    assert calls, "the spy must have observed dispatches"
    pad = pad_multiple()
    for atom_counts, pad_atoms in calls:
        padded = {round_up(n, pad) for n in atom_counts}
        assert len(padded) == 1, f"mixed pad bucket dispatched: {calls}"
        assert pad_atoms == padded.pop()

    # correctness vs the serial path (sampling sizes are pinned to the
    # largest member in the default mode -> log-boundary tolerance)
    serial = pw.XYZ(out)
    serial.analysis(frames="all", forcefield="DLF")
    for f in range(4):
        a = traj.analysis_output[f]["0"]
        b = serial.analysis_output[f]["0"]
        assert a["pore_diameter"]["diameter"] == pytest.approx(
            b["pore_diameter"]["diameter"], abs=0.01
        )
        if b["windows"]["diameters"] is None:
            assert a["windows"]["diameters"] is None
        else:
            assert len(a["windows"]["diameters"]) == len(
                b["windows"]["diameters"]
            )


def test_xyz_native_decode_matches_python(tmp_path, monkeypatch):
    from pywindow_tpu import native
    from tests.conftest import load_xyz

    elements, coords = load_xyz(DATA / "PUDXES.xyz")
    lines = [str(len(elements)), "remark line here"]
    lines += [
        f"{el} {x:.6f} {y:.6f} {z:.6f}"
        for el, (x, y, z) in zip(elements, coords)
    ]
    out = tmp_path / "one.xyz"
    out.write_text("\n".join(lines) + "\n")
    xyz = pw.XYZ(out)

    raw = xyz._frame_slice(0).decode("utf-8")
    got = native.decode_xyz_frame(raw.encode(), n_atoms_hint=len(elements))
    assert got is not None, "native decoder must be available here"
    native_out = xyz._decode_raw(raw)

    monkeypatch.setattr(native, "decode_xyz_frame", lambda *a, **k: None)
    python_out = xyz._decode_raw(raw)

    assert list(native_out["atom_ids"]) == list(python_out["atom_ids"])
    np.testing.assert_array_equal(
        native_out["coordinates"], python_out["coordinates"]
    )
    assert (
        native_out["frame_info"]["remarks"]
        == python_out["frame_info"]["remarks"]
    )


def test_pdb_native_decode_matches_python(monkeypatch):
    from pywindow_tpu import native

    traj = pw.PDB(DATA / "system_periodic.pdb")
    raw = traj._frame_slice(0).decode("utf-8")

    cap = raw.count("\n") + 1
    got = native.decode_pdb_frame(raw.encode(), n_atoms_hint=cap)
    assert got is not None, "native decoder must be available here"
    native_out = traj._decode_raw_pdb(raw)

    monkeypatch.setattr(native, "decode_pdb_frame", lambda *a, **k: None)
    python_out = traj._decode_frame(raw.split("\n"))

    assert list(native_out["atom_ids"]) == list(python_out["atom_ids"])
    np.testing.assert_array_equal(
        native_out["coordinates"], python_out["coordinates"]
    )
    if "CRYST1" in python_out:
        np.testing.assert_array_equal(
            native_out["CRYST1"], python_out["CRYST1"]
        )
        np.testing.assert_array_equal(
            native_out["lattice"], python_out["lattice"]
        )


@pytest.mark.slow
def test_pdb_trajectory_batched_with_rebuild(tmp_path):
    """PDB trajectory: the batched sweep with per-frame modular rebuild
    must match the serial path per molecule."""
    base = (DATA / "system_periodic.pdb").read_text()
    frame = base[: base.rindex("END")] + "END\n"
    trajfile = tmp_path / "ptraj.pdb"
    trajfile.write_text(frame * 3)

    t1 = pw.PDB(trajfile)
    t1.analysis_batched(
        frames="all", batch_size=2, modular=True, rebuild=True,
        forcefield="DLF",
    )
    t2 = pw.PDB(trajfile)
    t2.analysis(frames=[1], modular=True, rebuild=True, forcefield="DLF")

    assert sorted(t1.analysis_output) == [0, 1, 2]
    a, b = t1.analysis_output[1], t2.analysis_output[1]
    assert len(a) == len(b) == 8
    for key in b:
        assert a[key]["pore_diameter_opt"]["diameter"] == pytest.approx(
            b[key]["pore_diameter_opt"]["diameter"], abs=1e-6
        )


# --- whole-sweep native fast path (round 3) --------------------------------


def test_native_map_matches_python_map():
    """The C++ one-pass mapper must agree with the Python pair."""
    from pywindow_tpu import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t_native = pw.DLPOLY(HISTORY)
    t_python = pw.DLPOLY(HISTORY)
    # rebuild the map through the Python path on the same instance
    t_python._check_history()
    t_python._map_history()
    assert t_native.no_of_frames == t_python.no_of_frames
    assert t_native.trajectory_map == t_python.trajectory_map
    assert t_native.check_log == t_python.check_log
    assert t_native.no_of_atoms == t_python.no_of_atoms
    assert t_native.periodic_boundary == t_python.periodic_boundary
    assert t_native.content_type == t_python.content_type


def test_native_map_empty_line_rejected(tmp_path):
    bad = tmp_path / "HISTORY_empty_line"
    text = HISTORY.read_text()
    lines = text.split("\n")
    lines.insert(10, "")
    bad.write_text("\n".join(lines))
    with pytest.raises(TrajectoryError, match="empty line"):
        pw.DLPOLY(bad)


def test_sweep_decode_native_matches_per_frame():
    """Native whole-sweep decode: coords bitwise equal to the per-frame
    path, exact f64 per-frame max diameters, constant-ids detection."""
    from pywindow_tpu import native
    from pywindow_tpu.ops.analysis import max_dim_host

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t = pw.DLPOLY(HISTORY)
    todo = list(range(t.no_of_frames))
    got = t._sweep_decode_native(todo, {"he": "H"}, "OPLS")
    assert got is not None
    elements, coords, maxd = got
    assert coords.shape == (20, 168, 3)
    for f in (0, 7, 19):
        molsys = t._get_frame(
            frame_no=f, swap_atoms={"he": "H"}, forcefield="OPLS"
        )
        mol = molsys.system_to_molecule()
        assert (np.asarray(mol.elements) == elements).all()
        np.testing.assert_array_equal(
            np.asarray(mol.coordinates), coords[f]
        )
        # the native f64 scan is bitwise equal to max_dim_host
        assert maxd[f] == max_dim_host(elements, coords[f])


@pytest.mark.slow
def test_fast_sweep_matches_generic_batched():
    """With a pinned sampling reference the fast path is bitwise equal
    to the generic per-frame-decode batched path."""
    from pywindow_tpu import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t1 = pw.DLPOLY(HISTORY)
    t2 = pw.DLPOLY(HISTORY)
    t2._sweep_batch_fn = lambda: None  # force generic (blocks stream + fast)
    kw = dict(
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=8,
        reference_max_diameter=23.6,
    )
    t1.analysis_batched(**kw)
    t2.analysis_batched(**kw)
    assert sorted(t1.analysis_output) == sorted(t2.analysis_output)
    for f in t1.analysis_output:
        a, b = t1.analysis_output[f]["0"], t2.analysis_output[f]["0"]
        assert a.keys() == b.keys()
        assert (
            a["pore_diameter"]["diameter"] == b["pore_diameter"]["diameter"]
        )
        assert a["average_diameter"] == b["average_diameter"]
        assert a["no_of_atoms"] == b["no_of_atoms"]
        np.testing.assert_array_equal(
            a["centre_of_mass"], b["centre_of_mass"]
        )
        wa, wb = a["windows"]["diameters"], b["windows"]["diameters"]
        if wb is None:
            assert wa is None
        else:
            np.testing.assert_array_equal(np.sort(wa), np.sort(wb))


@pytest.mark.slow
def test_fast_sweep_exact_sizes_matches_serial():
    """Fast-path exact_sizes: same per-frame sampling sizes as the
    serial path (same tolerance rationale as
    test_exact_sizes_batched_matches_serial)."""
    from pywindow_tpu import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t1 = pw.DLPOLY(HISTORY)
    t1.analysis_batched(
        frames=[0, 5], exact_sizes=True,
        forcefield="opls", swap_atoms={"he": "H"},
    )
    t2 = pw.DLPOLY(HISTORY)
    t2.analysis(frames=[0, 5], forcefield="opls", swap_atoms={"he": "H"})
    for f in (0, 5):
        a = t1.analysis_output[f]["0"]
        b = t2.analysis_output[f]["0"]
        assert a["pore_diameter"]["diameter"] == pytest.approx(
            b["pore_diameter"]["diameter"], abs=1e-6
        )
        np.testing.assert_allclose(
            np.sort(a["windows"]["diameters"]),
            np.sort(b["windows"]["diameters"]),
            atol=2e-3,
        )


@pytest.mark.slow
def test_fast_sweep_xyz_and_resume(tmp_path):
    """XYZ fast path: equality with generic + autosave/resume."""
    from pywindow_tpu import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t0 = pw.DLPOLY(HISTORY)
    sys0 = t0.get_frames(0, override=True)[0].system
    out = tmp_path / "sweep.xyz"
    blocks = []
    for f in range(4):
        s = t0.get_frames(f)[f].system
        lines = [str(len(s["atom_ids"])), f"frame {f}"]
        lines += [
            f"{el} {x:.6f} {y:.6f} {z:.6f}"
            for el, (x, y, z) in zip(s["atom_ids"], s["coordinates"])
        ]
        blocks.append("\n".join(lines))
    out.write_text("\n".join(blocks) + "\n")
    del sys0

    save = tmp_path / "autosave.json"
    t1 = pw.XYZ(out)
    t1.analysis_batched(
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=2,
        reference_max_diameter=23.6, autosave=save, autosave_every=1,
    )
    assert save.exists()
    t2 = pw.XYZ(out)
    t2._sweep_batch_fn = lambda: None  # force generic
    t2.analysis_batched(
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=2,
        reference_max_diameter=23.6,
    )
    for f in range(4):
        a, b = t1.analysis_output[f]["0"], t2.analysis_output[f]["0"]
        assert (
            a["pore_diameter"]["diameter"] == b["pore_diameter"]["diameter"]
        )
        wa, wb = a["windows"]["diameters"], b["windows"]["diameters"]
        if wb is None:
            assert wa is None
        else:
            np.testing.assert_array_equal(np.sort(wa), np.sort(wb))
    # resume: reload the autosave into a fresh object, nothing re-runs
    t3 = pw.XYZ(out)
    t3.load_analysis(save)
    marker = t3.analysis_output[0]
    t3.analysis_batched(
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=2,
        reference_max_diameter=23.6,
    )
    assert t3.analysis_output[0] is marker


@pytest.mark.slow
def test_fast_sweep_pdb_matches_generic(tmp_path):
    """PDB fast path (non-modular) equality with the generic path."""
    from pywindow_tpu import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t0 = pw.DLPOLY(HISTORY)
    frames = []
    for f in range(3):
        s = t0.get_frames(f, override=True)[f].system
        lines = []
        for i, (el, (x, y, z)) in enumerate(
            zip(s["atom_ids"], s["coordinates"])
        ):
            lines.append(
                f"HETATM{i + 1:>5} {el:<4} MOL A{1:>4}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}"
                f"          {el:>2}"
            )
        lines.append("END")
        frames.append("\n".join(lines))
    out = tmp_path / "sweep.pdb"
    out.write_text("\n".join(frames) + "\n")

    t1 = pw.PDB(out)
    t1.analysis_batched(
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=2,
        reference_max_diameter=23.6,
    )
    t2 = pw.PDB(out)
    t2._sweep_batch_fn = lambda: None  # force generic
    t2.analysis_batched(
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=2,
        reference_max_diameter=23.6,
    )
    for f in range(3):
        a, b = t1.analysis_output[f]["0"], t2.analysis_output[f]["0"]
        assert (
            a["pore_diameter"]["diameter"] == b["pore_diameter"]["diameter"]
        )
        wa, wb = a["windows"]["diameters"], b["windows"]["diameters"]
        if wb is None:
            assert wa is None
        else:
            np.testing.assert_array_equal(np.sort(wa), np.sort(wb))


@pytest.mark.slow
def test_sweep_stream_escalation_matches_uniform(caplog):
    """A later slab that escalates the discrete sampling sizes restarts
    the streamed sweep; final results are bitwise equal to the
    decode-everything-first sweep."""
    import logging

    from pywindow_tpu import native
    from pywindow_tpu.config import DEFAULT_CONFIG
    from pywindow_tpu.ops.analysis import max_dim_host, static_sizes
    from pywindow_tpu.parallel.batch import sweep_stream, sweep_uniform

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t = pw.DLPOLY(HISTORY)
    got = t._sweep_decode_native(list(range(4)), {"he": "H"}, "OPLS")
    el, co, _ = got
    # second half scaled up: a larger maximum diameter that flips the
    # discrete sampling sizes between slab 1 and slab 2.  Each half is
    # one full device-padded chunk (8 virtual devices in the harness),
    # so the streamed sweep delivers chunk 1 BEFORE the escalation is
    # detected — exercising the pre-escalation checkpoint gate.
    half = np.concatenate([co, co])
    coords = np.concatenate([half, half * 1.35])
    maxd = np.array([max_dim_host(el, c) for c in coords])
    assert static_sizes(float(maxd[:8].max()), DEFAULT_CONFIG) != (
        static_sizes(float(maxd.max()), DEFAULT_CONFIG)
    )

    got_u: dict = {}
    got_s: dict = {}
    sweep_uniform(
        el, coords, maxd,
        lambda part, res: got_u.update(zip(map(int, part), res)),
        batch_size=8,
    )
    gate: dict = {"final": False}
    gate_log: list = []

    def rec_s(part, res):
        got_s.update(zip(map(int, part), res))
        gate_log.append(bool(gate["final"]))

    with caplog.at_level(logging.INFO, logger="pywindow_tpu"):
        sweep_stream(
            el, len(coords),
            lambda lo, hi: (coords[lo:hi], maxd[lo:hi]),
            rec_s,
            batch_size=8,
            size_gate=gate,
        )
    assert any("escalated mid-stream" in r.message for r in caplog.records)
    assert sorted(got_s) == list(range(len(coords)))
    # checkpoint gate: pre-escalation deliveries are flagged non-final
    # (autosave suppressed), the final pass flips to final and stays
    assert gate_log[0] is False and gate_log[-1] is True
    first_true = gate_log.index(True)
    assert all(gate_log[first_true:])
    for f in got_u:
        a, b = got_u[f], got_s[f]
        assert (
            a["pore_diameter"]["diameter"] == b["pore_diameter"]["diameter"]
        )
        assert a["average_diameter"] == b["average_diameter"]
        wa, wb = a["windows"]["diameters"], b["windows"]["diameters"]
        if wb is None:
            assert wa is None
        else:
            np.testing.assert_array_equal(np.sort(wa), np.sort(wb))


@pytest.mark.slow
def test_stream_decode_failure_falls_back_to_generic(tmp_path):
    """Atom ids diverging in a later frame abort the streamed sweep
    mid-flight; analysis_batched falls back to the generic per-frame
    path and still produces every frame's results."""
    from pywindow_tpu import native

    if native.lib() is None:
        pytest.skip("native library unavailable")
    t0 = pw.DLPOLY(HISTORY)
    blocks = []
    for f in range(4):
        s = t0.get_frames(f, override=True)[f].system
        ids = list(s["atom_ids"])
        if f >= 2:
            # swap two different ids: frame 2+ diverges from frame 0's
            # id block but still deciphers frame-locally
            i_c = ids.index("ca")
            i_n = ids.index("ni")
            ids[i_c], ids[i_n] = ids[i_n], ids[i_c]
        lines = [str(len(ids)), f"frame {f}"]
        lines += [
            f"{el} {x:.6f} {y:.6f} {z:.6f}"
            for el, (x, y, z) in zip(ids, s["coordinates"])
        ]
        blocks.append("\n".join(lines))
    out = tmp_path / "diverge.xyz"
    out.write_text("\n".join(blocks) + "\n")
    t = pw.XYZ(out)
    t.analysis_batched(
        swap_atoms={"he": "H"}, forcefield="OPLS", batch_size=2,
        reference_max_diameter=23.6,
    )
    assert sorted(t.analysis_output) == list(range(4))
    for f in range(4):
        props = t.analysis_output[f]["0"]
        assert props["maximum_diameter"]["diameter"] > 0
