"""Native C++ core: parity with the pure-numpy reference paths."""

import numpy as np
import pytest

import pywindow_tpu as pw
from pywindow_tpu import native
from pywindow_tpu.ops.cell import create_supercell
from pywindow_tpu.ops.rebuild import discrete_molecules
from tests.conftest import DATA

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native library unavailable"
)


@pytest.mark.parametrize("do_rebuild", [False, True])
def test_native_bfs_matches_numpy(do_rebuild):
    system = pw.Input().load_file(DATA / "system_periodic.pdb")
    sc = create_supercell(system) if do_rebuild else None
    a = discrete_molecules(system, rebuild=sc, use_native=True)
    b = discrete_molecules(system, rebuild=sc, use_native=False)
    assert len(a) == len(b)
    for ma, mb in zip(a, b):
        np.testing.assert_array_equal(ma["elements"], mb["elements"])
        np.testing.assert_array_equal(ma["coordinates"], mb["coordinates"])
        np.testing.assert_array_equal(ma["atom_ids"], mb["atom_ids"])


def test_native_dlpoly_decode_matches_python():
    traj = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    raw = traj._frame_slice(7).decode("utf-8")
    fast = traj._decode_raw(raw)
    slow = traj._decode_frame(
        [ln.split() for ln in raw.split("\n")][:-1]
    )
    assert fast["frame_info"] == slow["frame_info"]
    np.testing.assert_array_equal(fast["atom_ids"], slow["atom_ids"])
    np.testing.assert_array_equal(
        fast["coordinates"], slow["coordinates"]
    )


def test_native_float_parse_fuzz(tmp_path):
    """The decoder's fast float parse must be bitwise strtod-equal on
    nasty inputs: long mantissas (fallback), big/small exponents
    (fallback), leading zeros, bare integers, trailing dots."""
    rng = np.random.default_rng(20260817)
    nasty = [
        "0.0", "-0.0", "1", "-1.", "+2.5", "0.00001234",
        "9007199254740993.0",          # > 2^53: fallback path
        "1.23456789012345678901e10",   # 17+ digits: fallback
        "6.02e23", "-1.5e-25",         # |net| > 22: fallback
        "12345678901234567890",        # long integer: fallback
        "3.0000000000000004", "1e0", "1E+00", "-7.25E-03",
    ]
    vals = [f"{rng.uniform(-1e4, 1e4):.4E}" for _ in range(60)]
    vals += [f"{rng.uniform(-1, 1):.17f}" for _ in range(30)]
    vals += nasty
    n = len(vals) // 3
    vals = vals[: n * 3]

    lines = [f"{n}", "remark"]
    for a in range(n):
        x, y, z = vals[3 * a : 3 * a + 3]
        lines.append(f"C {x} {y} {z}")
    path = tmp_path / "fuzz.xyz"
    path.write_text("\n".join(lines) + "\n")

    import pywindow_tpu as pw

    traj = pw.XYZ(path)
    raw = traj._frame_slice(0).decode("utf-8")
    fast = traj._decode_raw(raw)  # native parser
    expected = np.array(
        [float(v) for v in vals], dtype=np.float64
    ).reshape(n, 3)
    np.testing.assert_array_equal(fast["coordinates"], expected)


def test_native_frame_max_dim_pruned_matches_full():
    """The pruned maximum-diameter scan must be bitwise equal to the
    full O(N^2) python scan on real and random frames."""
    from pywindow_tpu.ops.analysis import max_dim_host

    traj = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    frames = list(range(traj.no_of_frames))
    el, xyz, maxd = traj._sweep_decode_native(
        frames, {"he": "H"}, "OPLS"
    )
    for i in frames:
        assert maxd[i] == max_dim_host(el, xyz[i]), i


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_props_dicts_matches_numpy(dtype, caplog):
    """The C properties-dict converter (_pw_fastprops) must produce
    value-, dtype- AND type-identical dicts to the numpy fallback on
    every branch (no-windows, masked slots, failed/negative warnings,
    all three escalation markers)."""
    import logging

    from pywindow_tpu.ops.analysis import (
        packed_size,
        to_properties_dicts_bulk,
    )

    if native.fastprops() is None:
        pytest.skip("fastprops extension unavailable")

    w = 8
    b = 64
    rng = np.random.default_rng(3)
    flat = rng.uniform(-5, 25, (b, packed_size(w))).astype(dtype)
    off = 21
    flat[:, 11] = (rng.random(b) > 0.25).astype(dtype)  # any_open
    flat[:, 12] = rng.integers(0, 2 * w, b)  # n_clusters
    flat[:, 13] = (rng.random(b) > 0.9).astype(dtype)  # overflow
    flat[:, 14] = (rng.random(b) > 0.9).astype(dtype)  # budget
    flat[:, off + w : off + 2 * w] = rng.integers(0, 2, (b, w)).astype(
        dtype
    )
    flat[:, off + 2 * w : off + 3 * w] = (
        rng.random((b, w)) > 0.95
    ).astype(dtype)

    def run(force_numpy):
        saved = (native._FASTPROPS, native._FASTPROPS_TRIED)
        if force_numpy:
            native._FASTPROPS, native._FASTPROPS_TRIED = None, True
        try:
            with caplog.at_level(logging.WARNING, "pywindow_tpu"):
                caplog.clear()
                out = to_properties_dicts_bulk(flat, w)
                warnings = sorted(r.message for r in caplog.records)
            return out, warnings
        finally:
            native._FASTPROPS, native._FASTPROPS_TRIED = saved

    got, got_warn = run(force_numpy=False)
    want, want_warn = run(force_numpy=True)
    assert got_warn == want_warn and got_warn  # branches exercised
    assert len(got) == len(want) == b
    for g, x in zip(got, want):
        assert set(g) == set(x)
        for key in x:
            gv, xv = g[key], x[key]
            if isinstance(xv, dict):
                assert set(gv) == set(xv)
                for k2 in xv:
                    g2, x2 = gv[k2], xv[k2]
                    if x2 is None:
                        assert g2 is None
                    elif isinstance(x2, np.ndarray):
                        np.testing.assert_array_equal(g2, x2)
                        assert g2.dtype == x2.dtype
                    else:
                        assert g2 == x2 and type(g2) is type(x2)
            elif isinstance(xv, np.ndarray):
                np.testing.assert_array_equal(gv, xv)
                assert gv.dtype == xv.dtype
            else:
                assert gv == xv and type(gv) is type(xv), key
    # the centre-of-mass fields are views into the caller's block in
    # both implementations (no per-frame copies)
    assert got[0]["centre_of_mass"].base is not None
