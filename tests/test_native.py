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
