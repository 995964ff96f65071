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
