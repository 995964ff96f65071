"""Function-level utilities parity and the sharded/batched paths."""

import numpy as np
import pytest

import pywindow_tpu as pw
from pywindow_tpu import utilities as u
from pywindow_tpu.parallel.batch import analyze_batch
from tests.conftest import DATA, load_xyz


@pytest.fixture(scope="module")
def cc3_arrays():
    return load_xyz(DATA / "PUDXES.xyz")


@pytest.mark.slow
def test_function_level_parity(cc3_arrays):
    elements, coords = cc3_arrays
    np.testing.assert_allclose(
        u.center_of_mass(elements, coords), [12.4, 12.4, 12.4], atol=1e-8
    )
    assert u.molecular_weight(elements) == pytest.approx(1117.548, abs=1e-3)
    a1, a2, d = u.max_dim(elements, coords)
    assert d == pytest.approx(22.179369990077188, abs=1e-8)
    pd, atom = u.pore_diameter(elements, coords)
    assert pd == pytest.approx(5.397020177310022, abs=1e-8)
    od, oa, centre = u.opt_pore_diameter(elements, coords)
    assert od == pytest.approx(5.397020177310022, abs=1e-6)
    np.testing.assert_allclose(centre, [12.4, 12.4, 12.4], atol=1e-4)
    avg = u.find_average_diameter(elements, coords)
    assert avg == pytest.approx(13.832017514255472, abs=1e-6)
    wins = u.find_windows(elements, coords)
    assert wins is not None
    np.testing.assert_allclose(
        np.sort(wins[0]),
        [3.62896512, 3.63562103, 3.63707237, 3.63778746],
        atol=0.01,
    )


def test_small_helpers():
    assert u.distance([0, 0, 0], [3, 4, 0]) == 5.0
    assert u.unique([3, 1, 3, 2, 1]) == [3, 1, 2]
    assert u.angle_between_vectors([1, 0, 0], [0, 1, 0]) == pytest.approx(
        np.pi / 2
    )
    assert u.angle_between_vectors([1, 0, 0], [-1, 0, 0]) == pytest.approx(
        0.0
    )  # |dot| folds to [0, pi/2]
    n = u.normal_vector([0, 0, 0], [[1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(n, [0, 0, 1])
    shifted = u.shift_com(np.array(["C", "C"]), np.array([[0.0, 0, 0], [2, 0, 0]]))
    np.testing.assert_allclose(shifted.mean(axis=0), [0, 0, 0], atol=1e-12)


@pytest.mark.slow
def test_batch_matches_single(cc3_arrays):
    elements, coords = cc3_arrays
    single = pw.Molecule(
        {"elements": elements, "coordinates": coords}
    ).full_analysis()
    batch = analyze_batch([(elements, coords)] * 3)
    for res in batch:
        assert res["pore_diameter"]["diameter"] == pytest.approx(
            single["pore_diameter"]["diameter"], abs=1e-10
        )
        np.testing.assert_allclose(
            np.sort(res["windows"]["diameters"]),
            np.sort(single["windows"]["diameters"]),
            atol=1e-8,
        )


@pytest.mark.slow
def test_sharded_batch_over_virtual_mesh(cc3_arrays):
    """8-virtual-device CPU mesh: sharded == unsharded results."""
    import jax

    assert len(jax.devices()) == 8
    elements, coords = cc3_arrays
    systems = [(elements, coords + 0.01 * i) for i in range(8)]
    sharded = analyze_batch(systems, shard=True)
    unsharded = analyze_batch(systems, shard=False)
    for a, b in zip(sharded, unsharded):
        assert a["pore_diameter"]["diameter"] == pytest.approx(
            b["pore_diameter"]["diameter"], abs=1e-10
        )


@pytest.mark.slow
def test_graft_entry_dryrun():
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_trajectory_pipelined_batch_matches_serial():
    traj = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    traj.analysis_batched(
        frames=[0, 1, 2, 3], batch_size=2,  # forces the pipeline path
        forcefield="opls", swap_atoms={"he": "H"},
    )
    traj2 = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    traj2.analysis(
        frames=[2], forcefield="opls", swap_atoms={"he": "H"}
    )
    a = traj.analysis_output[2]["0"]
    b = traj2.analysis_output[2]["0"]
    assert a["pore_diameter"]["diameter"] == pytest.approx(
        b["pore_diameter"]["diameter"], abs=1e-10
    )


def test_circumcircle_and_atom_lists(cc3_arrays):
    elements, coords = cc3_arrays
    al = u.compose_atom_list(elements, coords)
    assert len(al) == 168 and len(al[0]) == 4
    e2, c2 = u.decompose_atom_list(al)
    np.testing.assert_array_equal(e2, elements)
    np.testing.assert_allclose(c2, coords, atol=1e-8)
    # circumcircle of three points on a unit circle -> radius 1 - 1.70
    pts = np.array([[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0]])
    r, com = u.circumcircle_window(pts, [0, 1, 2])
    assert r == pytest.approx(1.0 - 1.70, abs=1e-12)
    np.testing.assert_allclose(com, [0, 0, 0], atol=1e-12)


def test_host_device_mesh():
    from pywindow_tpu.parallel.mesh import (
        host_batch_sharding,
        host_device_mesh,
    )

    mesh = host_device_mesh()
    assert mesh.axis_names == ("hosts", "frames")
    assert mesh.devices.size == 8
    sharding = host_batch_sharding(mesh)
    assert sharding is not None
    # explicit fake multi-host grid from the virtual device pool
    mesh2 = host_device_mesh(n_hosts=2)
    assert mesh2.devices.shape == (2, 4)


@pytest.mark.slow
def test_hosts_frames_mesh_executes(cc3_arrays):
    """The full analysis sharded over a fake (2 hosts x 4 devices) grid
    must equal the unsharded result (SURVEY §5 distributed backend:
    frames shard over the flattened hosts x frames mesh; the host axis
    rides DCN in real deployments, virtual CPU devices here)."""
    import jax

    from pywindow_tpu.parallel.mesh import (
        host_batch_sharding,
        host_device_mesh,
    )

    assert len(jax.devices()) == 8
    elements, coords = cc3_arrays
    systems = [(elements, coords + 0.02 * i) for i in range(8)]
    sharded = analyze_batch(systems, shard=True, mesh_key=("hosts", 2))
    unsharded = analyze_batch(systems, shard=False)
    for a, b in zip(sharded, unsharded):
        assert a["pore_diameter"]["diameter"] == pytest.approx(
            b["pore_diameter"]["diameter"], abs=1e-10
        )
        assert a["average_diameter"] == pytest.approx(
            b["average_diameter"], abs=1e-10
        )
    # the compiled program really placed shards on the 2x4 grid
    mesh = host_device_mesh(n_hosts=2)
    sh = host_batch_sharding(mesh)
    arr = jax.device_put(np.zeros((8, 4)), sh)
    assert len(arr.addressable_shards) == 8
    assert {s.data.shape for s in arr.addressable_shards} == {(1, 4)}


@pytest.mark.slow
def test_autosave_and_resume(tmp_path):
    import json

    ckpt = tmp_path / "ckpt.json"
    traj = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    traj.analysis_batched(
        frames=[0, 1], batch_size=1, autosave=ckpt, autosave_every=1,
        forcefield="opls", swap_atoms={"he": "H"},
    )
    assert set(json.load(open(ckpt))) == {"0", "1"}
    # resume in a fresh trajectory object
    traj2 = pw.DLPOLY(DATA / "HISTORY_singlemol_short")
    traj2.load_analysis(ckpt)
    marker = traj2.analysis_output[0]
    traj2.analysis_batched(
        frames=[0, 1, 2], batch_size=2,
        forcefield="opls", swap_atoms={"he": "H"},
    )
    assert traj2.analysis_output[0] is marker  # frames 0/1 skipped
    assert 2 in traj2.analysis_output


@pytest.mark.slow
def test_mixed_size_batch():
    """Heterogeneous batch: per-system correctness regardless of batch
    composition (static sizes come from the largest exact member)."""
    from tests.conftest import load_xyz as _lx

    cc3 = _lx(DATA / "PUDXES.xyz")
    yaq = _lx(DATA / "YAQHOQ.xyz")
    bat = _lx(DATA / "BATVUP.xyz")
    res = analyze_batch([yaq, cc3, bat])
    assert res[0]["windows"]["diameters"] is None
    np.testing.assert_allclose(
        np.sort(res[1]["windows"]["diameters"]),
        [3.62896512, 3.63562103, 3.63707237, 3.63778746],
        atol=0.01,
    )
    assert len(res[2]["windows"]["diameters"]) == 2


@pytest.mark.slow
def test_dispatch_pad_batch_to(cc3_arrays):
    """A padded dispatch (odd remainder pinned to the steady chunk
    shape) must return exactly the unpadded systems' results."""
    from pywindow_tpu.parallel.batch import analyze_batch

    elements, coords = cc3_arrays
    systems = [(elements, coords + 0.01 * i) for i in range(3)]
    plain = analyze_batch(systems, shard=False)
    padded = analyze_batch(systems, shard=False, pad_batch_to=8)
    assert len(padded) == 3
    for a, b in zip(padded, plain):
        assert a["pore_diameter"]["diameter"] == pytest.approx(
            b["pore_diameter"]["diameter"], abs=1e-12
        )
        np.testing.assert_allclose(
            np.sort(a["windows"]["diameters"]),
            np.sort(b["windows"]["diameters"]),
            atol=1e-10,
        )
