"""Window-detection golden tests across the reference's example systems.

Golden values from reference examples 1/4/5 (see BASELINE.md).  Values
marked loose are scipy-version-sensitive in the reference itself (its
optimiser's mid-ridge stopping point moved between scipy releases), so
they get a 0.05 A tolerance; everything else must agree to < 0.01 A.
"""

import pathlib

import numpy as np
import pytest

import pywindow_tpu as pw
from tests.conftest import DATA, load_pdb, load_xyz

CASES = {
    # name: (loader, file, sorted window diameters or None, tol)
    "PUDXES": (
        load_xyz,
        "PUDXES.xyz",
        [3.62896512, 3.63562103, 3.63707237, 3.63778746],
        0.01,
    ),
    "YAQHOQ": (load_xyz, "YAQHOQ.xyz", None, 0.01),
    "BATVUP": (
        load_xyz,
        "BATVUP.xyz",
        [3.3414604104301676, 3.729380286546027],
        0.01,
    ),
    "NUXHIZ": (
        load_xyz,
        "NUXHIZ.xyz",
        [6.503653849037591, 7.269555216539536, 7.903902924542914],
        0.01,
    ),
    "REYMAL": (
        load_xyz,
        "REYMAL.xyz",
        [
            9.052427693803058,
            9.05455182048929,
            9.124494266527646,
            9.164845484536693,
            9.174017518084893,
            9.189382072982762,
        ],
        0.05,  # reference value itself moved 0.04 between scipy versions
    ),
    "MIBQAR": (
        load_pdb,
        "MIBQAR.pdb",
        [
            7.936596981480963,
            7.938328681370597,
            7.944268889914964,
            7.944822155795365,
            7.95227623300941,
            7.963120398998443,
        ],
        0.01,
    ),
    "SAYGOR": (
        load_pdb,
        "SAYGOR.pdb",
        [
            5.956810992876738,
            6.808675682597675,
            7.891850464732435,
            8.296593512434261,
        ],
        0.01,
    ),
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(
            n,
            marks=[pytest.mark.slow]
            if n in ("MIBQAR", "REYMAL", "NUXHIZ", "SAYGOR")
            else [],
        )
        for n in sorted(CASES)
    ],
)
def test_windows_golden(name):
    loader, fname, gold, tol = CASES[name]
    elements, coords = loader(DATA / fname)
    mol = pw.Molecule(
        {"elements": elements, "coordinates": coords}, name, 0
    )
    diameters = mol.calculate_windows()
    if gold is None:
        assert diameters is None
        return
    assert diameters is not None
    mine = np.sort(diameters)
    assert len(mine) == len(gold), f"window count {len(mine)} != {len(gold)}"
    np.testing.assert_allclose(mine, np.sort(gold), atol=tol)


def test_cc3_window_centres():
    elements, coords = load_xyz(DATA / "PUDXES.xyz")
    mol = pw.Molecule({"elements": elements, "coordinates": coords})
    mol.full_analysis()
    coms = mol.properties["windows"]["centre_of_mass"]
    # golden centres (reference: tests/test_validate_cc3.py:426-433)
    gold = np.array(
        [
            [10.77105705, 10.77097707, 14.02893956],
            [14.01545884, 14.01545974, 14.01545854],
            [13.92965524, 10.87034393, 10.87031936],
            [10.77540217, 14.02459851, 10.77540017],
        ]
    )
    # order-insensitive match via nearest-centre pairing
    assert coms.shape == (4, 3)
    taken = set()
    for g in gold:
        order = np.argsort(np.linalg.norm(coms - g, axis=1))
        j = next(int(k) for k in order if int(k) not in taken)
        taken.add(j)
        np.testing.assert_allclose(coms[j], g, atol=0.01)


@pytest.mark.slow
def test_pore_opt_goldens():
    golden = {
        "YAQHOQ": (3.6101512374999996, 3.6289753088227567, 0.01),
        "BATVUP": (4.836533719851611, 4.952486856634778, 0.01),
        "NUXHIZ": (8.746544980478657, 8.968158343257444, 0.01),
        "REYMAL": (13.756213728436612, 13.756737988344343, 0.01),
    }
    for name, (g_pore, g_opt, tol) in golden.items():
        elements, coords = load_xyz(DATA / f"{name}.xyz")
        mol = pw.Molecule({"elements": elements, "coordinates": coords})
        mol.full_analysis()
        assert mol.pore_diameter == pytest.approx(g_pore, abs=tol), name
        assert mol.pore_diameter_opt == pytest.approx(g_opt, abs=tol), name


def test_window_rotation_invariance():
    """Window count and diameters under rigid motion (BATVUP).

    The golden-spiral sampling grid is fixed in space (as in the
    reference), so rotating the molecule changes which rays seed each
    window's refinement; the method is rotation-invariant only to its
    angular discretisation, ~0.01 A.
    """
    elements, coords = load_xyz(DATA / "BATVUP.xyz")
    rng = np.random.default_rng(11)
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q * np.sign(np.diag(r))
    moved = coords @ q.T + np.array([-7.0, 3.0, 21.0])
    a = pw.Molecule({"elements": elements, "coordinates": coords})
    b = pw.Molecule({"elements": elements, "coordinates": moved})
    wa = np.sort(a.calculate_windows())
    wb = np.sort(b.calculate_windows())
    assert len(wa) == len(wb) == 2
    np.testing.assert_allclose(wa, wb, atol=0.01)


@pytest.mark.slow
def test_config_variants_on_batvup():
    """Non-default config branches: pore_opt off, second z pass,
    adjusted sampling density."""
    import dataclasses

    import jax

    from pywindow_tpu.config import DEFAULT_CONFIG
    from pywindow_tpu.ops import encoding
    from pywindow_tpu.ops.analysis import max_dim_host, static_sizes
    from pywindow_tpu.ops.windows import find_windows as fw

    elements, coords = load_xyz(DATA / "BATVUP.xyz")
    mol = encoding.encode(elements, coords)
    maxd = max_dim_host(elements, coords)

    def run(cfg):
        n_win, _, l1, l2 = static_sizes(maxd, cfg)
        res = jax.device_get(
            jax.jit(lambda m: fw(m, n_win, l1, l2, cfg))(mol)
        )
        return np.sort(np.asarray(res.diameters)[np.asarray(res.valid)])

    base = run(DEFAULT_CONFIG)
    assert len(base) == 2

    no_opt = run(dataclasses.replace(DEFAULT_CONFIG, pore_opt=False))
    assert len(no_opt) == 2  # BATVUP's COM is close to the opt centre
    np.testing.assert_allclose(no_opt, base, atol=0.2)

    second_z = run(
        dataclasses.replace(DEFAULT_CONFIG, z_second_mini=True)
    )
    assert len(second_z) == 2
    np.testing.assert_allclose(second_z, base, atol=0.1)

    dense = run(dataclasses.replace(DEFAULT_CONFIG, adjust=1.5))
    assert len(dense) == 2
    np.testing.assert_allclose(dense, base, atol=0.05)


@pytest.mark.slow
def test_window_cap_escalation():
    """A saturated window-slot cap must escalate (cap doubled, re-run)
    until every cluster fits: the reference has NO cap, so silent
    truncation would be a parity bug.  CC3's 4 windows forced through
    max_windows=2 must come back complete, serial and batched."""
    import dataclasses

    from pywindow_tpu.config import DEFAULT_CONFIG
    from pywindow_tpu.ops.analysis import analyze
    from pywindow_tpu.parallel.batch import analyze_batch
    from tests.conftest import load_xyz

    elements, coords = load_xyz(DATA / "PUDXES.xyz")
    cfg = dataclasses.replace(DEFAULT_CONFIG, max_windows=2)

    ref = analyze(elements, coords)
    assert "_window_cap_saturated" not in ref

    got = analyze(elements, coords, cfg=cfg)
    assert "_window_cap_saturated" not in got
    np.testing.assert_allclose(
        np.sort(got["windows"]["diameters"]),
        np.sort(ref["windows"]["diameters"]),
        atol=1e-10,
    )

    batch = analyze_batch([(elements, coords)] * 2, cfg=cfg)
    for item in batch:
        assert "_window_cap_saturated" not in item
        assert len(item["windows"]["diameters"]) == 4


def test_open_cap_rule():
    """Cap rounds up to 128 lanes and disables itself when useless."""
    from pywindow_tpu.ops.windows import open_cap

    assert open_cap(797, 0.4) == 384
    assert open_cap(797, 0.8) == 640
    assert open_cap(797, 1.0) is None  # >= 1.0 disables
    assert open_cap(100, 0.4) is None  # 128 >= 100: no shrink
    assert open_cap(889, 0.8) == 768


@pytest.mark.slow
def test_open_compaction_bitwise_and_escalation():
    """Open-ray compaction must be bitwise-invisible: compact-space
    results equal the full-spiral path exactly, and an undersized cap
    escalates (fraction doubled, re-run) instead of truncating.

    REYMAL is the stress case: 523 of 889 rays are open (58.8%), so the
    default 0.4 cap overflows and the escalation retry must kick in
    transparently."""
    import dataclasses

    from pywindow_tpu.config import DEFAULT_CONFIG
    from pywindow_tpu.ops.analysis import analyze
    from pywindow_tpu.parallel.batch import analyze_batch

    full_cfg = dataclasses.replace(DEFAULT_CONFIG, open_cap_frac=1.0)
    tiny_cfg = dataclasses.replace(DEFAULT_CONFIG, open_cap_frac=0.2)
    for name in ("PUDXES", "REYMAL"):
        elements, coords = load_xyz(
            pathlib.Path("/root/reference/examples/data/input")
            / f"{name}.xyz"
        )
        ref = analyze(elements, coords, full_cfg)
        for cfg in (DEFAULT_CONFIG, tiny_cfg):
            got = analyze(elements, coords, cfg)
            assert "_open_cap_overflow" not in got
            np.testing.assert_array_equal(
                got["windows"]["diameters"], ref["windows"]["diameters"]
            )
            np.testing.assert_array_equal(
                got["windows"]["centre_of_mass"],
                ref["windows"]["centre_of_mass"],
            )
            assert (
                got["pore_diameter_opt"]["diameter"]
                == ref["pore_diameter_opt"]["diameter"]
            )

    # batched path: the escalation retry runs through analyze_batch
    elements, coords = load_xyz(
        pathlib.Path("/root/reference/examples/data/input/REYMAL.xyz")
    )
    ref = analyze(elements, coords, full_cfg)
    batch = analyze_batch([(elements, coords)] * 2, tiny_cfg)
    for item in batch:
        assert "_open_cap_overflow" not in item
        np.testing.assert_array_equal(
            item["windows"]["diameters"], ref["windows"]["diameters"]
        )


def test_z_stable_probe_matches_f64_differences():
    """The window z-stage symbolic probe must reproduce f64 absolute
    differencing of the same (f32-rounded) landscape at scipy's
    ``h = 1e-8`` scale — where a plain f32 ``f(x+h) - f(x)`` is pure
    cancellation noise."""
    import jax.numpy as jnp

    from pywindow_tpu.ops.encoding import MolArrays, encode
    from pywindow_tpu.ops.geometry import clearance_field
    from pywindow_tpu.ops.windows import _z_stable_probe

    elements, coords = load_xyz(DATA / "BATVUP.xyz")
    m32 = encode(elements, coords, dtype=np.float32)
    # the f64 reference evaluates the SAME f32-rounded landscape
    m64 = MolArrays(
        coords=m32.coords.astype(jnp.float64),
        mass=m32.mass.astype(jnp.float64),
        vdw=m32.vdw.astype(jnp.float64),
        cov=m32.cov.astype(jnp.float64),
        mask=m32.mask,
    )
    xy = jnp.asarray([0.3, -0.2], jnp.float32)
    probe, f_abs = _z_stable_probe(m32, xy)

    def f64(z):
        pt = jnp.asarray([[0.3, -0.2, z]], jnp.float64)
        pt = pt.at[0, :2].set(xy.astype(jnp.float64))
        return float(2.0 * clearance_field(pt, m64)[0])

    z0, disp, h = 0.5, 1e-8, 1e-8
    delta, grad = probe(
        jnp.asarray([z0], jnp.float32),
        jnp.asarray([disp], jnp.float32),
        jnp.asarray([h], jnp.float32),
    )
    want_delta = f64(z0 + disp) - f64(z0)
    want_grad = (f64(z0 + disp + h) - f64(z0 + disp)) / h
    assert want_delta != 0.0  # the probe point is on a slope
    assert abs(float(delta) - want_delta) < 1e-4 * abs(want_delta)
    assert abs(float(grad[0]) - want_grad) < 1e-4 * abs(want_grad)
    # absolute-f hook agrees with the plain field
    assert float(f_abs(jnp.asarray([z0], jnp.float32))) == pytest.approx(
        f64(z0), abs=1e-5
    )
