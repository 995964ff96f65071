"""Fused Pallas stable L-BFGS-B kernel vs the vmapped jnp driver.

The kernel (ops/lbfgsb_pallas.py) must reproduce the stable driver's
stopping behaviour (reference behaviour: scipy L-BFGS-B as invoked by
utilities.py:400-426).  Bitwise equality is NOT the contract — the two
HLO layouts round clearance probes differently at the ulp level, and on
plateau landscapes (NUXHIZ-class) a last-bit probe difference can stop
one kink over, exactly like switching backends does (docs/design.md).
What is asserted here, on CPU in interpret mode with float32 data:

* the optimised pore DIAMETER (evaluated in float64 at each stop point)
  matches the driver's to well inside the 0.01 A contract on the golden
  systems, and agreement is exact on the non-plateau ones;
* fuzzed random cages agree with the driver in centre and diameter;
* the full analysis pipeline with routing FORCED through the kernel
  reproduces the unrouted pipeline's properties.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pywindow_tpu import tables  # noqa: E402
from pywindow_tpu.ops.encoding import encode_batch  # noqa: E402
from pywindow_tpu.ops.geometry import (  # noqa: E402
    center_of_mass,
    clearance_field,
    pore_diameter,
    pore_stable_probe,
)
from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize_stable  # noqa: E402
from pywindow_tpu.ops.lbfgsb_pallas import (  # noqa: E402
    EMB_XYZ,
    lbfgsb_stable_flat,
    pore_centres_pallas,
)
from tests.conftest import load_structure  # noqa: E402

GOLD_SYSTEMS = ("PUDXES", "YAQHOQ", "BATVUP", "MIBQAR", "NUXHIZ",
                "REYMAL", "SAYGOR")
#: plateau systems: flat pore bowls where ulp-level probe rounding
#: legitimately moves the stop point along the plateau (diameter ~flat)
PLATEAU = {"NUXHIZ"}


def _dia64(els, co, x):
    ids = tables.element_ids(els)
    vdw = tables.ELEMENT_VDW[ids]
    d = np.sqrt(((np.asarray(co, np.float64)
                  - np.asarray(x, np.float64)) ** 2).sum(-1)) - vdw
    return 2.0 * d.min()


def _driver_batch(mols, maxiter=40):
    def one(m):
        com = center_of_mass(m)
        pd0, _ = pore_diameter(m, com=com)
        r = pd0 / 2.0

        def f_abs(x):
            return -2.0 * clearance_field(x[None, :], m)[0]

        res = lbfgsb_minimize_stable(
            pore_stable_probe(m), f_abs, com, com - r, com + r,
            maxiter=maxiter,
        )
        return res.x, res.capped

    return jax.jit(jax.vmap(one))(mols)


def _kernel_batch(mols, maxiter=40):
    return pore_centres_pallas(mols, maxiter, tile=8, interpret=True)


@pytest.mark.slow
def test_kernel_matches_driver_on_goldens():
    systems = [load_structure(n) for n in GOLD_SYSTEMS]
    mols = encode_batch(systems, dtype=np.float32)
    xd, _ = _driver_batch(mols)
    xk, _ = _kernel_batch(mols)
    for i, name in enumerate(GOLD_SYSTEMS):
        els, co = systems[i]
        dd = _dia64(els, co, xd[i])
        dk = _dia64(els, co, xk[i])
        # stop-point diameters agree far inside the 0.01 A contract
        assert abs(dk - dd) < 1e-3, (name, dk, dd)
        if name not in PLATEAU:
            assert float(jnp.max(jnp.abs(xk[i] - xd[i]))) < 1e-3, name


@pytest.mark.slow
def test_kernel_tracks_driver_on_fuzz():
    """Random shells are kinky min-of-cones landscapes where ulp-level
    probe rounding legitimately flips a stopping decision into another
    nearby local basin, in either direction (exactly like switching
    backends does — the golden systems above are the parity arbiter).
    Across a fuzz population the kernel must stay in the same basin
    family (diameter within 0.2 A of the driver's stop) and agree
    tightly on the majority of cases."""
    rng = np.random.default_rng(7)
    systems = []
    for _ in range(12):
        n = int(rng.integers(12, 80))
        pts = rng.normal(size=(n, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        co = pts * rng.uniform(4.0, 8.0) + rng.normal(
            scale=0.3, size=(n, 3)
        )
        systems.append((rng.choice(["C", "H", "N", "O"], size=n), co))

    mols = encode_batch(systems, dtype=np.float32)
    xd, _ = _driver_batch(mols)
    xk, _ = _kernel_batch(mols)
    close = 0
    for i, (els, co) in enumerate(systems):
        dd = _dia64(els, co, xd[i])
        dk = _dia64(els, co, xk[i])
        assert abs(dk - dd) < 0.2, (i, dk, dd)
        close += abs(dk - dd) < 2e-3
    assert close >= len(systems) // 2, close


@pytest.mark.slow
def test_padded_lanes_and_tiling_are_inert():
    """Results must not depend on the batch tile or pad-lane count."""
    systems = [load_structure("PUDXES"), load_structure("YAQHOQ")]
    mols = encode_batch(systems, dtype=np.float32)
    com = jax.vmap(center_of_mass)(mols)
    pd0 = jax.vmap(lambda m: pore_diameter(m)[0])(mols)
    r = pd0[:, None] / 2.0
    outs = []
    for tile in (8, 16):
        x, fun, nit, conv, capped = lbfgsb_stable_flat(
            mols.coords, mols.vdw, jnp.zeros_like(com), com,
            com - r, com + r, emb=EMB_XYZ, sign=-1.0, maxiter=40,
            tile=tile, interpret=True,
        )
        outs.append((np.asarray(x), np.asarray(nit)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


@pytest.mark.slow
def test_routed_pipeline_matches_unrouted(monkeypatch):
    """Full analysis with forced kernel routing == unrouted pipeline."""
    monkeypatch.setenv("PYWINDOW_TPU_FORCE_F32", "1")
    from pywindow_tpu.ops import analysis as ana

    els, co = load_structure("PUDXES")

    ana._compiled_full_analysis.cache_clear()
    base = ana.analyze(els, co)

    monkeypatch.setenv("PYWINDOW_TPU_FORCE_OPT_PALLAS", "1")
    ana._compiled_full_analysis.cache_clear()
    routed = ana.analyze(els, co)
    ana._compiled_full_analysis.cache_clear()

    assert abs(
        routed["pore_diameter_opt"]["diameter"]
        - base["pore_diameter_opt"]["diameter"]
    ) < 1e-4
    np.testing.assert_allclose(
        routed["pore_diameter_opt"]["centre_of_mass"],
        base["pore_diameter_opt"]["centre_of_mass"],
        atol=1e-3,
    )
    wd_r = np.sort(routed["windows"]["diameters"])
    wd_b = np.sort(base["windows"]["diameters"])
    np.testing.assert_allclose(wd_r, wd_b, atol=2e-3)


def test_nm_kernel_matches_jnp_polish():
    """The fused NM kernel vs optim.nelder_mead with the identical
    stable delta-space objective, on random shell molecules.

    Same caveat as the L-BFGS-B comparisons: ulp-level probe rounding
    can flip a late simplex comparison, so agreement is asserted on the
    achieved objective value (the polish is a local refinement of the
    same start), tightly on the population majority.
    """
    import jax

    from pywindow_tpu.ops.geometry import clearance_diff
    from pywindow_tpu.ops.nm_pallas import nm_xy_stable_pallas
    from pywindow_tpu.ops.optim import nelder_mead

    rng = np.random.default_rng(3)
    systems = []
    for _ in range(10):
        n_atoms = int(rng.integers(20, 80))
        pts = rng.normal(size=(n_atoms, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        co = pts * rng.uniform(4.0, 7.0) + rng.normal(
            scale=0.2, size=(n_atoms, 3)
        )
        systems.append((rng.choice(["C", "N", "O"], size=n_atoms), co))
    mols = encode_batch(systems, dtype=np.float32)
    zs = jnp.asarray(rng.uniform(-0.5, 0.5, size=10), jnp.float32)
    x0 = jnp.asarray(rng.uniform(-0.3, 0.3, size=(10, 2)), jnp.float32)

    def jnp_one(m, z, x0_one):
        anchor = jnp.stack(
            [jnp.float32(0.0), jnp.float32(0.0), z]
        )

        def f(xy):
            disp = jnp.stack([xy[0], xy[1], jnp.float32(0.0)])
            return -2.0 * clearance_diff(anchor, disp[None, :], m)[0]

        def f_batch(xys):
            disp = jnp.concatenate(
                [xys, jnp.zeros((xys.shape[0], 1), jnp.float32)], axis=-1
            )
            return -2.0 * clearance_diff(anchor, disp, m)

        x, fv, capped = nelder_mead(
            f, x0_one, xatol=1e-4, fatol=1e-4, maxiter=120,
            f_batch=f_batch,
        )
        return x, fv

    xj, fj = jax.jit(jax.vmap(jnp_one))(mols, zs, x0)

    def kernel_one(m, z, x0_one):
        return nm_xy_stable_pallas(
            m.coords, m.vdw, z, x0_one, maxiter=120, tile=8,
        )

    xk, fk, capk = jax.jit(jax.vmap(kernel_one))(mols, zs, x0)

    fj = np.asarray(fj)
    fk = np.asarray(fk)
    close = 0
    for i in range(10):
        assert abs(fk[i] - fj[i]) < 5e-3, (i, fk[i], fj[i])
        close += abs(fk[i] - fj[i]) < 2e-4
    assert close >= 5, close
