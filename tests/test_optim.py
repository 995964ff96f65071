"""The bounded L-BFGS-B mimic vs scipy, and the Nelder-Mead polish."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import fmin, minimize

from pywindow_tpu import tables
from pywindow_tpu.ops import encoding, geometry
from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize
from pywindow_tpu.ops.optim import brute_then_polish, nelder_mead
from tests.conftest import DATA, load_pdb, load_xyz

CAGES = [
    ("YAQHOQ", "xyz"),
    ("BATVUP", "xyz"),
    ("NUXHIZ", "xyz"),
    ("REYMAL", "xyz"),
    ("MIBQAR", "pdb"),
    ("SAYGOR", "pdb"),
]


@pytest.mark.parametrize(("name", "ext"), CAGES)
def test_lbfgsb_matches_scipy_pore_opt(name, ext):
    loader = load_xyz if ext == "xyz" else load_pdb
    elements, coords = loader(DATA / f"{name}.{ext}")
    mol = encoding.encode(elements, coords)
    com = geometry.center_of_mass(mol)
    pd, _ = geometry.pore_diameter(mol)
    r = pd / 2.0

    def f_batch(points):
        return -2.0 * geometry.clearance_field(points, mol)

    res = jax.jit(
        lambda c, lo, hi: lbfgsb_minimize(f_batch, c, lo, hi)
    )(com, com - r, com + r)

    ids = tables.element_ids(elements)
    vdw = tables.ELEMENT_VDW[ids]

    def f_np(p):
        return -2 * np.min(np.linalg.norm(coords - p, axis=1) - vdw)

    com_np, rr = np.asarray(com), float(r)
    ref = minimize(
        f_np,
        x0=com_np,
        bounds=[(com_np[i] - rr, com_np[i] + rr) for i in range(3)],
    )
    # NUXHIZ's optimum sits on a kink ridge where scipy releases
    # themselves disagree at the 1e-2 level (the recorded golden differs
    # from this environment's scipy by 8e-3); the contract is 1e-2.
    tol = 1e-2 if name == "NUXHIZ" else 5e-3
    assert -float(res.fun) == pytest.approx(-ref.fun, abs=tol)


def test_nelder_mead_matches_scipy_fmin():
    """On a smooth 2-D bowl both must find the same minimum."""

    def f(x):
        return (x[0] - 1.3) ** 2 + 3.0 * (x[1] + 0.7) ** 2 + jnp.sin(
            x[0] * x[1]
        ) * 0.1

    x0 = jnp.array([0.0, 0.0])
    x_my, f_my = nelder_mead(f, x0, maxiter=400)

    def f_np(x):
        return (x[0] - 1.3) ** 2 + 3.0 * (x[1] + 0.7) ** 2 + np.sin(
            x[0] * x[1]
        ) * 0.1

    x_sp = fmin(f_np, np.zeros(2), disp=False, xtol=1e-8, ftol=1e-12)
    np.testing.assert_allclose(np.asarray(x_my), x_sp, atol=1e-5)


def test_nelder_mead_respects_bounds():
    def f(x):
        return jnp.sum((x - 5.0) ** 2)  # unconstrained min outside box

    x, _ = nelder_mead(
        f,
        jnp.zeros(2),
        lower=jnp.array([-1.0, -1.0]),
        upper=jnp.array([1.0, 1.0]),
        maxiter=300,
    )
    assert np.all(np.asarray(x) <= 1.0 + 1e-12)


def test_brute_then_polish_finds_global_in_box():
    # two basins; global min at (-1.5, 0.5)
    def f(x):
        return (
            jnp.cos(3 * x[0]) * jnp.cos(2 * x[1])
            + 0.1 * (x[0] + 1.5) ** 2
            + 0.1 * (x[1] - 0.5) ** 2
        )

    x, fx = brute_then_polish(
        f, jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]), ns=20
    )
    # grid + polish must beat plain local NM from origin
    _, f_local = nelder_mead(f, jnp.zeros(2), maxiter=300)
    assert float(fx) <= float(f_local) + 1e-9


def test_lbfgsb_vmaps():
    """The optimiser must vmap across a batch of problems."""

    def make_solver(shift):
        def f(points):  # (K, 2)
            return jnp.sum((points - shift) ** 2, axis=-1)

        return f

    shifts = jnp.array([[0.3, -0.2], [1.0, 0.5], [-0.7, 0.9]])

    def solve(shift):
        f = lambda pts: jnp.sum((pts - shift) ** 2, axis=-1)  # noqa: E731
        return lbfgsb_minimize(
            f,
            jnp.zeros(2),
            jnp.full(2, -2.0),
            jnp.full(2, 2.0),
        ).x

    xs = jax.vmap(solve)(shifts)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(shifts), atol=1e-5)
