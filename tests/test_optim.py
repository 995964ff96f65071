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


def test_bfgs_recursion_matches_compact():
    """_build_b (sequential BFGS updates of theta*I) must equal the
    Byrd–Nocedal–Schnabel compact form theta*I - W M W^T the Fortran
    code factorises (lbfgsb.f formk/formt)."""
    from pywindow_tpu.ops.lbfgsb import _build_b

    rng = np.random.default_rng(7)
    m, d = 10, 3
    theta = 2.3
    s_list, y_list = [], []
    for _ in range(6):  # 6 valid pairs, 4 empty slots
        s = rng.normal(size=d)
        y = rng.normal(size=d)
        if s @ y < 0:
            y = -y
        s_list.append(s)
        y_list.append(y)
    s_ord = np.zeros((m, d))
    y_ord = np.zeros((m, d))
    s_ord[:6] = s_list
    y_ord[:6] = y_list
    valid = np.arange(m) < 6

    b_rec = np.asarray(
        _build_b(
            jnp.asarray(s_ord), jnp.asarray(y_ord), jnp.asarray(valid),
            jnp.asarray(theta), d,
        )
    )

    # compact form over the 6 valid pairs
    S = s_ord[:6].T  # (d, k)
    Y = y_ord[:6].T
    W = np.concatenate([Y, theta * S], axis=1)
    SY = S.T @ Y  # SY[i, j] = s_i . y_j
    D = np.diag(np.diag(SY))
    L = np.tril(SY, k=-1)
    M_inv = np.block([[-D, L.T], [L, theta * (S.T @ S)]])
    b_compact = theta * np.eye(d) - W @ np.linalg.solve(M_inv, W.T)

    np.testing.assert_allclose(b_rec, b_compact, rtol=1e-10, atol=1e-10)


_PINNED_CASES = []


def _quad3(X):
    A = jnp.asarray([[4.0, 1.0, 0.2], [1.0, 3.0, 0.5], [0.2, 0.5, 2.0]])
    b = jnp.asarray([10.0, -4.0, 3.0])
    return 0.5 * jnp.einsum("ki,ij,kj->k", X, A, X) - X @ b


def _quad3_np(x):
    A = np.array([[4.0, 1.0, 0.2], [1.0, 3.0, 0.5], [0.2, 0.5, 2.0]])
    b = np.array([10.0, -4.0, 3.0])
    return 0.5 * x @ A @ x - b @ x


def _ros(X):
    return (1 - X[:, 0]) ** 2 + 100.0 * (X[:, 1] - X[:, 0] ** 2) ** 2


def _ros_np(x):
    return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def _trig(X):
    return (
        jnp.sin(3 * X[:, 0]) * jnp.cos(2 * X[:, 1])
        + 0.1 * X[:, 0] ** 2
        + 0.05 * X[:, 1] ** 2
        + 0.3 * X[:, 0] * X[:, 1]
    )


def _trig_np(x):
    return (
        np.sin(3 * x[0]) * np.cos(2 * x[1])
        + 0.1 * x[0] ** 2
        + 0.05 * x[1] ** 2
        + 0.3 * x[0] * x[1]
    )


def _q1d(X):
    return (X[:, 0] - 2.0) ** 2


def _q1d_np(x):
    return (x[0] - 2.0) ** 2


_PINNED_CASES = [
    # (label, f_batch, f_np, x0, lower, upper, n_active_expected)
    ("face", _quad3, _quad3_np, [0.0, 0.0, 0.0], [-1.0] * 3, [1.0] * 3, 3),
    ("corner", _quad3, _quad3_np, [0.0, 0.0, 0.0], [-0.5] * 3, [0.2] * 3, 3),
    ("start-on-bound", _quad3, _quad3_np, [1.0, -1.0, 1.0], [-1.0] * 3,
     [1.0] * 3, 3),
    ("rosenbrock", _ros, _ros_np, [-1.2, 1.0], [-2.0, -2.0], [0.5, 2.0], 1),
    ("trig", _trig, _trig_np, [0.3, 0.3], [-0.4, -0.4], [0.4, 0.4], 1),
    ("1d-upper", _q1d, _q1d_np, [0.0], [-0.5], [1.0], 1),
]


@pytest.mark.parametrize(
    ("label", "f_b", "f_np", "x0", "lo", "hi", "n_active"),
    _PINNED_CASES,
    ids=[c[0] for c in _PINNED_CASES],
)
def test_lbfgsb_bound_pinned_synthetic(label, f_b, f_np, x0, lo, hi,
                                       n_active):
    """Bound-active parity: the constrained optimum sits on a box face
    or corner; the generalized-Cauchy-point + subspace-minimisation
    machinery must stop exactly where scipy stops (same iterates, same
    iteration count up to FP noise).  Reference regime:
    utilities.py:416-422 (COM +- pore_r box)."""
    x0 = np.asarray(x0, dtype=np.float64)
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    res = jax.jit(
        lambda c, a, b: lbfgsb_minimize(f_b, c, a, b, maxiter=200)
    )(jnp.asarray(x0), jnp.asarray(lo), jnp.asarray(hi))
    ref = minimize(f_np, x0=x0, bounds=list(zip(lo, hi)))
    active = np.sum(
        (np.abs(ref.x - lo) < 1e-9) | (np.abs(ref.x - hi) < 1e-9)
    )
    assert active >= n_active, "test no longer exercises active bounds"
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-7)
    assert float(res.fun) == pytest.approx(ref.fun, abs=1e-9)


@pytest.mark.parametrize(
    ("name", "ext"),
    [("NUXHIZ", "xyz"), ("BATVUP", "xyz"), ("MIBQAR", "pdb"),
     ("SAYGOR", "pdb")],
)
def test_lbfgsb_bound_pinned_cage(name, ext):
    """Active bounds on the real clearance objective: an offset box
    excludes the pore-centre maximum, so the optimum pins on 1-3 box
    faces.  Must match scipy's stopping point."""
    loader = load_xyz if ext == "xyz" else load_pdb
    elements, coords = loader(DATA / f"{name}.{ext}")
    mol = encoding.encode(elements, coords)
    com = geometry.center_of_mass(mol)
    pd, _ = geometry.pore_diameter(mol)
    r = float(pd) / 2.0
    lo = np.asarray(com) + 0.15 * r
    hi = np.asarray(com) + 0.60 * r
    x0 = lo + 0.7 * (hi - lo)

    def f_batch(points):
        return -2.0 * geometry.clearance_field(points, mol)

    res = jax.jit(
        lambda c, a, b: lbfgsb_minimize(f_batch, c, a, b)
    )(jnp.asarray(x0), jnp.asarray(lo), jnp.asarray(hi))

    ids = tables.element_ids(elements)
    vdw = tables.ELEMENT_VDW[ids]

    def f_np(p):
        return -2 * np.min(np.linalg.norm(coords - p, axis=1) - vdw)

    ref = minimize(f_np, x0=x0, bounds=list(zip(lo, hi)))
    active = np.sum(
        (np.abs(ref.x - lo) < 1e-9) | (np.abs(ref.x - hi) < 1e-9)
    )
    assert active >= 1, "box offset no longer pins the optimum"
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-6)
    assert float(res.fun) == pytest.approx(ref.fun, abs=1e-7)


def test_fd_gradient_matches_scipy_at_bound():
    """The 2-point FD step must follow scipy's _adjust_scheme_to_bounds
    rules (sign flip near an upper bound, truncation in a narrow box)."""
    from scipy.optimize._numdiff import approx_derivative

    from pywindow_tpu.ops.lbfgsb import _fd_value_and_grad

    def f_np(x):
        return np.sin(x[0]) * x[1] ** 2 + x[2]

    def f_b(X):
        return jnp.sin(X[:, 0]) * X[:, 1] ** 2 + X[:, 2]

    # x sits exactly on its upper bound in dim 0 and within 1e-9 of it
    # in dim 1 (forcing a backward step), and in a box narrower than
    # the default step in dim 2 (forcing truncation).
    x = np.array([2.0, 1.0, 0.5])
    lo = np.array([0.0, -1.0, 0.5 - 2e-9])
    hi = np.array([2.0, 1.0 + 1e-12, 0.5 + 3e-9])
    ref = approx_derivative(
        f_np, x, method="2-point", abs_step=1e-8, bounds=(lo, hi)
    )
    _, g = _fd_value_and_grad(
        f_b, jnp.asarray(x), jnp.asarray(lo), jnp.asarray(hi)
    )
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-6, atol=1e-8)


def test_nelder_mead_matches_scipy_fmin():
    """On a smooth 2-D bowl both must find the same minimum."""

    def f(x):
        return (x[0] - 1.3) ** 2 + 3.0 * (x[1] + 0.7) ** 2 + jnp.sin(
            x[0] * x[1]
        ) * 0.1

    x0 = jnp.array([0.0, 0.0])
    x_my, f_my, _ = nelder_mead(f, x0, maxiter=400)

    def f_np(x):
        return (x[0] - 1.3) ** 2 + 3.0 * (x[1] + 0.7) ** 2 + np.sin(
            x[0] * x[1]
        ) * 0.1

    x_sp = fmin(f_np, np.zeros(2), disp=False, xtol=1e-8, ftol=1e-12)
    np.testing.assert_allclose(np.asarray(x_my), x_sp, atol=1e-5)


def test_nelder_mead_respects_bounds():
    def f(x):
        return jnp.sum((x - 5.0) ** 2)  # unconstrained min outside box

    x, _, _ = nelder_mead(
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

    x, fx, _ = brute_then_polish(
        f, jnp.array([-2.0, -2.0]), jnp.array([2.0, 2.0]), ns=20
    )
    # grid + polish must beat plain local NM from origin
    _, f_local, _ = nelder_mead(f, jnp.zeros(2), maxiter=300)
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


def test_lbfgsb_float32_small_com_moves():
    """float32 regression: YAQHOQ's COM sits at ~1e-5 where a plain
    1e-8 absolute FD step is representable in x but vanishes against
    f's float32 resolution — the gradient came back exactly zero and
    the optimiser 'converged' at x0.  The dtype-aware relative step
    must recover the optimum (golden pore_opt 3.6290 vs pore 3.6102)."""
    elements, coords = load_xyz(DATA / "YAQHOQ.xyz")
    mol = encoding.encode(elements, coords, dtype=np.float32)
    com = geometry.center_of_mass(mol)
    assert com.dtype == jnp.float32
    pd, _ = geometry.pore_diameter(mol, com=com)
    r = pd / 2.0

    def f_batch(points):
        return -2.0 * geometry.clearance_field(points, mol)

    res = jax.jit(
        lambda c, lo, hi: lbfgsb_minimize(f_batch, c, lo, hi)
    )(com, com - r, com + r)
    assert float(-res.fun) == pytest.approx(3.6289753088227567, abs=0.01)
    assert int(res.nit) > 0


@pytest.mark.parametrize("seed", range(6))
def test_lbfgsb_random_fuzz_vs_scipy(seed):
    """Randomised parity sweep: random PSD quadratics plus a trig bump,
    random (sometimes pinning) boxes and random starts must stop where
    scipy stops."""
    rng = np.random.default_rng(seed)
    d = int(rng.integers(1, 4))
    a = rng.normal(size=(d, d))
    A = a @ a.T + np.eye(d) * 0.3
    b = rng.normal(size=d) * 3.0
    w = rng.normal(size=d)
    amp = float(rng.uniform(0.0, 0.3))

    def f_np(x):
        return 0.5 * x @ A @ x - b @ x + amp * np.sin(w @ x)

    Aj, bj, wj = jnp.asarray(A), jnp.asarray(b), jnp.asarray(w)

    def f_b(X):
        quad = 0.5 * jnp.einsum("ki,ij,kj->k", X, Aj, X) - X @ bj
        return quad + amp * jnp.sin(X @ wj)

    centre = rng.normal(size=d) * 2.0
    half = rng.uniform(0.3, 2.0, size=d)
    lo, hi = centre - half, centre + half
    x0 = np.clip(rng.normal(size=d) * 2.0, lo, hi)

    res = jax.jit(
        lambda c, a_, b_: lbfgsb_minimize(f_b, c, a_, b_, maxiter=200)
    )(jnp.asarray(x0), jnp.asarray(lo), jnp.asarray(hi))
    ref = minimize(f_np, x0=x0, bounds=list(zip(lo, hi)))
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=2e-6)
    assert float(res.fun) == pytest.approx(ref.fun, abs=1e-8)


def _exact_probe(f_b64):
    """Symbolic-difference probe for the stable driver, computed in f64.

    Mimics what ops/geometry.clearance_diff provides for the clearance
    objective: deltas and FD-probe differences accurate to the
    *difference* scale, handed back in the caller's dtype.
    """

    def probe(x, disp, h):
        x64 = x.astype(jnp.float64)
        p64 = x64 + disp.astype(jnp.float64)
        h64 = h.astype(jnp.float64)
        fp = f_b64(p64[None, :])[0]
        delta = fp - f_b64(x64[None, :])[0]
        probes = f_b64(p64[None, :] + jnp.diag(h64)) - fp
        return delta.astype(x.dtype), (probes / h64).astype(x.dtype)

    return probe


@pytest.mark.parametrize(
    ("label", "f_b", "f_np", "x0", "lo", "hi", "n_active"),
    _PINNED_CASES,
    ids=[c[0] for c in _PINNED_CASES],
)
def test_lbfgsb_stable_f32_matches_scipy(label, f_b, f_np, x0, lo, hi,
                                         n_active):
    """The delta-space stable driver with float32 state must stop where
    scipy-f64 stops (to f32 iterate resolution) — including on
    bound-pinned problems, where the GCP/subsm machinery runs through
    the same delta-space line searches."""
    from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize_stable

    x0 = np.asarray(x0, dtype=np.float32)
    lo32 = np.asarray(lo, dtype=np.float32)
    hi32 = np.asarray(hi, dtype=np.float32)

    def f_abs(x):
        return f_b(x[None, :].astype(jnp.float64))[0].astype(x.dtype)

    res = jax.jit(
        lambda c, a, b: lbfgsb_minimize_stable(
            _exact_probe(f_b), f_abs, c, a, b, maxiter=200
        )
    )(jnp.asarray(x0), jnp.asarray(lo32), jnp.asarray(hi32))
    ref = minimize(
        f_np,
        x0=np.asarray(x0, np.float64),
        bounds=list(zip(np.asarray(lo32, np.float64),
                        np.asarray(hi32, np.float64))),
    )
    assert np.asarray(res.x).dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64), ref.x, atol=5e-5
    )


def test_lbfgsb_stable_vmaps():
    """The stable driver must vmap (the batched trajectory pipeline
    wraps optimise_pore_centre in vmap over molecules)."""
    from pywindow_tpu.ops.lbfgsb import lbfgsb_minimize_stable

    def f_b64(X):
        return jnp.sum((X - jnp.asarray([0.3, -0.2, 0.1])) ** 2, axis=-1)

    def f_abs(x):
        return f_b64(x[None, :].astype(jnp.float64))[0].astype(x.dtype)

    def solve(x0, lo, hi):
        return lbfgsb_minimize_stable(
            _exact_probe(f_b64), f_abs, x0, lo, hi, maxiter=50
        )

    x0 = jnp.asarray(
        [[1.0, 1.0, 1.0], [-0.5, 0.4, 0.0]], dtype=jnp.float32
    )
    lo = jnp.full((2, 3), -2.0, jnp.float32)
    hi = jnp.full((2, 3), 2.0, jnp.float32)
    res = jax.jit(jax.vmap(solve))(x0, lo, hi)
    np.testing.assert_allclose(
        np.asarray(res.x),
        np.tile([0.3, -0.2, 0.1], (2, 1)),
        atol=5e-5,
    )
