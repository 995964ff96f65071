"""Batched on-device bounded minimiser mimicking scipy's L-BFGS-B.

The reference optimises the pore centre and the window z coordinate with
``scipy.optimize.minimize(..., bounds=...)`` — L-BFGS-B (the C
translation of the Fortran 3.0 code) with 2-point finite-difference
gradients and the Moré–Thuente (MINPACK-2 ``dcsrch``/``dcstep``) line
search (reference: utilities.py:400-426, :1301-1305).  The objectives
are piecewise-smooth clearance fields; where they stop on a kink ridge
is determined by those exact algorithmic details, so golden-value parity
requires reproducing them, not merely optimising better.  This module is
a faithful jnp port of the full algorithm:

* 2-point FD gradients with scipy's exact stepping: absolute step
  ``eps=1e-8`` (the L-BFGS-B default when ``jac=None``), falling back to
  the relative rule ``sqrt(eps_dtype) * sign(x) * max(1, |x|)`` when the
  absolute step underflows the working dtype, then bound-adjusted by the
  ``_adjust_scheme_to_bounds`` 1-sided rules (sign flip / truncation),
* the generalized Cauchy point (``cauchy``): breakpoint walk along the
  projected steepest-descent path of the quadratic model,
* subspace minimisation (``subsm``, 3.0 semantics): Newton step of the
  model over the free variables, with the projection-then-sign-test and
  the truncated-alpha fallback including the exact bound snap,
* the dcsrch line search with ``ftol=1e-3, gtol=0.9, xtol=0.1``, the
  lnsrlb step/stpmax rules (first constrained iteration capped at 1),
* the mainlb restart machinery: a line-search failure with stored pairs
  wipes the memory and retries from the same iterate (iteration count
  unchanged); a failure with no history terminates,
* the curvature skip rule and ``theta = y'y / y's`` scaling,
* termination on ``pgtol`` (projected gradient) and ``factr`` (relative
  f reduction), in mainlb's order, matching scipy defaults.

The limited-memory matrix ``B_k`` is built by applying the (at most m)
stored BFGS updates to ``theta_k * I`` in chronological order — exactly
the matrix the Fortran code represents in Byrd–Nocedal–Schnabel compact
form, but assembled as n×n (n ≤ 3 here) dense updates, which is far
cheaper inside a TPU ``lax.while_loop`` than the 2m×2m middle-matrix
solve (see tests/test_optim.py::test_bfgs_recursion_matches_compact).

Everything is ``lax.while_loop``/``lax.fori_loop`` state-machine code:
jit-able and ``vmap``-able across molecules / windows / frames.
Validated against scipy L-BFGS-B on the six reference cages (interior
optima) and on bound-pinned problems (see tests/test_optim.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# dcsrch parameters as used by L-BFGS-B.
_FTOL = 1e-3
_GTOL = 0.9
_XTOL = 0.1
_XTRAPL = 1.1
_XTRAPU = 4.0
_EPS64 = 2.220446049250313e-16
# scipy _minimize_lbfgsb default FD step (absolute; jac=None path).
_FD_ABS_STEP = 1e-8
_M = 10  # scipy maxcor default


class _StepState(NamedTuple):
    stx: jnp.ndarray
    fx: jnp.ndarray
    dx: jnp.ndarray
    sty: jnp.ndarray
    fy: jnp.ndarray
    dy: jnp.ndarray
    stp: jnp.ndarray
    brackt: jnp.ndarray


def _dcstep(st: _StepState, fp, dp, stpmin, stpmax) -> _StepState:
    """MINPACK-2 dcstep: trial-step update via cubic/quadratic models."""
    stx, fx, dx, sty, fy, dy, stp, brackt = st
    sgnd = dp * jnp.sign(dx)

    def cubic_gamma(theta, da, db, flip):
        s = jnp.maximum(jnp.maximum(jnp.abs(theta), jnp.abs(da)), jnp.abs(db))
        g = s * jnp.sqrt(
            jnp.maximum((theta / s) ** 2 - (da / s) * (db / s), 0.0)
        )
        return jnp.where(flip, -g, g)

    def safe_div(p, q):
        # dtype-pinned tiny divisor: in float64 this is 1e-300 exactly
        # (scipy-parity path unchanged); in float32 it flushes to 0.0 —
        # the same value the unpinned literal produced — but the pin
        # keeps the constant out of weak-f64 territory so _dcstep can
        # run inside Pallas kernels under x64 (see CLAUDE.md).
        return p / jnp.where(q == 0.0, jnp.asarray(1e-300, q.dtype), q)

    # --- case 1: higher function value -------------------------------
    theta1 = 3.0 * (fx - fp) * safe_div(1.0, stp - stx) + dx + dp
    gamma1 = cubic_gamma(theta1, dx, dp, stp < stx)
    p1 = (gamma1 - dx) + theta1
    q1 = ((gamma1 - dx) + gamma1) + dp
    stpc1 = stx + safe_div(p1, q1) * (stp - stx)
    stpq1 = stx + (
        safe_div(dx, safe_div(fx - fp, stp - stx) + dx) / 2.0
    ) * (stp - stx)
    stpf1 = jnp.where(
        jnp.abs(stpc1 - stx) < jnp.abs(stpq1 - stx),
        stpc1,
        stpc1 + (stpq1 - stpc1) / 2.0,
    )

    # --- case 2: lower value, opposite derivative sign ----------------
    gamma2 = cubic_gamma(theta1, dx, dp, stp > stx)
    p2 = (gamma2 - dp) + theta1
    q2 = ((gamma2 - dp) + gamma2) + dx
    stpc2 = stp + safe_div(p2, q2) * (stx - stp)
    stpq2 = stp + safe_div(dp, dp - dx) * (stx - stp)
    stpf2 = jnp.where(
        jnp.abs(stpc2 - stp) > jnp.abs(stpq2 - stp), stpc2, stpq2
    )

    # --- case 3: lower value, same sign, decreasing magnitude ---------
    gamma3 = cubic_gamma(theta1, dx, dp, stp > stx)
    p3 = (gamma3 - dp) + theta1
    q3 = (gamma3 + (dx - dp)) + gamma3
    r3 = safe_div(p3, q3)
    stpc3 = jnp.where(
        (r3 < 0.0) & (gamma3 != 0.0),
        stp + r3 * (stx - stp),
        jnp.where(stp > stx, stpmax, stpmin),
    )
    stpq3 = stp + safe_div(dp, dp - dx) * (stx - stp)
    stpf3_brackt = jnp.where(
        jnp.abs(stpc3 - stp) < jnp.abs(stpq3 - stp), stpc3, stpq3
    )
    stpf3_brackt = jnp.where(
        stp > stx,
        jnp.minimum(stp + 0.66 * (sty - stp), stpf3_brackt),
        jnp.maximum(stp + 0.66 * (sty - stp), stpf3_brackt),
    )
    stpf3_free = jnp.where(
        jnp.abs(stpc3 - stp) > jnp.abs(stpq3 - stp), stpc3, stpq3
    )
    stpf3_free = jnp.clip(stpf3_free, stpmin, stpmax)
    stpf3 = jnp.where(brackt, stpf3_brackt, stpf3_free)

    # --- case 4: lower value, same sign, not decreasing ---------------
    theta4 = 3.0 * (fp - fy) * safe_div(1.0, sty - stp) + dy + dp
    gamma4 = cubic_gamma(theta4, dy, dp, stp > sty)
    p4 = (gamma4 - dp) + theta4
    q4 = ((gamma4 - dp) + gamma4) + dy
    stpc4 = stp + safe_div(p4, q4) * (sty - stp)
    stpf4 = jnp.where(
        brackt, stpc4, jnp.where(stp > stx, stpmax, stpmin)
    )

    case1 = fp > fx
    case2 = (~case1) & (sgnd < 0.0)
    case3 = (~case1) & (~case2) & (jnp.abs(dp) < jnp.abs(dx))
    stpf = jnp.where(
        case1, stpf1, jnp.where(case2, stpf2, jnp.where(case3, stpf3, stpf4))
    )
    new_brackt = brackt | case1 | case2

    # interval update
    sty_n = jnp.where(case1, stp, jnp.where(sgnd < 0.0, stx, sty))
    fy_n = jnp.where(case1, fp, jnp.where(sgnd < 0.0, fx, fy))
    dy_n = jnp.where(case1, dp, jnp.where(sgnd < 0.0, dx, dy))
    stx_n = jnp.where(case1, stx, stp)
    fx_n = jnp.where(case1, fx, fp)
    dx_n = jnp.where(case1, dx, dp)

    return _StepState(stx_n, fx_n, dx_n, sty_n, fy_n, dy_n, stpf, new_brackt)


def _fd_value_and_grad(
    f_batch: Callable, x: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray
):
    """f(x) and scipy-exact 2-point forward-difference gradient.

    Mirrors scipy's ``approx_derivative`` as invoked by
    ``_minimize_lbfgsb`` with ``jac=None`` (_lbfgsb_py.py: eps=1e-8 →
    ScalarFunction abs_step; _numdiff.py:552-590):

    * ``h = 1e-8`` absolutely, for every component;
    * if ``(x + h) - x == 0`` in the working dtype, fall back to the
      relative rule ``sqrt(eps_dtype) * sign(x) * max(1, |x|)``
      (this is the live branch in TPU float32 mode);
    * 1-sided bound adjustment (_numdiff._adjust_scheme_to_bounds):
      sign-flip if the step leaves the box and the mirrored step fits,
      else truncate to the larger one-sided distance;
    * the divisor is the representable delta ``(x + h) - x``.

    ``f_batch`` maps (K, d) points to (K,) values so the d+1 evaluations
    fuse into one batched clearance kernel call.
    """
    dtype = x.dtype
    sign_x0 = jnp.where(x >= 0, 1.0, -1.0).astype(dtype)
    rel = jnp.sqrt(jnp.finfo(dtype).eps).astype(dtype)
    h_rel = rel * sign_x0 * jnp.maximum(1.0, jnp.abs(x))
    if dtype == jnp.float64:
        # scipy-exact: absolute 1e-8, falling back to the relative rule
        # only when the step is unrepresentable in x.
        h = jnp.full_like(x, _FD_ABS_STEP)
        h = jnp.where((x + h) - x == 0, h_rel, h)
    else:
        # reduced precision: 1e-8 may be representable in x yet vanish
        # against f's resolution (f32 eps_f ~ 4e-7 at f ~ 3.6 makes
        # every forward difference exactly 0 -> zero gradient -> the
        # optimiser "converges" at x0).  Use scipy's relative default
        # (rel_step=None formula) in the working dtype instead.
        h = h_rel
    # _adjust_scheme_to_bounds, scheme='1-sided', num_steps=1
    lower_dist = x - lower
    upper_dist = upper - x
    violated = ((x + h) < lower) | ((x + h) > upper)
    fitting = jnp.abs(h) <= jnp.maximum(lower_dist, upper_dist)
    h = jnp.where(violated & fitting, -h, h)
    h = jnp.where(~fitting & (upper_dist >= lower_dist), upper_dist, h)
    h = jnp.where(~fitting & (upper_dist < lower_dist), -lower_dist, h)

    probes = jnp.concatenate(
        [x[None, :], x[None, :] + jnp.diag(h)], axis=0
    )  # (d+1, d)
    vals = f_batch(probes)
    fx = vals[0]
    dx = (x + h) - x  # representable delta, as in _dense_difference
    g = (vals[1:] - fx) / dx
    return fx, g


class _SearchResult(NamedTuple):
    stp: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray  # full gradient at the accepted point
    nfev: jnp.ndarray
    failed: jnp.ndarray


def _dcsrch(
    f_batch, x, d, f0, g_vec0, stp0, stpmax_feasible, lower, upper, maxfev=20
):
    """Moré–Thuente line search along d from x (phi(t) = f(x + t d))."""

    def phi(stp):
        fx, g = _fd_value_and_grad(f_batch, x + stp * d, lower, upper)
        return fx, g

    return _dcsrch_phi(phi, d, f0, g_vec0, stp0, stpmax_feasible, maxfev)


def _dcsrch_phi(phi, d, f0, g_vec0, stp0, stpmax_feasible, maxfev=20):
    """dcsrch core over a generic evaluator ``phi(stp) -> (f, gvec)``.

    Every decision in dcsrch is a comparison of f *differences*
    (``f <= f0 + stp*gtest`` etc.), so the search is translation
    invariant: the stable float32 driver passes ``phi`` returning
    cancellation-free deltas with ``f0 = 0`` and gets the float64
    decision sequence without ever representing absolute f values.
    """
    dtype = f0.dtype
    g0 = _dot(g_vec0, d)
    gtest = _FTOL * g0

    stpmin = jnp.asarray(0.0, dtype)
    stpmax = stpmax_feasible

    init_step = _StepState(
        stx=jnp.asarray(0.0, dtype),
        fx=f0,
        dx=g0,
        sty=jnp.asarray(0.0, dtype),
        fy=f0,
        dy=g0,
        stp=stp0,
        brackt=jnp.asarray(False),
    )

    # state: step-state, stage1, stmin, stmax, width, width1, nfev,
    #        done, converged, (f, gvec) at current stp
    f_init, g_init = phi(stp0)
    state0 = (
        init_step,
        jnp.asarray(True),  # stage 1
        jnp.asarray(0.0, dtype),
        stp0 + _XTRAPU * stp0,
        stpmax - stpmin,
        (stpmax - stpmin) / 0.5,
        jnp.asarray(1, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(False),
        f_init,
        g_init,
    )

    def cond(state):
        (_, _, _, _, _, _, nfev, done, _, _, _) = state
        return (~done) & (nfev < maxfev + 1)

    def body(state):
        (st, stage1, stmin, stmax, width, width1, nfev, done, conv, f, gvec) = state
        stp = st.stp
        g = _dot(gvec, d)
        ftest = f0 + stp * gtest
        stage1_n = stage1 & ~((f <= ftest) & (g >= 0.0))

        converged = (f <= ftest) & (jnp.abs(g) <= _GTOL * (-g0))
        warn = (
            (st.brackt & ((stp <= stmin) | (stp >= stmax)))
            | (st.brackt & (stmax - stmin <= _XTOL * stmax))
            | ((stp == stpmax) & (f <= ftest) & (g <= gtest))
            | ((stp == stpmin) & ((f > ftest) | (g >= gtest)))
        )
        finished = converged | warn
        # modified-function stage-1 update
        use_mod = stage1_n & (f <= st.fx) & (f > ftest)
        fm = f - stp * gtest
        gm = g - gtest
        st_mod = _StepState(
            st.stx,
            st.fx - st.stx * gtest,
            st.dx - gtest,
            st.sty,
            st.fy - st.sty * gtest,
            st.dy - gtest,
            st.stp,
            st.brackt,
        )
        new_mod = _dcstep(st_mod, fm, gm, stmin, stmax)
        new_mod = new_mod._replace(
            fx=new_mod.fx + new_mod.stx * gtest,
            fy=new_mod.fy + new_mod.sty * gtest,
            dx=new_mod.dx + gtest,
            dy=new_mod.dy + gtest,
        )
        new_plain = _dcstep(st, f, g, stmin, stmax)
        new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(use_mod, a, b), new_mod, new_plain
        )

        # bisection safeguard
        bisect = new.brackt & (jnp.abs(new.sty - new.stx) >= 0.66 * width1)
        stp_n = jnp.where(
            bisect, new.stx + 0.5 * (new.sty - new.stx), new.stp
        )
        width1_n = jnp.where(new.brackt, width, width1)
        width_n = jnp.where(
            new.brackt, jnp.abs(new.sty - new.stx), width
        )
        stmin_n = jnp.where(
            new.brackt,
            jnp.minimum(new.stx, new.sty),
            stp_n + _XTRAPL * (stp_n - new.stx),
        )
        stmax_n = jnp.where(
            new.brackt,
            jnp.maximum(new.stx, new.sty),
            stp_n + _XTRAPU * (stp_n - new.stx),
        )
        stp_n = jnp.clip(stp_n, stpmin, stpmax)
        force_stx = (
            new.brackt & ((stp_n <= stmin_n) | (stp_n >= stmax_n))
        ) | (new.brackt & (stmax_n - stmin_n <= _XTOL * stmax_n))
        stp_n = jnp.where(force_stx, new.stx, stp_n)
        new = new._replace(stp=stp_n)

        # evaluate at the new trial point (only consumed if not finished)
        f_n, g_n = phi(stp_n)

        keep = finished | done
        st_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(keep, a, b), st, new
        )
        return (
            st_out,
            jnp.where(keep, stage1, stage1_n),
            jnp.where(keep, stmin, stmin_n),
            jnp.where(keep, stmax, stmax_n),
            jnp.where(keep, width, width_n),
            jnp.where(keep, width1, width1_n),
            jnp.where(keep, nfev, nfev + 1),
            done | finished,
            conv | (converged & ~done),
            jnp.where(keep, f, f_n),
            jnp.where(keep[..., None], gvec, g_n),
        )

    (st, _, _, _, _, _, nfev, done, conv, f, gvec) = jax.lax.while_loop(
        cond, body, state0
    )
    # dcsrch entry errors (initial derivative >= 0, stp0 beyond the
    # bracket) map to task='ERROR' in the Fortran → mainlb's restart
    # machinery, same as running out of evaluations.
    entry_error = (g0 >= 0.0) | (stp0 > stpmax) | (stp0 < stpmin)
    return _SearchResult(
        stp=st.stp, f=f, g=gvec, nfev=nfev,
        failed=(~(done | conv)) | entry_error,
    )


def _solve_small(a, b):
    """Solve a·x = b for d ≤ 3 in closed form (Cramer/adjugate).

    ``a`` here is the L-BFGS-B model Hessian restricted to free
    variables (positive definite, identity on fixed rows), so no
    pivoting is needed; avoiding ``jnp.linalg.solve`` keeps the hot
    while_loop free of LU kernels (which TPU doesn't even lower for
    f64) and off the latency-chain critical path.
    """
    d = a.shape[-1]
    if d == 1:
        return b / a[..., 0, 0][..., None]
    if d == 2:
        det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
        inv = (
            jnp.stack(
                [
                    jnp.stack([a[1, 1], -a[0, 1]]),
                    jnp.stack([-a[1, 0], a[0, 0]]),
                ]
            )
            / det
        )
        return _matvec(inv, b)
    if d == 3:
        c00 = a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1]
        c01 = a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2]
        c02 = a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]
        det = a[0, 0] * c00 + a[0, 1] * c01 + a[0, 2] * c02
        c10 = a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2]
        c11 = a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0]
        c12 = a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1]
        c20 = a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1]
        c21 = a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2]
        c22 = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
        adj = jnp.stack(
            [
                jnp.stack([c00, c10, c20]),
                jnp.stack([c01, c11, c21]),
                jnp.stack([c02, c12, c22]),
            ]
        )
        return _matvec(adj, b) / det
    return jnp.linalg.solve(a, b)


def _dot(a, b):
    """Fixed-association small dot product.

    Unrolled ``a[0]*b[0] + a[1]*b[1] + ...`` so XLA emits the identical
    elementwise add chain whether or not the caller is vmapped: batched
    (trajectory) and serial (single-molecule) analyses must agree
    bitwise, and reduction ops may change association with layout.
    Also keeps TPU float32 mode off the MXU (bf16 operand truncation
    would wreck FD-scale gradients).
    """
    d = a.shape[-1]
    if d > 8:  # pragma: no cover - optimiser dims are <= 3
        return jnp.vdot(a, b)
    acc = a[..., 0] * b[..., 0]
    for i in range(1, d):
        acc = acc + a[..., i] * b[..., i]
    return acc


def _matvec(a, v):
    """d×d · d matvec via _dot rows (d ≤ 3), layout-invariant."""
    return jnp.stack([_dot(a[i], v) for i in range(a.shape[0])])


def _build_b(s_ord, y_ord, valid, theta, d_dim):
    """The L-BFGS-B limited-memory matrix B_k, as an explicit (d, d) array.

    Applies the stored BFGS updates to ``theta * I`` in chronological
    order — in exact arithmetic this equals the Byrd–Nocedal–Schnabel
    compact form ``theta*I - W M W^T`` the Fortran code factorises
    (formk/formt), but costs only m rank-2 updates of a d×d (d ≤ 3)
    matrix instead of a 2m×2m solve.
    """
    dtype = s_ord.dtype
    b0 = theta * jnp.eye(d_dim, dtype=dtype)

    def upd(k, b):
        s = s_ord[k]
        y = y_ord[k]
        bs = _matvec(b, s)
        sbs = _dot(s, bs)
        sy = _dot(s, y)
        bn = (
            b
            - jnp.outer(bs, bs) / jnp.where(sbs == 0.0, 1.0, sbs)
            + jnp.outer(y, y) / jnp.where(sy == 0.0, 1.0, sy)
        )
        return jnp.where(valid[k], bn, b)

    return jax.lax.fori_loop(0, s_ord.shape[0], upd, b0)


def _cauchy(x, g, lower, upper, bmat, theta, epsmch):
    """Generalized Cauchy point of the quadratic model (Fortran cauchy).

    Walks the piecewise-linear projected steepest-descent path
    ``P(x - t g)`` breakpoint by breakpoint, minimising the model on
    each segment.  The segment derivative f1 and curvature f2 are
    recomputed from the explicit B each segment (n ≤ 3 here), which is
    mathematically identical to the Fortran's incremental updates.

    Returns ``(xcp - x, free_mask)``: free variables are those still
    moving when the Cauchy point is reached.
    """
    dtype = x.dtype
    d_dim = x.shape[-1]
    big = jnp.asarray(1e30, dtype)

    # breakpoints: g>0 moves toward lower, g<0 toward upper, g==0 never.
    safe_g = jnp.where(g == 0.0, 1.0, g)
    t_break = jnp.where(
        g > 0.0,
        (x - lower) / safe_g,
        jnp.where(g < 0.0, (x - upper) / safe_g, big),
    )
    moving0 = t_break > 0.0
    d0 = jnp.where(moving0, -g, 0.0)
    f2_org = theta * _dot(d0, d0)

    def seg(_, carry):
        z, dvec, moving, found, xcp_z, t_old = carry
        bd = _matvec(bmat, dvec)
        f1 = _dot(g, dvec) + _dot(z, bd)
        f2 = jnp.maximum(_dot(dvec, bd), epsmch * f2_org)
        dtm = -f1 / jnp.where(f2 == 0.0, 1.0, f2)

        t_cand = jnp.where(moving, t_break, big)
        b_idx = jnp.argmin(t_cand)
        t_next = t_cand[b_idx]
        no_more = t_next >= big
        dt = t_next - t_old
        inside = (dtm < dt) | no_more
        xcp_candidate = z + jnp.maximum(dtm, 0.0) * dvec

        # advance to the breakpoint: variable b lands exactly on its bound
        z_bp = z + dt * dvec
        zb = jnp.where(dvec[b_idx] > 0.0, upper[b_idx], lower[b_idx]) - x[b_idx]
        z_bp = z_bp.at[b_idx].set(zb)
        dvec_bp = dvec.at[b_idx].set(0.0)
        moving_bp = moving.at[b_idx].set(False)

        freeze = found | inside
        return (
            jnp.where(freeze, z, z_bp),
            jnp.where(freeze, dvec, dvec_bp),
            jnp.where(freeze, moving, moving_bp),
            found | inside,
            jnp.where(found, xcp_z, jnp.where(inside, xcp_candidate, xcp_z)),
            jnp.where(freeze, t_old, t_next),
        )

    carry = (
        jnp.zeros_like(x),
        d0,
        moving0,
        jnp.asarray(False),
        jnp.zeros_like(x),
        jnp.asarray(0.0, dtype),
    )
    # unrolled: d_dim <= 3, and a lax.fori_loop here lowers to a nested
    # hardware while inside every optimiser trip — pure loop-entry
    # latency on the critical chain (the segment count is static and
    # tiny).  Identical op sequence, no while.
    for _ in range(d_dim + 1):
        carry = seg(0, carry)
    _, _, moving, _, xcp_z, _ = carry
    return xcp_z, moving


def _subsm(x, g, bmat, xcp, free, lower, upper):
    """Subspace minimisation, lbfgsb 3.0 subsm semantics.

    Newton step of the model over the free variables from the Cauchy
    point; if it leaves the box, project it and accept the projection
    when ``(z_proj - x)·g <= 0`` (a model descent direction), otherwise
    fall back to the truncated-alpha step with the blocking variable
    snapped exactly onto its bound (Morales & Nocedal 2011 / subsm
    do-55/do-60 blocks).
    """
    dtype = x.dtype
    big = jnp.asarray(1e30, dtype)
    freef = free.astype(dtype)
    r = g + _matvec(bmat, xcp - x)
    bmod = bmat * jnp.outer(freef, freef) + jnp.diag(1.0 - freef)
    dsub = _solve_small(bmod, -(r * freef))
    dsub = dsub * freef  # exact zeros on fixed vars

    zt = xcp + dsub
    viol = free & ((zt < lower) | (zt > upper))
    iword = jnp.any(viol)
    zproj = jnp.clip(zt, lower, upper)
    dd_p = _dot(zproj - x, g)

    # alpha fallback (Fortran do-60): largest alpha <= 1 keeping
    # xcp + alpha*dsub feasible; candidates are 0 when xcp already sits
    # on the relevant bound.
    safe_d = jnp.where(dsub == 0.0, 1.0, dsub)
    low_gap = lower - xcp
    up_gap = upper - xcp
    cand = jnp.where(
        free & (dsub < 0.0),
        jnp.where(low_gap >= 0.0, 0.0, low_gap / safe_d),
        big,
    )
    cand = jnp.where(
        free & (dsub > 0.0),
        jnp.where(up_gap <= 0.0, 0.0, up_gap / safe_d),
        cand,
    )
    alpha = jnp.minimum(jnp.asarray(1.0, dtype), jnp.min(cand))
    ibd = jnp.argmin(cand)
    z_alpha = xcp + alpha * dsub
    bound_b = jnp.where(dsub[ibd] > 0.0, upper[ibd], lower[ibd])
    z_alpha = jnp.where(
        alpha < 1.0, z_alpha.at[ibd].set(bound_b), z_alpha
    )

    z = jnp.where(iword & (dd_p > 0.0), z_alpha, zproj)
    return jnp.where(jnp.any(free), z, xcp)


class LbfgsbResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    nit: jnp.ndarray
    converged: jnp.ndarray
    #: stopped by the iteration/trips budget, not by any of scipy's own
    #: termination conditions — the result would differ with a larger
    #: ``maxiter``.  Drives the fast-budget escalation retry (see
    #: AnalysisConfig.fast_budgets).  Python ``False`` default keeps
    #: import free of backend init.
    capped: jnp.ndarray | bool = False


def lbfgsb_minimize(
    f_batch: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    m: int = _M,
    maxiter: int = 50,
    pgtol: float = 1e-5,
    factr: float = 1e7,
    maxls: int = 20,
) -> LbfgsbResult:
    """Minimise ``f`` within box bounds, scipy-L-BFGS-B-compatible.

    ``f_batch``: maps (K, d) probe points to (K,) values (batched so the
    d+1 FD evaluations fuse into one clearance-kernel call).
    """
    dtype = x0.dtype
    d_dim = x0.shape[-1]
    tol = factr * _EPS64
    epsmch = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    # bounds at |b| >= 1e9 are "infinite" sentinels; 'boxed' means every
    # variable has both finite bounds (drives the Fortran driver's
    # first-step rule in lnsrlb).
    boxed = jnp.all(jnp.abs(lower) < 1e9) & jnp.all(jnp.abs(upper) < 1e9)

    x = jnp.clip(x0, lower, upper)
    fx, g = _fd_value_and_grad(f_batch, x, lower, upper)

    s_hist = jnp.zeros((m, d_dim), dtype)
    y_hist = jnp.zeros((m, d_dim), dtype)
    state0 = (
        x,
        fx,
        g,
        s_hist,
        y_hist,
        jnp.asarray(1.0, dtype),  # theta
        jnp.asarray(0, jnp.int32),  # pairs stored so far (histories are
        #                             chronological; capped reads at m)
        jnp.asarray(0, jnp.int32),  # iteration (successful steps only)
        jnp.asarray(0, jnp.int32),  # while-loop trips incl. restarts
        jnp.asarray(False),  # done
        jnp.asarray(False),  # converged flag
    )

    def body(state):
        (x, fx, g, s_hist, y_hist, theta, n_pairs, it, trips, done,
         conv) = state

        col = jnp.minimum(n_pairs, m)
        # the histories are stored chronologically (shift-on-overflow,
        # see the update below), so no ring-index gather is needed —
        # TPU gathers inside the while body were a measurable cost
        valid = jnp.arange(m, dtype=jnp.int32) < col
        s_ord = jnp.where(valid[:, None], s_hist, 0.0)
        y_ord = jnp.where(valid[:, None], y_hist, 0.0)
        bmat = _build_b(s_ord, y_ord, valid, theta, d_dim)

        xcp_z, free = _cauchy(x, g, lower, upper, bmat, theta, epsmch)
        xcp = x + xcp_z
        z = jnp.where(col > 0, _subsm(x, g, bmat, xcp, free, lower, upper),
                      xcp)
        d = z - x
        dnorm = jnp.sqrt(_dot(d, d))
        gd_old = _dot(g, d)

        # lnsrlb step rules: the first constrained iteration caps the
        # search at step 1; later iterations take the true distance to
        # the box along d; the first step is 1 unless the problem is
        # not fully boxed (then min(1/|d|, stpmax)).
        big = jnp.asarray(1e10, dtype)
        step_to_bound = jnp.where(
            d > 0,
            (upper - x) / jnp.where(d == 0, 1.0, d),
            jnp.where(d < 0, (lower - x) / jnp.where(d == 0, 1.0, d), big),
        )
        first = it == 0
        stpmx = jnp.where(
            first,
            jnp.asarray(1.0, dtype),
            jnp.minimum(jnp.min(step_to_bound), big),
        )
        inv_dnorm = 1.0 / jnp.where(dnorm == 0, 1.0, dnorm)
        stp0 = jnp.where(
            first & ~boxed,
            jnp.minimum(inv_dnorm, stpmx),
            jnp.asarray(1.0, dtype),
        )

        res = _dcsrch(
            f_batch, x, d, fx, g, stp0, stpmx, lower, upper, maxfev=maxls
        )
        ls_failed = res.failed
        xn = x + res.stp * d
        fn = res.f
        gn = res.g

        # mainlb convergence tests, in order: projected gradient at the
        # new point, then relative f reduction.
        pg = xn - jnp.clip(xn - gn, lower, upper)
        pg_done = jnp.max(jnp.abs(pg)) <= pgtol
        f_reduction_done = (fx - fn) <= tol * jnp.maximum(
            jnp.maximum(jnp.abs(fx), jnp.abs(fn)), 1.0
        )
        step_ok = ~ls_failed
        new_conv = step_ok & (pg_done | f_reduction_done)

        # curvature pair update (mainlb dr/ddum + matupd)
        gd = _dot(gn, d)
        one_step = res.stp == 1.0
        dr = jnp.where(one_step, gd - gd_old, (gd - gd_old) * res.stp)
        ddum = jnp.where(one_step, -gd_old, -gd_old * res.stp)
        store = step_ok & (dr > _EPS64 * ddum)
        s = res.stp * d
        y = gn - g
        # chronological append: write at the next free slot while the
        # history is filling, shift-left (a static slice, not a gather)
        # once full — the stored values and their order are identical
        # to the Fortran ring buffer's logical view
        full = n_pairs >= m
        write_at = jnp.minimum(n_pairs, m - 1)
        s_app = s_hist.at[write_at].set(s)
        y_app = y_hist.at[write_at].set(y)
        s_shift = jnp.concatenate([s_hist[1:], s[None, :]], axis=0)
        y_shift = jnp.concatenate([y_hist[1:], y[None, :]], axis=0)
        s_hist_n = jnp.where(
            store, jnp.where(full, s_shift, s_app), s_hist
        )
        y_hist_n = jnp.where(
            store, jnp.where(full, y_shift, y_app), y_hist
        )
        n_pairs_n = jnp.where(store, n_pairs + 1, n_pairs)
        rr = _dot(y, y)
        theta_n = jnp.where(store, rr / jnp.where(dr == 0, 1.0, dr), theta)

        # mainlb restart machinery: a line-search failure with stored
        # pairs wipes the memory (theta=1) and retries from the same
        # iterate without counting an iteration; with no history it
        # terminates abnormally.
        restart = ls_failed & (col > 0)
        fatal = ls_failed & (col == 0)
        n_pairs_n = jnp.where(restart, 0, n_pairs_n)
        theta_n = jnp.where(restart, 1.0, theta_n)

        # on any failure the trial point is discarded
        xn = jnp.where(ls_failed, x, xn)
        fn = jnp.where(ls_failed, fx, fn)
        gn = jnp.where(ls_failed, g, gn)

        new_done = new_conv | fatal

        keep = done
        return (
            jnp.where(keep, x, xn),
            jnp.where(keep, fx, fn),
            jnp.where(keep, g, gn),
            jnp.where(keep, s_hist, s_hist_n),
            jnp.where(keep, y_hist, y_hist_n),
            jnp.where(keep, theta, theta_n),
            jnp.where(keep, n_pairs, n_pairs_n),
            it + jnp.where(keep | ls_failed, 0, 1),
            trips + 1,
            done | new_done,
            conv | (~keep & new_conv),
        )

    def cond(state):
        x, fx, g, _, _, _, _, it, trips, done, _ = state
        pg = x - jnp.clip(x - g, lower, upper)
        return (
            (~done)
            & (it < maxiter)
            & (trips < 2 * maxiter + 4)
            & (jnp.max(jnp.abs(pg)) > pgtol)
        )

    x, fx, g, _, _, _, _, it, _, done, conv = jax.lax.while_loop(
        cond, body, state0
    )
    pg0 = x - jnp.clip(x - g, lower, upper)
    pg_small = jnp.max(jnp.abs(pg0)) <= pgtol
    conv = conv | pg_small
    # exit with neither a scipy termination (done: convergence or
    # abnormal line-search end) nor a small projected gradient means
    # the it/trips budget stopped us — a larger maxiter would continue.
    capped = ~done & ~pg_small
    return LbfgsbResult(x=x, fun=fx, nit=it, converged=conv, capped=capped)


def _stable_fd_h(p, lower, upper, fd_step):
    """scipy's FD step at ``p`` for the symbolic-displacement evaluator.

    The absolute step ``h = 1e-8`` (scipy's L-BFGS-B ``jac=None``
    default) is used *directly* — the stable evaluator never forms
    ``p + h``, so representability of the step in the working dtype is
    irrelevant and the float32 relative-step fallback of
    :func:`_fd_value_and_grad` is unnecessary.  The 1-sided bound
    adjustment (`_adjust_scheme_to_bounds`) is applied on the exact
    distances: with ``h > 0`` the only possible violation is
    ``upper - p < h`` (in float32 that triggers when p sits exactly on
    the bound — which is where subsm snaps iterates).
    """
    dtype = p.dtype
    h = jnp.full_like(p, fd_step)
    lower_dist = p - lower
    upper_dist = upper - p
    violated = upper_dist < h
    fitting = jnp.abs(h) <= jnp.maximum(lower_dist, upper_dist)
    h = jnp.where(violated & fitting, -h, h)
    h = jnp.where(~fitting & (upper_dist >= lower_dist), upper_dist, h)
    h = jnp.where(~fitting & (upper_dist < lower_dist), -lower_dist, h)
    return h.astype(dtype)


def lbfgsb_minimize_stable(
    probe: Callable,
    f_abs: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    m: int = _M,
    maxiter: int = 50,
    pgtol: float = 1e-5,
    factr: float = 1e7,
    maxls: int = 20,
    fd_step: float = _FD_ABS_STEP,
) -> LbfgsbResult:
    """Float32-native L-BFGS-B with float64-grade stopping behaviour.

    The scipy algorithm consumes the objective only through
    *differences*: FD gradients ``(f(x+h e_i) - f(x))/h``, line-search
    sufficient-decrease tests ``f(x+t d) - f(x) <= t * gtest``, and the
    ``factr`` reduction test.  In plain float32 those differences are
    cancellation noise at scipy's ``h = 1e-8`` scale, which is why a
    naive f32 run stops ~0.13 Å from the float64 point on plateau
    clearance fields (and why the previous production mode promoted
    this stage to emulated f64 on TPU — a measured 29% pipeline cost).

    Here every difference is evaluated *symbolically* by ``probe``:

    ``probe(x, disp, h) -> (f(x+disp) - f(x), grad_h f at x+disp)``

    where the displacement never touches the representation of ``x``
    (see :func:`pywindow_tpu.ops.geometry.clearance_diff`), so the
    deltas carry full float32 *relative* precision of the difference
    itself — accuracy comparable to f64 absolute-f differencing.  The
    whole driver then runs in delta space: the line search gets
    ``f0 = 0`` (dcsrch is translation-invariant, see
    :func:`_dcsrch_phi`), and the ``factr`` test uses the exact
    per-iteration delta.  Absolute f (``f_abs``) is only consulted for
    the ``factr`` magnitude scale and the reported ``fun``.

    Matches :func:`lbfgsb_minimize` in every other algorithmic detail
    (GCP, subsm, restart machinery, lnsrlb step rules — reference
    behaviour: utilities.py:400-426).
    """
    dtype = x0.dtype
    d_dim = x0.shape[-1]
    tol = factr * _EPS64
    epsmch = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    boxed = jnp.all(jnp.abs(lower) < 1e9) & jnp.all(jnp.abs(upper) < 1e9)
    zero = jnp.asarray(0.0, dtype)

    def grad_at(x):
        h = _stable_fd_h(x, lower, upper, fd_step)
        _, g = probe(x, jnp.zeros_like(x), h)
        return g

    x = jnp.clip(x0, lower, upper)
    fx_abs = f_abs(x)
    g = grad_at(x)

    s_hist = jnp.zeros((m, d_dim), dtype)
    y_hist = jnp.zeros((m, d_dim), dtype)
    state0 = (
        x,
        fx_abs,
        g,
        s_hist,
        y_hist,
        jnp.asarray(1.0, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(False),
    )

    def body(state):
        (x, fx_abs, g, s_hist, y_hist, theta, n_pairs, it, trips, done,
         conv) = state

        col = jnp.minimum(n_pairs, m)
        valid = jnp.arange(m, dtype=jnp.int32) < col
        s_ord = jnp.where(valid[:, None], s_hist, 0.0)
        y_ord = jnp.where(valid[:, None], y_hist, 0.0)
        bmat = _build_b(s_ord, y_ord, valid, theta, d_dim)

        xcp_z, free = _cauchy(x, g, lower, upper, bmat, theta, epsmch)
        xcp = x + xcp_z
        z = jnp.where(col > 0, _subsm(x, g, bmat, xcp, free, lower, upper),
                      xcp)
        d = z - x
        dnorm = jnp.sqrt(_dot(d, d))
        gd_old = _dot(g, d)

        big = jnp.asarray(1e10, dtype)
        step_to_bound = jnp.where(
            d > 0,
            (upper - x) / jnp.where(d == 0, 1.0, d),
            jnp.where(d < 0, (lower - x) / jnp.where(d == 0, 1.0, d), big),
        )
        first = it == 0
        stpmx = jnp.where(
            first,
            jnp.asarray(1.0, dtype),
            jnp.minimum(jnp.min(step_to_bound), big),
        )
        inv_dnorm = 1.0 / jnp.where(dnorm == 0, 1.0, dnorm)
        stp0 = jnp.where(
            first & ~boxed,
            jnp.minimum(inv_dnorm, stpmx),
            jnp.asarray(1.0, dtype),
        )

        def phi(stp):
            disp = stp * d
            h = _stable_fd_h(x + disp, lower, upper, fd_step)
            return probe(x, disp, h)

        res = _dcsrch_phi(phi, d, zero, g, stp0, stpmx, maxfev=maxls)
        ls_failed = res.failed
        xn = x + res.stp * d
        delta = res.f  # f(xn) - f(x), cancellation-free
        gn = res.g

        pg = xn - jnp.clip(xn - gn, lower, upper)
        pg_done = jnp.max(jnp.abs(pg)) <= pgtol
        fn_abs = fx_abs + delta
        f_reduction_done = (-delta) <= tol * jnp.maximum(
            jnp.maximum(jnp.abs(fx_abs), jnp.abs(fn_abs)), 1.0
        )
        # delta-space resolution outlives the iterate's: once the
        # accepted step rounds to zero in the working dtype the iterate
        # provably cannot move again (same x -> same gradient -> same
        # direction), yet the symbolic deltas keep reporting ~1e-9
        # "reductions" that never trip factr.  Scipy-f64 never hits
        # this (factr fires ~7 decades above its iterate resolution);
        # here it is the dtype-correct convergence criterion.
        stalled = jnp.all(xn == x)
        step_ok = ~ls_failed
        new_conv = step_ok & (pg_done | f_reduction_done | stalled)

        gd = _dot(gn, d)
        one_step = res.stp == 1.0
        dr = jnp.where(one_step, gd - gd_old, (gd - gd_old) * res.stp)
        ddum = jnp.where(one_step, -gd_old, -gd_old * res.stp)
        store = step_ok & (dr > _EPS64 * ddum)
        s = res.stp * d
        y = gn - g
        full = n_pairs >= m
        write_at = jnp.minimum(n_pairs, m - 1)
        s_app = s_hist.at[write_at].set(s)
        y_app = y_hist.at[write_at].set(y)
        s_shift = jnp.concatenate([s_hist[1:], s[None, :]], axis=0)
        y_shift = jnp.concatenate([y_hist[1:], y[None, :]], axis=0)
        s_hist_n = jnp.where(store, jnp.where(full, s_shift, s_app), s_hist)
        y_hist_n = jnp.where(store, jnp.where(full, y_shift, y_app), y_hist)
        n_pairs_n = jnp.where(store, n_pairs + 1, n_pairs)
        rr = _dot(y, y)
        theta_n = jnp.where(store, rr / jnp.where(dr == 0, 1.0, dr), theta)

        restart = ls_failed & (col > 0)
        fatal = ls_failed & (col == 0)
        n_pairs_n = jnp.where(restart, 0, n_pairs_n)
        theta_n = jnp.where(restart, 1.0, theta_n)

        xn = jnp.where(ls_failed, x, xn)
        fn_abs = jnp.where(ls_failed, fx_abs, fn_abs)
        gn = jnp.where(ls_failed, g, gn)

        new_done = new_conv | fatal

        keep = done
        return (
            jnp.where(keep, x, xn),
            jnp.where(keep, fx_abs, fn_abs),
            jnp.where(keep, g, gn),
            jnp.where(keep, s_hist, s_hist_n),
            jnp.where(keep, y_hist, y_hist_n),
            jnp.where(keep, theta, theta_n),
            jnp.where(keep, n_pairs, n_pairs_n),
            it + jnp.where(keep | ls_failed, 0, 1),
            trips + 1,
            done | new_done,
            conv | (~keep & new_conv),
        )

    def cond(state):
        x, fx_abs, g, _, _, _, _, it, trips, done, _ = state
        pg = x - jnp.clip(x - g, lower, upper)
        return (
            (~done)
            & (it < maxiter)
            & (trips < 2 * maxiter + 4)
            & (jnp.max(jnp.abs(pg)) > pgtol)
        )

    x, fx_abs, g, _, _, _, _, it, _, done, conv = jax.lax.while_loop(
        cond, body, state0
    )
    pg0 = x - jnp.clip(x - g, lower, upper)
    pg_small = jnp.max(jnp.abs(pg0)) <= pgtol
    conv = conv | pg_small
    capped = ~done & ~pg_small  # budget-stopped (see lbfgsb_minimize)
    return LbfgsbResult(
        x=x, fun=fx_abs, nit=it, converged=conv, capped=capped
    )
