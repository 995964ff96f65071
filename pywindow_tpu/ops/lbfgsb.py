"""Batched on-device bounded minimiser mimicking scipy's L-BFGS-B.

The reference optimises the pore centre and the window z coordinate with
``scipy.optimize.minimize(..., bounds=...)`` — Fortran L-BFGS-B with
2-point finite-difference gradients and the Moré–Thuente (MINPACK-2
``dcsrch``/``dcstep``) line search (reference: utilities.py:400-426,
:1301-1305).  The objectives are piecewise-smooth clearance fields; where
they stop on a kink ridge is determined by those exact algorithmic
details, so golden-value parity requires reproducing them, not merely
optimising better.  This module is a faithful jnp port:

* 2-point forward FD gradients with scipy's step rule
  ``h_i = sqrt(eps_f64) * max(1, |x_i|) * sign(x_i)``,
* the dcsrch line search with ``ftol=1e-3, gtol=0.9, xtol=0.1`` and the
  L-BFGS-B step/stpmax initialisation,
* L-BFGS two-loop with m=10 ring history and the curvature skip rule,
* termination on ``pgtol`` (projected gradient) and ``factr`` (relative f
  reduction), matching scipy defaults.

Everything is ``lax.while_loop`` state-machine code: jit-able and
``vmap``-able across molecules / windows / frames (converged lanes hold
their state while the rest finish).  Validated against scipy L-BFGS-B to
<3e-4 on the six reference cages (see tests/test_optim.py).

The only simplification vs the Fortran code: the gradient-projection /
subspace-minimisation machinery for *active* bounds is replaced by exact
feasible-step clipping (``stpmax`` = distance to the box along the search
direction).  The reference's optima are interior, where the two coincide.
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
# FD steps are dtype-aware — see _fd_value_and_grad.


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
        return p / jnp.where(q == 0.0, 1e-300, q)

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


def _fd_value_and_grad(f_batch: Callable, x: jnp.ndarray):
    """f(x) and scipy-style 2-point forward-difference gradient.

    ``f_batch`` maps (K, d) points to (K,) values so the d+1 evaluations
    fuse into one batched clearance kernel call.
    """
    d = x.shape[-1]
    # scipy's rel step sqrt(eps) — of the *working* dtype: the f64 value
    # (1.5e-8) is below float32 resolution and would yield garbage
    # gradients in TPU f32 mode.
    rel = jnp.sqrt(jnp.finfo(x.dtype).eps).astype(x.dtype)
    h = rel * jnp.maximum(1.0, jnp.abs(x)) * jnp.where(x >= 0, 1.0, -1.0)
    probes = jnp.concatenate(
        [x[None, :], x[None, :] + jnp.diag(h)], axis=0
    )  # (d+1, d)
    vals = f_batch(probes)
    fx = vals[0]
    g = (vals[1:] - fx) / h
    return fx, g


class _SearchResult(NamedTuple):
    stp: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray  # full gradient at the accepted point
    nfev: jnp.ndarray
    failed: jnp.ndarray


def _dcsrch(f_batch, x, d, f0, g_vec0, stp0, stpmax_feasible, maxfev=20):
    """Moré–Thuente line search along d from x (phi(t) = f(x + t d))."""
    dtype = f0.dtype
    g0 = jnp.vdot(g_vec0, d)
    gtest = _FTOL * g0

    def phi(stp):
        fx, g = _fd_value_and_grad(f_batch, x + stp * d)
        return fx, g

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
        g = jnp.vdot(gvec, d)
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
    return _SearchResult(
        stp=st.stp, f=f, g=gvec, nfev=nfev, failed=~(done | conv)
    )


class LbfgsbResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    nit: jnp.ndarray
    converged: jnp.ndarray


def lbfgsb_minimize(
    f_batch: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    m: int = 10,
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
    # bounds at |b| >= 1e9 are "infinite" sentinels; 'boxed' means every
    # variable has both finite bounds (drives the Fortran driver's
    # first-step rule in lnsrlb).
    boxed = jnp.all(jnp.abs(lower) < 1e9) & jnp.all(jnp.abs(upper) < 1e9)

    x = jnp.clip(x0, lower, upper)
    fx, g = _fd_value_and_grad(f_batch, x)

    s_hist = jnp.zeros((m, d_dim), dtype)
    y_hist = jnp.zeros((m, d_dim), dtype)
    rho = jnp.zeros((m,), dtype)  # 1/(y.s); 0 marks an empty slot
    state0 = (
        x,
        fx,
        g,
        s_hist,
        y_hist,
        rho,
        jnp.asarray(0, jnp.int32),  # pairs stored so far (ring indices
        #                             wrap modulo m; this keeps counting)
        jnp.asarray(0, jnp.int32),  # iteration
        jnp.asarray(False),  # done
        jnp.asarray(False),  # converged flag
        jnp.asarray(False),  # restarted once after a line-search failure
    )

    def two_loop(g, s_hist, y_hist, rho, n_pairs):
        q = g

        def bwd(i, carry):
            q, alphas = carry
            slot = (n_pairs - 1 - i) % m
            valid = i < n_pairs
            a = jnp.where(valid, rho[slot] * jnp.vdot(s_hist[slot], q), 0.0)
            q = q - a * y_hist[slot]
            return q, alphas.at[slot].set(a)

        q, alphas = jax.lax.fori_loop(
            0, m, bwd, (q, jnp.zeros((m,), dtype))
        )
        last = (n_pairs - 1) % m
        sy = jnp.vdot(s_hist[last], y_hist[last])
        yy = jnp.vdot(y_hist[last], y_hist[last])
        gamma = jnp.where(n_pairs > 0, sy / jnp.where(yy == 0, 1.0, yy), 1.0)
        q = q * gamma

        def fwd(i, q):
            slot = (n_pairs - m + i) % m  # oldest first among stored
            idx = jnp.where(n_pairs < m, i, slot)
            valid = i < n_pairs
            b = jnp.where(
                valid, rho[idx] * jnp.vdot(y_hist[idx], q), 0.0
            )
            return q + s_hist[idx] * (alphas[idx] - b)

        return jax.lax.fori_loop(0, m, fwd, q)

    def body(state):
        (x, fx, g, s_hist, y_hist, rho, n_pairs, it, done, conv,
         restarted) = state

        q = two_loop(g, s_hist, y_hist, rho, n_pairs)
        d = -q
        d = jnp.where(jnp.vdot(d, g) >= 0.0, -g, d)
        dnorm = jnp.linalg.norm(d)
        gd_old = jnp.vdot(g, d)

        # max feasible step along d; the Fortran driver (lnsrlb) caps
        # the first constrained iteration's line search at step 1.0 and
        # starts fully-boxed problems directly at step 1.0.
        big = jnp.asarray(1e10, dtype)
        step_to_bound = jnp.where(
            d > 0,
            (upper - x) / jnp.where(d == 0, 1.0, d),
            jnp.where(d < 0, (lower - x) / jnp.where(d == 0, 1.0, d), big),
        )
        feasible = jnp.minimum(jnp.min(step_to_bound), big)
        first = it == 0
        stpmx = jnp.where(
            first, jnp.minimum(feasible, jnp.asarray(1.0, dtype)), feasible
        )
        inv_dnorm = 1.0 / jnp.where(dnorm == 0, 1.0, dnorm)
        stp0 = jnp.where(
            first & ~boxed,
            jnp.minimum(inv_dnorm, stpmx),
            jnp.minimum(jnp.asarray(1.0, dtype), stpmx),
        )

        res = _dcsrch(f_batch, x, d, fx, g, stp0, stpmx, maxfev=maxls)
        ls_failed = res.failed
        xn = x + res.stp * d
        fn = res.f
        gn = res.g

        s = xn - x
        y = gn - g
        sy = jnp.vdot(s, y)
        # curvature skip rule as in mainlb: dr <= epsmch * (-stp * gd_old)
        store = (~ls_failed) & (
            sy > _EPS64 * (-res.stp * gd_old)
        )
        slot = n_pairs % m
        s_hist_n = jnp.where(store, s_hist.at[slot].set(s), s_hist)
        y_hist_n = jnp.where(store, y_hist.at[slot].set(y), y_hist)
        rho_n = jnp.where(
            store, rho.at[slot].set(1.0 / jnp.where(sy == 0, 1.0, sy)), rho
        )
        n_pairs_n = jnp.where(store, n_pairs + 1, n_pairs)

        # line-search failure handling as in mainlb: first failure wipes
        # the L-BFGS memory and restarts from the same iterate with
        # steepest descent; a second failure terminates at the previous
        # (not the failed trial) point.
        first_fail = ls_failed & ~restarted
        second_fail = ls_failed & restarted
        n_pairs_n = jnp.where(first_fail, 0, n_pairs_n)
        restarted_n = restarted | ls_failed

        # on any failure the trial point is discarded
        xn = jnp.where(ls_failed, x, xn)
        fn = jnp.where(ls_failed, fx, fn)
        gn = jnp.where(ls_failed[..., None] if ls_failed.ndim else ls_failed,
                       g, gn)

        f_reduction_done = (~ls_failed) & (
            (fx - fn)
            <= tol
            * jnp.maximum(jnp.maximum(jnp.abs(fx), jnp.abs(fn)), 1.0)
        )
        pg = xn - jnp.clip(xn - gn, lower, upper)
        pg_done = jnp.max(jnp.abs(pg)) <= pgtol
        new_done = f_reduction_done | pg_done | second_fail

        keep = done
        return (
            jnp.where(keep, x, xn),
            jnp.where(keep, fx, fn),
            jnp.where(keep[..., None] if keep.ndim else keep, g, gn),
            jnp.where(keep, s_hist, s_hist_n),
            jnp.where(keep, y_hist, y_hist_n),
            jnp.where(keep, rho, rho_n),
            jnp.where(keep, n_pairs, n_pairs_n),
            it + jnp.where(keep, 0, 1),
            done | new_done,
            conv | (~keep & (f_reduction_done | pg_done)),
            jnp.where(keep, restarted, restarted_n),
        )

    def cond(state):
        x, fx, g, _, _, _, _, it, done, _, _ = state
        pg = x - jnp.clip(x - g, lower, upper)
        return (~done) & (it < maxiter) & (jnp.max(jnp.abs(pg)) > pgtol)

    x, fx, g, _, _, _, _, it, done, conv, _ = jax.lax.while_loop(
        cond, body, state0
    )
    pg0 = x - jnp.clip(x - g, lower, upper)
    conv = conv | (jnp.max(jnp.abs(pg0)) <= pgtol)
    return LbfgsbResult(x=x, fun=fx, nit=it, converged=conv)
