"""Fused Pallas TPU kernel for the stable L-BFGS-B driver.

The jnp driver (:func:`pywindow_tpu.ops.lbfgsb.lbfgsb_minimize_stable`)
vmapped over a trajectory batch is the pipeline's single largest device
cost: at B=4320 the pore-centre stage measures ~6 ms per outer
iteration, of which <1 ms is clearance math — the rest is XLA op
dispatch of the while-loop state machine (hundreds of tiny fusions over
(B,3)/(B,10,3) arrays per trip, plus the nested dcsrch loop).  This
module runs the ENTIRE optimiser — generalized Cauchy point, subspace
minimisation, Moré–Thuente line search, restart machinery, and the
symbolic-difference clearance probes — as ONE Pallas program per batch
tile, with the molecule resident in VMEM and the state machine in
vector registers.

Semantics: a line-for-line translation of ``lbfgsb_minimize_stable``
(reference behaviour: scipy L-BFGS-B as invoked by
/root/reference/src/pywindow/_internal/utilities.py:400-426, :1301-1305)
with vectors stored components-first — optimisation variables as
``(d, T)`` blocks, per-lane scalars as ``(1, T)`` rows, T lanes of
independent molecules per program.  Per-lane update masking replicates
``vmap``-of-``while_loop`` batching exactly: each trip applies the body
to every lane and keeps the old state where the lane's own cond was
already False.  All clearance reductions are min-reductions (exactly
associative), and every sum/product chain follows the jnp driver's
association, so results match the vmapped driver to the last bit in
practice (validated in tests/test_lbfgsb_pallas.py).

The kernel is generic over the optimisation dimension through a static
axis embedding: the probed 3-D point is ``origin + sum_k u_k * e_k``
with static unit axes ``e_k`` — the pore stage uses d=3 (identity
embedding, origin 0), the window-z stage d=1 (``e_z``, origin
``(xy0, xy1, 0)``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pywindow_tpu.ops.lbfgsb import (
    _EPS64,
    _FD_ABS_STEP,
    _FTOL,
    _GTOL,
    _M,
    _XTOL,
    _XTRAPL,
    _XTRAPU,
    _dcstep,
    _StepState,
)

#: identity embedding (pore stage, d=3).
EMB_XYZ = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
#: z-axis embedding (window-z stage, d=1).
EMB_Z = ((0.0, 0.0, 1.0),)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _i32(v: int):
    return jnp.int32(v)


def _sel(mask, a, b):
    """Per-lane select; boolean VALUES go through logical ops.

    ``jnp.where`` on i1 vectors needs an i8->i1 truncation mosaic cannot
    lower ("Unsupported target bitwidth for truncation"), so selects of
    boolean state are rewritten as ``(mask & a) | (~mask & b)`` —
    identical semantics.
    """
    if a.dtype == jnp.bool_:
        return (mask & a) | (~mask & b)
    return jnp.where(mask, a, b)


def _tree_select(mask, new, old):
    """Per-lane select over a state tuple ((1,T) bool mask broadcasts)."""
    return jax.tree_util.tree_map(
        lambda a, b: _sel(mask, a, b), new, old
    )


def _sym_idx(d: int):
    """(i, j) -> flat index into the packed symmetric (d x d) storage."""
    pairs = [(i, j) for i in range(d) for j in range(i, d)]
    lut = {}
    for n, (i, j) in enumerate(pairs):
        lut[(i, j)] = n
        lut[(j, i)] = n
    return pairs, lut


def lbfgsb_stable_kernel_body(
    *,
    d: int,
    emb: tuple,
    sign: float,
    maxiter: int,
    m: int,
    maxls: int,
    pgtol: float,
    factr: float,
    fd_step: float,
):
    """Build the Pallas kernel function (static-parameter closure)."""
    sym_pairs, sym = _sym_idx(d)
    nsym = len(sym_pairs)

    def kernel(
        xc_ref,  # (3, N, T) atom coordinates (padded slots FAR_AWAY)
        vdw_ref,  # (N, T) vdW radii (padded slots 0)
        org_ref,  # (3, T) probe-point origin
        x0_ref,  # (d, T)
        lo_ref,  # (d, T)
        up_ref,  # (d, T)
        valid_ref,  # (1, T) f32: 1.0 = real lane
        x_out,  # (d, T)
        stats_out,  # (4, T) f32: nit, converged, capped, fun
    ):
        dtype = x0_ref.dtype

        def C(v):
            return jnp.asarray(v, dtype)

        lo = lo_ref[:]
        up = up_ref[:]
        org = org_ref[:]
        vdw = vdw_ref[:]
        lane_ok = valid_ref[:] > C(0.5)

        tol = C(factr * _EPS64)
        epsmch = C(jnp.finfo(dtype).eps)
        big = C(1e30)
        zero = C(0.0)
        one = C(1.0)

        # boxed = all bounds finite (<1e9), per lane (jnp driver
        # line 894).  Mosaic constraint used throughout this kernel:
        # boolean VECTORS must stay single-row (1, T) and may only be
        # combined with logical ops or used as float-select predicates
        # — multi-row i1 selects/concats/casts fail to lower ("invalid
        # vector register cast" / "unsupported truncation").  Per-
        # dimension masks are therefore python LISTS of (1, T) rows.
        boxed = None
        for k in range(d):
            bk = (jnp.abs(lo[k : k + 1]) < C(1e9)) & (
                jnp.abs(up[k : k + 1]) < C(1e9)
            )
            boxed = bk if boxed is None else (boxed & bk)

        # ---- small linear algebra over (d, T) rows --------------------
        def dot(a, b):  # (d,T),(d,T) -> (1,T), fixed association
            acc = a[0:1] * b[0:1]
            for k in range(1, d):
                acc = acc + a[k : k + 1] * b[k : k + 1]
            return acc

        def matvec_sym(bm, v):  # packed sym (nsym,T), (d,T) -> (d,T)
            rows = []
            for i in range(d):
                acc = bm[sym[(i, 0)] : sym[(i, 0)] + 1] * v[0:1]
                for j in range(1, d):
                    acc = acc + bm[sym[(i, j)] : sym[(i, j)] + 1] * v[
                        j : j + 1
                    ]
                rows.append(acc)
            return jnp.concatenate(rows, axis=0)

        def argmin_rows(rows):  # list of (1,T) -> (min (1,T), onehot list)
            best = rows[0]
            sel = [None] * d
            idx = jnp.zeros_like(best, dtype=jnp.int32)
            for k in range(1, d):
                lt = rows[k] < best
                best = jnp.where(lt, rows[k], best)
                idx = jnp.where(lt, _i32(k), idx)
            for k in range(d):
                sel[k] = idx == _i32(k)
            return best, sel

        # ---- clearance probes (symbolic differences) ------------------
        def point3(u):  # (d,T) -> 3 x (1,T)
            out = []
            for c in range(3):
                expr = org[c : c + 1]
                for k in range(d):
                    coeff = emb[k][c]
                    if coeff == 0.0:
                        continue
                    t = u[k : k + 1] if coeff == 1.0 else u[
                        k : k + 1
                    ] * C(coeff)
                    expr = expr + t
                out.append(expr)
            return out

        def embed3(s):  # u-space displacement (d,T) -> 3 x ((1,T)|None)
            out = []
            for c in range(3):
                expr = None
                for k in range(d):
                    coeff = emb[k][c]
                    if coeff == 0.0:
                        continue
                    t = s[k : k + 1] if coeff == 1.0 else s[
                        k : k + 1
                    ] * C(coeff)
                    expr = t if expr is None else expr + t
                out.append(expr)
            return out

        def base_at(u):  # clearance context at p(u)
            p = point3(u)
            dx = [p[c] - xc_ref[c] for c in range(3)]  # (N,T)
            db2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
            db = jnp.sqrt(db2)
            cb = db - vdw
            m0 = jnp.min(cb, axis=0, keepdims=True)  # (1,T)
            base = cb - m0
            return dx, db2, db, base, m0

        def delta_of(ctx, s3):  # symbolic f(p+s) - f(p), s3 from embed3
            dx, db2, db, base, _ = ctx
            g = None
            s2 = None
            for c in range(3):
                if s3[c] is None:
                    continue
                t = s3[c] * dx[c]
                g = t if g is None else g + t
                t2 = s3[c] * s3[c]
                s2 = t2 if s2 is None else s2 + t2
            num = 2.0 * g + s2
            dp = jnp.sqrt(jnp.maximum(db2 + num, zero))
            den = db + dp
            delta = num / jnp.where(den == zero, one, den)
            return jnp.min(base + delta, axis=0, keepdims=True)  # (1,T)

        def fd_h(p):  # _stable_fd_h on (d,T)
            h = jnp.full_like(p, C(fd_step))
            lower_dist = p - lo
            upper_dist = up - p
            violated = upper_dist < h
            fitting = jnp.abs(h) <= jnp.maximum(lower_dist, upper_dist)
            h = jnp.where(violated & fitting, -h, h)
            h = jnp.where(~fitting & (upper_dist >= lower_dist),
                          upper_dist, h)
            h = jnp.where(~fitting & (upper_dist < lower_dist),
                          -lower_dist, h)
            return h

        def grad_probe(u, h):  # FD gradient at p(u) (d,T)
            ctx = base_at(u)
            rows = []
            for k in range(d):
                sk = [None] * 3
                for c in range(3):
                    coeff = emb[k][c]
                    if coeff == 0.0:
                        continue
                    hk = h[k : k + 1]
                    sk[c] = hk if coeff == 1.0 else hk * C(coeff)
                dk = C(sign * 2.0) * delta_of(ctx, sk)
                rows.append(dk / h[k : k + 1])
            return jnp.concatenate(rows, axis=0)

        # ---- L-BFGS-B pieces ------------------------------------------
        def build_b(sh, yh, col, theta):
            # packed symmetric B via m chronological rank-2 updates
            bm_rows = []
            for (i, j) in sym_pairs:
                bm_rows.append(theta if i == j else jnp.zeros_like(theta))
            bm = jnp.concatenate(bm_rows, axis=0)  # (nsym,T)
            for k in range(m):
                s = sh[d * k : d * k + d]
                y = yh[d * k : d * k + d]
                kvalid = _i32(k) < col
                bs = matvec_sym(bm, s)
                sbs = dot(s, bs)
                sy = dot(s, y)
                sbs_s = jnp.where(sbs == zero, one, sbs)
                sy_s = jnp.where(sy == zero, one, sy)
                rows = []
                for (i, j) in sym_pairs:
                    n = sym[(i, j)]
                    bn = (
                        bm[n : n + 1]
                        - bs[i : i + 1] * bs[j : j + 1] / sbs_s
                        + y[i : i + 1] * y[j : j + 1] / sy_s
                    )
                    rows.append(jnp.where(kvalid, bn, bm[n : n + 1]))
                bm = jnp.concatenate(rows, axis=0)
            return bm

        def cauchy(x, g, bm, theta):
            safe_g = jnp.where(g == zero, one, g)
            t_break = jnp.where(
                g > zero,
                (x - lo) / safe_g,
                jnp.where(g < zero, (x - up) / safe_g, big),
            )
            # per-dimension masks as (1,T) rows (see boxed note above)
            moving = [t_break[k : k + 1] > zero for k in range(d)]
            dvec = jnp.concatenate(
                [
                    jnp.where(moving[k], -g[k : k + 1], zero)
                    for k in range(d)
                ],
                axis=0,
            )
            f2_org = theta * dot(dvec, dvec)

            z = jnp.zeros_like(x)
            xcp_z = jnp.zeros_like(x)
            found = jnp.zeros_like(theta, dtype=bool)
            t_old = jnp.zeros_like(theta)
            for _ in range(d + 1):
                bd = matvec_sym(bm, dvec)
                f1 = dot(g, dvec) + dot(z, bd)
                f2 = jnp.maximum(dot(dvec, bd), epsmch * f2_org)
                dtm = -f1 / jnp.where(f2 == zero, one, f2)

                t_cand = [
                    jnp.where(moving[k], t_break[k : k + 1], big)
                    for k in range(d)
                ]
                t_next, sel = argmin_rows(t_cand)
                no_more = t_next >= big
                dt = t_next - t_old
                inside = (dtm < dt) | no_more
                xcp_candidate = z + jnp.maximum(dtm, zero) * dvec

                z_bp = z + dt * dvec
                freeze = found | inside
                rows_z, rows_d, moving_n = [], [], []
                for k in range(d):
                    zb_k = (
                        jnp.where(
                            dvec[k : k + 1] > zero,
                            up[k : k + 1],
                            lo[k : k + 1],
                        )
                        - x[k : k + 1]
                    )
                    rows_z.append(
                        jnp.where(sel[k], zb_k, z_bp[k : k + 1])
                    )
                    rows_d.append(
                        jnp.where(sel[k], zero, dvec[k : k + 1])
                    )
                    moving_n.append(
                        _sel(freeze, moving[k], moving[k] & ~sel[k])
                    )
                z_bp = jnp.concatenate(rows_z, axis=0)
                dvec_bp = jnp.concatenate(rows_d, axis=0)

                z = jnp.where(freeze, z, z_bp)
                dvec = jnp.where(freeze, dvec, dvec_bp)
                moving = moving_n
                xcp_z = jnp.where(
                    found, xcp_z, jnp.where(inside, xcp_candidate, xcp_z)
                )
                found = found | inside
                t_old = jnp.where(freeze, t_old, t_next)
            return xcp_z, moving

        def solve_small(bm, rhs):  # packed sym solve, d <= 3 (Cramer)
            if d == 1:
                return rhs / bm[0:1]
            a = [
                [bm[sym[(i, j)] : sym[(i, j)] + 1] for j in range(d)]
                for i in range(d)
            ]
            if d == 2:
                # driver rounding: inverse entries divided by det FIRST,
                # then the matvec (lbfgsb._solve_small d==2)
                det = a[0][0] * a[1][1] - a[0][1] * a[1][0]
                i00, i01 = a[1][1] / det, (-a[0][1]) / det
                i10, i11 = (-a[1][0]) / det, a[0][0] / det
                r0 = i00 * rhs[0:1] + i01 * rhs[1:2]
                r1 = i10 * rhs[0:1] + i11 * rhs[1:2]
                return jnp.concatenate([r0, r1], axis=0)
            c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
            c01 = a[1][2] * a[2][0] - a[1][0] * a[2][2]
            c02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
            det = a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02
            c10 = a[0][2] * a[2][1] - a[0][1] * a[2][2]
            c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
            c12 = a[0][1] * a[2][0] - a[0][0] * a[2][1]
            c20 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
            c21 = a[0][2] * a[1][0] - a[0][0] * a[1][2]
            c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
            # _matvec(adj, b)/det with adj rows = cofactor columns
            r0 = c00 * rhs[0:1] + c10 * rhs[1:2] + c20 * rhs[2:3]
            r1 = c01 * rhs[0:1] + c11 * rhs[1:2] + c21 * rhs[2:3]
            r2 = c02 * rhs[0:1] + c12 * rhs[1:2] + c22 * rhs[2:3]
            return jnp.concatenate([r0, r1, r2], axis=0) / det

        def subsm(x, g, bm, xcp, free):
            # ``free`` is a list of d (1,T) bool rows (see boxed note)
            freef = [free[k].astype(dtype) for k in range(d)]
            freev = jnp.concatenate(freef, axis=0)  # (d,T) float mask
            r = g + matvec_sym(bm, xcp - x)
            # bmod = B * outer(freef,freef) + diag(1-freef), packed
            rows = []
            for (i, j) in sym_pairs:
                n = sym[(i, j)]
                v = bm[n : n + 1] * freef[i] * freef[j]
                if i == j:
                    v = v + (one - freef[i])
                rows.append(v)
            bmod = jnp.concatenate(rows, axis=0)
            dsub = solve_small(bmod, -(r * freev))
            dsub = dsub * freev

            zt = xcp + dsub
            iword = None
            for k in range(d):
                vk = free[k] & (
                    (zt[k : k + 1] < lo[k : k + 1])
                    | (zt[k : k + 1] > up[k : k + 1])
                )
                iword = vk if iword is None else (iword | vk)
            zproj = jnp.clip(zt, lo, up)
            dd_p = dot(zproj - x, g)

            safe_d = jnp.where(dsub == zero, one, dsub)
            low_gap = lo - xcp
            up_gap = up - xcp
            cand = []
            for k in range(d):
                dk = dsub[k : k + 1]
                sk = safe_d[k : k + 1]
                ck = jnp.where(
                    free[k] & (dk < zero),
                    jnp.where(
                        low_gap[k : k + 1] >= zero,
                        zero,
                        low_gap[k : k + 1] / sk,
                    ),
                    big,
                )
                cand.append(
                    jnp.where(
                        free[k] & (dk > zero),
                        jnp.where(
                            up_gap[k : k + 1] <= zero,
                            zero,
                            up_gap[k : k + 1] / sk,
                        ),
                        ck,
                    )
                )
            cand_min, sel = argmin_rows(cand)
            alpha = jnp.minimum(one, cand_min)
            z_alpha = xcp + alpha * dsub
            rows = []
            for k in range(d):
                bound_k = jnp.where(
                    dsub[k : k + 1] > zero, up[k : k + 1], lo[k : k + 1]
                )
                rows.append(
                    jnp.where(
                        sel[k] & (alpha < one), bound_k,
                        z_alpha[k : k + 1],
                    )
                )
            z_alpha = jnp.concatenate(rows, axis=0)

            z = jnp.where(iword & (dd_p > zero), z_alpha, zproj)
            any_free = None
            for k in range(d):
                any_free = (
                    free[k] if any_free is None else (any_free | free[k])
                )
            return jnp.where(any_free, z, xcp)

        # ---- dcsrch (batched port of _dcsrch_phi) ---------------------
        def dcsrch(phi, dvec, g_vec0, stp0, stpmax_feasible):
            f0 = jnp.zeros_like(stp0)  # delta space: f0 = 0
            g0 = dot(g_vec0, dvec)
            gtest = C(_FTOL) * g0
            stpmin = jnp.zeros_like(stp0)
            stpmax = stpmax_feasible

            # while-loop carries must be free of i1 vectors (mosaic
            # cannot legalize scf.yield of vector<..xi1>): boolean state
            # (brackt, stage1, done, conv) rides as {0,1} float rows and
            # is re-derived as bool at the body boundary.
            half = C(0.5)
            f_init, g_init = phi(stp0)
            state0 = (
                # _StepState flattened, brackt as float
                jnp.zeros_like(stp0),  # stx
                f0,  # fx
                g0,  # dx
                jnp.zeros_like(stp0),  # sty
                f0,  # fy
                g0,  # dy
                stp0,  # stp
                jnp.zeros_like(stp0),  # brackt (float)
                jnp.ones_like(stp0),  # stage1 (float)
                jnp.zeros_like(stp0),
                stp0 + C(_XTRAPU) * stp0,
                stpmax - stpmin,
                (stpmax - stpmin) / C(0.5),
                jnp.ones_like(stp0, dtype=jnp.int32),
                jnp.zeros_like(stp0),  # done (float)
                jnp.zeros_like(stp0),  # converged (float)
                f_init,
                g_init,
            )

            def lane_active(state):
                nfev = state[13]
                done = state[14] > half
                return (~done) & (nfev < _i32(maxls + 1))

            def body(state):
                (stx_, fx_, dx_, sty_, fy_, dy_, stp_, brackt_f,
                 stage1_f, stmin, stmax, width, width1, nfev, done_f,
                 conv_f, f, gvec) = state
                st = _StepState(
                    stx=stx_, fx=fx_, dx=dx_, sty=sty_, fy=fy_, dy=dy_,
                    stp=stp_, brackt=brackt_f > half,
                )
                stage1 = stage1_f > half
                done = done_f > half
                conv = conv_f > half
                stp = st.stp
                g = dot(gvec, dvec)
                ftest = f0 + stp * gtest
                stage1_n = stage1 & ~((f <= ftest) & (g >= zero))

                converged = (f <= ftest) & (
                    jnp.abs(g) <= C(_GTOL) * (-g0)
                )
                warn = (
                    (st.brackt & ((stp <= stmin) | (stp >= stmax)))
                    | (st.brackt & (stmax - stmin <= C(_XTOL) * stmax))
                    | ((stp == stpmax) & (f <= ftest) & (g <= gtest))
                    | ((stp == stpmin) & ((f > ftest) | (g >= gtest)))
                )
                finished = converged | warn
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
                    lambda a, b: _sel(use_mod, a, b),
                    new_mod, new_plain,
                )

                bisect = new.brackt & (
                    jnp.abs(new.sty - new.stx) >= C(0.66) * width1
                )
                stp_n = jnp.where(
                    bisect, new.stx + C(0.5) * (new.sty - new.stx),
                    new.stp,
                )
                width1_n = jnp.where(new.brackt, width, width1)
                width_n = jnp.where(
                    new.brackt, jnp.abs(new.sty - new.stx), width
                )
                stmin_n = jnp.where(
                    new.brackt,
                    jnp.minimum(new.stx, new.sty),
                    stp_n + C(_XTRAPL) * (stp_n - new.stx),
                )
                stmax_n = jnp.where(
                    new.brackt,
                    jnp.maximum(new.stx, new.sty),
                    stp_n + C(_XTRAPU) * (stp_n - new.stx),
                )
                stp_n = jnp.clip(stp_n, stpmin, stpmax)
                force_stx = (
                    new.brackt & ((stp_n <= stmin_n) | (stp_n >= stmax_n))
                ) | (new.brackt & (stmax_n - stmin_n <= C(_XTOL) * stmax_n))
                stp_n = jnp.where(force_stx, new.stx, stp_n)
                new = new._replace(stp=stp_n)

                f_n, g_n = phi(stp_n)

                keep = finished | done
                st_out = jax.tree_util.tree_map(
                    lambda a, b: _sel(keep, a, b), st, new
                )
                return (
                    st_out.stx,
                    st_out.fx,
                    st_out.dx,
                    st_out.sty,
                    st_out.fy,
                    st_out.dy,
                    st_out.stp,
                    st_out.brackt.astype(dtype),
                    _sel(keep, stage1, stage1_n).astype(dtype),
                    jnp.where(keep, stmin, stmin_n),
                    jnp.where(keep, stmax, stmax_n),
                    jnp.where(keep, width, width_n),
                    jnp.where(keep, width1, width1_n),
                    jnp.where(keep, nfev, nfev + _i32(1)),
                    (done | finished).astype(dtype),
                    (conv | (converged & ~done)).astype(dtype),
                    jnp.where(keep, f, f_n),
                    jnp.where(keep, gvec, g_n),
                )

            def masked_body(state):
                active = lane_active(state)
                return _tree_select(active, body(state), state)

            def loop_cond(state):
                active = lane_active(state)
                return jnp.max(active.astype(dtype)) > half

            out = jax.lax.while_loop(loop_cond, masked_body, state0)
            stp_out, done_f, conv_f, f, gvec = (
                out[6], out[14], out[15], out[16], out[17]
            )
            done = done_f > half
            conv = conv_f > half
            entry_error = (g0 >= zero) | (stp0 > stpmax) | (stp0 < stpmin)
            failed = (~(done | conv)) | entry_error
            return stp_out, f, gvec, failed

        # ---- main loop (batched port of lbfgsb_minimize_stable) -------
        x = jnp.clip(x0_ref[:], lo, up)
        fx_abs = C(sign * 2.0) * base_at(x)[4]
        g = grad_probe(x, fd_h(x))

        sh0 = jnp.zeros((m * d, x.shape[1]), dtype)
        yh0 = jnp.zeros((m * d, x.shape[1]), dtype)
        i0 = jnp.zeros_like(fx_abs, dtype=jnp.int32)
        half = C(0.5)
        state0 = (
            x,
            fx_abs,
            g,
            sh0,
            yh0,
            jnp.ones_like(fx_abs),  # theta
            i0,  # n_pairs
            i0,  # it
            i0,  # trips
            # bool state rides as {0,1} floats (i1 while carries fail
            # to legalize in mosaic); inert pad lanes start done
            (~lane_ok).astype(dtype),  # done
            jnp.zeros_like(fx_abs),  # conv
        )

        def outer_lane_active(state):
            (x, _, g, _, _, _, _, it, trips, done_f, _) = state
            pg = x - jnp.clip(x - g, lo, up)
            pgmax = jnp.max(jnp.abs(pg), axis=0, keepdims=True)
            return (
                (done_f < half)
                & (it < _i32(maxiter))
                & (trips < _i32(2 * maxiter + 4))
                & (pgmax > C(pgtol))
            )

        def outer_body(state):
            (x, fx_abs, g, sh, yh, theta, n_pairs, it, trips, done_f,
             conv_f) = state
            done = done_f > half
            conv = conv_f > half

            col = jnp.minimum(n_pairs, _i32(m))
            bm = build_b(sh, yh, col, theta)

            xcp_z, free = cauchy(x, g, bm, theta)
            xcp = x + xcp_z
            any_pairs = col > _i32(0)
            z = jnp.where(any_pairs, subsm(x, g, bm, xcp, free), xcp)
            dvec = z - x
            dnorm = jnp.sqrt(dot(dvec, dvec))
            gd_old = dot(g, dvec)

            # NB: this big is 1e10, NOT the 1e30 of cauchy/subsm — the
            # jnp driver's lnsrlb block uses its own constant
            # (lbfgsb.py:945) and stpmax feeds dcsrch's bracket widths,
            # so the value is behaviourally live.
            big10 = C(1e10)
            step_to_bound = jnp.where(
                dvec > zero,
                (up - x) / jnp.where(dvec == zero, one, dvec),
                jnp.where(
                    dvec < zero,
                    (lo - x) / jnp.where(dvec == zero, one, dvec),
                    big10,
                ),
            )
            first = it == _i32(0)
            stpmx = jnp.where(
                first,
                one,
                jnp.minimum(
                    jnp.min(step_to_bound, axis=0, keepdims=True), big10
                ),
            )
            inv_dnorm = one / jnp.where(dnorm == zero, one, dnorm)
            stp0 = jnp.where(
                first & ~boxed, jnp.minimum(inv_dnorm, stpmx), one
            )

            ctx_x = base_at(x)

            def phi(stp):
                disp = stp * dvec
                h = fd_h(x + disp)
                delta_f = C(sign * 2.0) * delta_of(ctx_x, embed3(disp))
                gvec = grad_probe(x + disp, h)
                return delta_f, gvec

            stp, delta, gn, ls_failed = dcsrch(phi, dvec, g, stp0, stpmx)
            xn = x + stp * dvec

            pg = xn - jnp.clip(xn - gn, lo, up)
            pg_done = jnp.max(jnp.abs(pg), axis=0, keepdims=True) <= C(
                pgtol
            )
            fn_abs = fx_abs + delta
            f_reduction_done = (-delta) <= tol * jnp.maximum(
                jnp.maximum(jnp.abs(fx_abs), jnp.abs(fn_abs)), one
            )
            stalled = None
            for k in range(d):
                eq = xn[k : k + 1] == x[k : k + 1]
                stalled = eq if stalled is None else (stalled & eq)
            step_ok = ~ls_failed
            new_conv = step_ok & (pg_done | f_reduction_done | stalled)

            gd = dot(gn, dvec)
            one_step = stp == one
            dr = jnp.where(one_step, gd - gd_old, (gd - gd_old) * stp)
            ddum = jnp.where(one_step, -gd_old, -gd_old * stp)
            store = step_ok & (dr > C(_EPS64) * ddum)
            s_new = stp * dvec
            y_new = gn - g
            full = n_pairs >= _i32(m)
            write_at = jnp.minimum(n_pairs, _i32(m - 1))
            rows_s, rows_y = [], []
            for r in range(m):
                sel_r = write_at == _i32(r)
                app_s = jnp.where(sel_r, s_new, sh[d * r : d * r + d])
                app_y = jnp.where(sel_r, y_new, yh[d * r : d * r + d])
                if r < m - 1:
                    shf_s = sh[d * (r + 1) : d * (r + 1) + d]
                    shf_y = yh[d * (r + 1) : d * (r + 1) + d]
                else:
                    shf_s, shf_y = s_new, y_new
                rows_s.append(
                    jnp.where(
                        store,
                        jnp.where(full, shf_s, app_s),
                        sh[d * r : d * r + d],
                    )
                )
                rows_y.append(
                    jnp.where(
                        store,
                        jnp.where(full, shf_y, app_y),
                        yh[d * r : d * r + d],
                    )
                )
            sh_n = jnp.concatenate(rows_s, axis=0)
            yh_n = jnp.concatenate(rows_y, axis=0)
            n_pairs_n = jnp.where(store, n_pairs + _i32(1), n_pairs)
            rr = dot(y_new, y_new)
            theta_n = jnp.where(
                store, rr / jnp.where(dr == zero, one, dr), theta
            )

            restart = ls_failed & any_pairs
            fatal = ls_failed & ~any_pairs
            n_pairs_n = jnp.where(restart, i0, n_pairs_n)
            theta_n = jnp.where(restart, one, theta_n)

            xn = jnp.where(ls_failed, x, xn)
            fn_abs = jnp.where(ls_failed, fx_abs, fn_abs)
            gn = jnp.where(ls_failed, g, gn)

            new_done = new_conv | fatal

            keep = done
            return (
                jnp.where(keep, x, xn),
                jnp.where(keep, fx_abs, fn_abs),
                jnp.where(keep, g, gn),
                jnp.where(keep, sh, sh_n),
                jnp.where(keep, yh, yh_n),
                jnp.where(keep, theta, theta_n),
                jnp.where(keep, n_pairs, n_pairs_n),
                it + jnp.where(keep | ls_failed, _i32(0), _i32(1)),
                trips + _i32(1),
                (done | new_done).astype(dtype),
                (conv | (~keep & new_conv)).astype(dtype),
            )

        def masked_outer(state):
            active = outer_lane_active(state)
            return _tree_select(active, outer_body(state), state)

        def outer_cond(state):
            active = outer_lane_active(state)
            return jnp.max(active.astype(dtype)) > half

        (x, fx_abs, g, _, _, _, _, it, _, done_f, conv_f) = (
            jax.lax.while_loop(outer_cond, masked_outer, state0)
        )
        done = done_f > half
        conv = conv_f > half
        pg0 = x - jnp.clip(x - g, lo, up)
        pg_small = jnp.max(jnp.abs(pg0), axis=0, keepdims=True) <= C(
            pgtol
        )
        conv = conv | pg_small
        capped = ~done & ~pg_small
        x_out[:] = x
        stats_out[:] = jnp.concatenate(
            [
                it.astype(dtype),
                conv.astype(dtype),
                capped.astype(dtype),
                fx_abs,
            ],
            axis=0,
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "emb", "sign", "maxiter", "m", "maxls", "pgtol", "factr",
        "fd_step", "tile", "interpret",
    ),
)
def lbfgsb_stable_flat(
    coords: jnp.ndarray,  # (B, N, 3) — padded atoms at FAR_AWAY, vdw 0
    vdw: jnp.ndarray,  # (B, N)
    origin: jnp.ndarray,  # (B, 3)
    x0: jnp.ndarray,  # (B, d)
    lower: jnp.ndarray,  # (B, d)
    upper: jnp.ndarray,  # (B, d)
    *,
    emb: tuple = EMB_XYZ,
    sign: float = -1.0,
    maxiter: int = 50,
    m: int = _M,
    maxls: int = 20,
    pgtol: float = 1e-5,
    factr: float = 1e7,
    fd_step: float = _FD_ABS_STEP,
    tile: int = 128,
    interpret: bool | None = None,
):
    """Run the fused stable L-BFGS-B over a flat batch of B problems.

    Returns ``(x (B,d), fun (B,), nit (B,), converged (B,), capped (B,))``
    — the same results as ``vmap(lbfgsb_minimize_stable)`` over the
    equivalent per-lane probe/f_abs closures (see module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = coords.shape
    d = x0.shape[-1]
    dtype = x0.dtype
    # atoms live on the sublane axis of the (3, n_pad, tile) blocks:
    # granularity 8, NOT 128 — rounding to a lane multiple here would
    # stream dead atom rows through every clearance probe
    n_pad = _round_up(max(n, 8), 8)
    tile = min(tile, _round_up(max(b, 8), 8))
    b_pad = _round_up(max(b, 8), tile)

    coords_t = jnp.full((3, n_pad, b_pad), 1.0e6, dtype)
    coords_t = coords_t.at[:, :n, :b].set(
        jnp.transpose(coords.astype(dtype), (2, 1, 0))
    )
    vdw_t = jnp.zeros((n_pad, b_pad), dtype).at[:n, :b].set(vdw.T)
    org_t = jnp.zeros((3, b_pad), dtype).at[:, :b].set(origin.T)
    x0_t = jnp.zeros((d, b_pad), dtype).at[:, :b].set(x0.T)
    lo_t = jnp.full((d, b_pad), -1.0, dtype).at[:, :b].set(lower.T)
    up_t = jnp.ones((d, b_pad), dtype).at[:, :b].set(upper.T)
    valid_t = jnp.zeros((1, b_pad), dtype).at[0, :b].set(1.0)

    kernel = lbfgsb_stable_kernel_body(
        d=d, emb=emb, sign=sign, maxiter=maxiter, m=m, maxls=maxls,
        pgtol=pgtol, factr=factr, fd_step=fd_step,
    )

    def spec(rows):
        return pl.BlockSpec(
            (rows, tile), lambda i: (_i32(0), i), memory_space=pltpu.VMEM
        )

    x_t, stats = pl.pallas_call(
        kernel,
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec(
                (3, n_pad, tile),
                lambda i: (_i32(0), _i32(0), i),
                memory_space=pltpu.VMEM,
            ),
            spec(n_pad),
            spec(3),
            spec(d),
            spec(d),
            spec(d),
            spec(1),
        ],
        out_specs=(spec(d), spec(4)),
        out_shape=(
            jax.ShapeDtypeStruct((d, b_pad), dtype),
            jax.ShapeDtypeStruct((4, b_pad), dtype),
        ),
        interpret=interpret,
    )(coords_t, vdw_t, org_t, x0_t, lo_t, up_t, valid_t)

    x_out = x_t[:, :b].T
    nit = stats[0, :b].astype(jnp.int32)
    conv = stats[1, :b] > 0.5
    capped = stats[2, :b] > 0.5
    fun = stats[3, :b]
    return x_out, fun, nit, conv, capped


def route_opt_to_pallas() -> bool:
    """Route the stable optimiser stages to the fused Pallas kernel?

    TPU only (elsewhere interpret mode would be slower than the jnp
    driver); ``PYWINDOW_TPU_NO_PALLAS=1`` (global Pallas kill switch)
    or ``PYWINDOW_TPU_NO_OPT_PALLAS=1`` (this kernel only) disable it.
    ``PYWINDOW_TPU_FORCE_OPT_PALLAS=1`` forces routing on any backend
    (interpret mode on CPU) — for integration tests of the routed path.
    """
    import os

    if os.environ.get("PYWINDOW_TPU_NO_PALLAS"):
        return False
    if os.environ.get("PYWINDOW_TPU_NO_OPT_PALLAS"):
        return False
    if os.environ.get("PYWINDOW_TPU_FORCE_OPT_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def pore_centres_pallas(mols, maxiter: int, tile: int = 128,
                        interpret: bool | None = None):
    """Batched optimised pore centres via the fused kernel.

    ``mols``: a batched :class:`~pywindow_tpu.ops.encoding.MolArrays`
    with leading batch axis B.  Returns ``(centres (B,3), capped (B,))``
    — the same stage :func:`pywindow_tpu.ops.analysis.optimise_pore_centre_res`
    computes per molecule in ``"stable"`` mode (reference:
    utilities.py:400-426), batched outside the per-molecule vmap so the
    whole-optimiser kernel sees the full lane population.
    """
    from pywindow_tpu.ops.geometry import center_of_mass, pore_diameter

    com = jax.vmap(center_of_mass)(mols)
    pd0 = jax.vmap(lambda m: pore_diameter(m)[0])(mols)
    pore_r = pd0[:, None] / 2.0
    x, _, _, _, capped = lbfgsb_stable_flat(
        mols.coords,
        mols.vdw,
        jnp.zeros_like(com),
        com,
        com - pore_r,
        com + pore_r,
        emb=EMB_XYZ,
        sign=-1.0,
        maxiter=maxiter,
        tile=tile,
        interpret=interpret,
    )
    return x, capped


@functools.lru_cache(maxsize=16)
def _stable_opt_nd(emb, sign, maxiter, m, maxls, pgtol, factr, fd_step,
                   tile):
    """Rank-polymorphic, vmap-transparent view of the fused kernel.

    Returns a function ``opt(coords, vdw, origin, x0, lower, upper) ->
    (x, capped)`` whose base implementation accepts ANY leading batch
    dims (flattened into one kernel dispatch), registered with
    ``jax.custom_batching.custom_vmap`` so that nested ``vmap``s (e.g.
    windows within molecules within frames) collapse into that single
    flat dispatch instead of batching the pallas_call axis by axis:
    each vmap level re-enters the rule, which broadcasts unbatched
    operands and calls ``opt`` again; the outermost call executes the
    base implementation on the fully-batched operands.
    """
    from jax import custom_batching

    d = len(emb)

    @custom_batching.custom_vmap
    def opt(coords, vdw, origin, x0, lower, upper):
        lead = coords.shape[:-2]
        n = coords.shape[-2]
        b = 1
        for s in lead:
            b *= s
        x, _, _, _, capped = lbfgsb_stable_flat(
            coords.reshape((b, n, 3)),
            vdw.reshape((b, n)),
            origin.reshape((b, 3)),
            x0.reshape((b, d)),
            lower.reshape((b, d)),
            upper.reshape((b, d)),
            emb=emb,
            sign=sign,
            maxiter=maxiter,
            m=m,
            maxls=maxls,
            pgtol=pgtol,
            factr=factr,
            fd_step=fd_step,
            tile=tile,
        )
        return x.reshape(lead + (d,)), capped.reshape(lead)

    @opt.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        bargs = []
        for a, b_ in zip(args, in_batched):
            if not b_:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            bargs.append(a)
        return opt(*bargs), (True, True)

    return opt


def z_opt_stable_pallas(rmol_coords, rmol_vdw, xy, z0, z_lower, z_upper,
                        maxiter: int, tile: int = 128):
    """Window-z stable L-BFGS-B through the fused kernel (d=1).

    Drop-in for the ``lbfgsb_minimize_stable`` call of the window
    refinement's z stage (reference: ``optimise_z``,
    utilities.py:1174-1188): objective ``f(z) = 2*clearance((xy, z))``
    on the rotated molecule, probed via the z-axis embedding.  Safe to
    call under any vmap nesting (see :func:`_stable_opt_nd`).  Returns
    ``(z (1,), capped ())`` per lane.
    """
    dtype = rmol_coords.dtype
    origin = jnp.stack(
        [xy[0], xy[1], jnp.asarray(0.0, dtype)], axis=-1
    )
    opt = _stable_opt_nd(
        EMB_Z, 1.0, maxiter, _M, 20, 1e-5, 1e7, _FD_ABS_STEP, tile
    )
    return opt(rmol_coords, rmol_vdw, origin, z0, z_lower, z_upper)
