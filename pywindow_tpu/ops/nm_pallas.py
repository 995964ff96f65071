"""Fused Pallas TPU kernel for the window-xy Nelder–Mead polish.

After the fused L-BFGS-B kernel (ops/lbfgsb_pallas.py) removed the
pore/z optimiser while-loops, the xy simplex polish became the
pipeline's largest device cost (~89 ms at B=4320: a (B, W)-vmapped
while-loop plus a (B, W, 6, N) candidate-evaluation fusion per
iteration).  This kernel runs the ENTIRE polish per batch tile: the
rotated molecule stays in VMEM, the anchor clearance context is
computed once per lane (the jnp path recomputes it on every
``clearance_diff`` call), candidates are evaluated in-kernel, and —
because the whole tile shares one program — candidate evaluations the
scipy algorithm would skip (expansion, contractions, shrink) are
skipped for the tile via ``lax.cond`` whenever NO lane needs them,
something the vmapped jnp path cannot do (`lax.cond` under vmap
computes both branches).

Semantics: a line-for-line translation of
:func:`pywindow_tpu.ops.optim.nelder_mead` with the stable
delta-space objective of the window refinement (reference:
``scipy.optimize.brute(..., finish=fmin)``, utilities.py:1312-1317) —
scipy's standard coefficients, the stable 3-vertex sort network, the
eager-value decision tree, and ``vmap``-of-``while_loop`` masking
(lanes keep their state once their own cond is False).  The objective
is ``f(xy) = -2 * (clearance((xy0, xy1, z*)) - clearance((0, 0, z*)))``
evaluated symbolically per atom (see geometry.clearance_diff), exactly
the jnp path's ``f_xy_batch``.  Same mosaic constraints as the
L-BFGS-B kernel: boolean vectors single-row, no i1 while carries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pywindow_tpu.ops.lbfgsb_pallas import _i32, _round_up, _sel
from pywindow_tpu.ops.optim import (
    _CHI,
    _NONZDELT,
    _PSI,
    _RHO,
    _SIGMA,
    _ZDELT,
)


def nm_xy_kernel_body(
    *, maxiter: int, xatol: float, fatol: float, brute_ns: int = 0
):
    """Build the Pallas kernel (static-parameter closure).

    ``brute_ns > 0`` fuses the dense grid pass of
    :func:`pywindow_tpu.ops.optim.brute_start` into the kernel: the
    fourth input row block is then the per-lane grid half-width
    (scipy ``brute``'s bound, utilities.py:1312-1314) instead of the
    polish start, and the kernel scans the ns x ns inclusive-endpoint
    grid (x-outer row-major, strict-< first-min ties — scipy argmin
    order) before polishing.  The grid reuses the VMEM-resident anchor
    clearance context, where the XLA grid pass re-streamed the
    (B, W, ns^2, N) clearance intermediate through HBM (~43 ms of the
    B=4320 profile).
    """

    def kernel(
        xc_ref,  # (3, N, T) rotated coords (padded slots FAR_AWAY)
        vdw_ref,  # (N, T) vdW radii (padded slots 0)
        zanchor_ref,  # (1, T) anchor z (z*)
        x0_ref,  # (2, T) polish start / (1, T) grid half-width
        valid_ref,  # (1, T) f32: 1.0 = real lane
        x_out,  # (2, T)
        stats_out,  # (3, T): f_best, capped, iters
    ):
        dtype = x0_ref.dtype

        def C(v):
            return jnp.asarray(v, dtype)

        vdw = vdw_ref[:]
        zanchor = zanchor_ref[:]
        lane_ok = valid_ref[:] > C(0.5)
        zero = C(0.0)
        one = C(1.0)
        half = C(0.5)

        # anchor clearance context, once per lane (anchor = (0, 0, z*))
        dx0 = zero - xc_ref[0]  # (N, T)
        dx1 = zero - xc_ref[1]
        dx2 = zanchor - xc_ref[2]
        db2 = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
        db = jnp.sqrt(db2)
        cb = db - vdw
        m0 = jnp.min(cb, axis=0, keepdims=True)
        base = cb - m0

        def f_of(u0, u1):  # displacement (xy0, xy1, 0) -> (1, T)
            g = u0 * dx0 + u1 * dx1
            s2 = u0 * u0 + u1 * u1
            num = 2.0 * g + s2
            dp = jnp.sqrt(jnp.maximum(db2 + num, zero))
            den = db + dp
            delta = num / jnp.where(den == zero, one, den)
            return C(-2.0) * jnp.min(base + delta, axis=0, keepdims=True)

        def cond_eval(flag, u0, u1):
            """Evaluate f only if ANY lane in the tile consumes it."""
            return jax.lax.cond(
                jnp.max(flag.astype(dtype)) > half,
                lambda: f_of(u0, u1),
                lambda: jnp.zeros_like(u0),
            )

        # --- initial simplex (optim.scipy_default_step + _initial_simplex)
        if brute_ns > 0:
            # fused brute grid: argmin over the ns x ns linspace grid
            # (values a + i*(b-a)/(ns-1); jnp.linspace ulp differences
            # at most flip exact-tie cells — behavioural parity is
            # arbitered by the golden gate, like every kernel routing)
            half_row = x0_ref[0:1]
            step = (half_row + half_row) / C(brute_ns - 1)
            big = C(jnp.finfo(jnp.float32).max)
            gf = jnp.full_like(half_row, big)
            g0 = jnp.zeros_like(half_row)
            g1 = jnp.zeros_like(half_row)

            def grid_body(i, carry):
                gf, g0, g1 = carry
                ix = i // brute_ns
                iy = i - ix * brute_ns
                u0 = -half_row + ix.astype(dtype) * step
                u1 = -half_row + iy.astype(dtype) * step
                fv = f_of(u0, u1)
                better = fv < gf  # strict: first minimum wins
                return (
                    jnp.where(better, fv, gf),
                    jnp.where(better, u0, g0),
                    jnp.where(better, u1, g1),
                )

            gf, g0, g1 = jax.lax.fori_loop(
                0, brute_ns * brute_ns, grid_body, (gf, g0, g1)
            )
            x0a, x0b = g0, g1
        else:
            x0a = x0_ref[0:1]
            x0b = x0_ref[1:2]
        step0 = jnp.where(x0a != zero, C(_NONZDELT) * x0a, C(_ZDELT))
        step1 = jnp.where(x0b != zero, C(_NONZDELT) * x0b, C(_ZDELT))
        # vertices: (x, y, f) triples of (1, T) rows
        vx = [x0a, x0a + step0, x0a]
        vy = [x0b, x0b, x0b + step1]
        vf = [f_of(vx[i], vy[i]) for i in range(3)]

        def sort3(vx, vy, vf):
            """Stable 3-vertex bubble network (== optim.sort_simplex)."""
            vx, vy, vf = list(vx), list(vy), list(vf)
            for _ in range(2):
                for i in range(2):
                    sw = vf[i] > vf[i + 1]
                    for rows in (vx, vy, vf):
                        a, b = rows[i], rows[i + 1]
                        rows[i] = jnp.where(sw, b, a)
                        rows[i + 1] = jnp.where(sw, a, b)
            return vx, vy, vf

        vx, vy, vf = sort3(vx, vy, vf)

        def converged(vx, vy, vf):
            x_spread = jnp.maximum(
                jnp.maximum(jnp.abs(vx[1] - vx[0]), jnp.abs(vy[1] - vy[0])),
                jnp.maximum(jnp.abs(vx[2] - vx[0]), jnp.abs(vy[2] - vy[0])),
            )
            f_spread = jnp.maximum(
                jnp.abs(vf[1] - vf[0]), jnp.abs(vf[2] - vf[0])
            )
            return (x_spread <= C(xatol)) & (f_spread <= C(fatol))

        state0 = (
            vx[0], vx[1], vx[2], vy[0], vy[1], vy[2],
            vf[0], vf[1], vf[2],
            jnp.where(lane_ok, _i32(0), _i32(maxiter)),  # it
        )

        def lane_active(state):
            vx = state[0:3]
            vy = state[3:6]
            vf = state[6:9]
            it = state[9]
            return (it < _i32(maxiter)) & ~converged(vx, vy, vf)

        def body(state):
            vx = list(state[0:3])
            vy = list(state[3:6])
            vf = list(state[6:9])
            it = state[9]

            # jnp.mean over the 2 best vertices: sum / 2
            xbx = (vx[0] + vx[1]) / C(2.0)
            xby = (vy[0] + vy[1]) / C(2.0)
            # scipy coefficients, same literal arithmetic as optim.py
            xrx = (1.0 + _RHO) * xbx - _RHO * vx[2]
            xry = (1.0 + _RHO) * xby - _RHO * vy[2]
            xex = (1.0 + _RHO * _CHI) * xbx - _RHO * _CHI * vx[2]
            xey = (1.0 + _RHO * _CHI) * xby - _RHO * _CHI * vy[2]
            xcx = (1.0 + _PSI * _RHO) * xbx - _PSI * _RHO * vx[2]
            xcy = (1.0 + _PSI * _RHO) * xby - _PSI * _RHO * vy[2]
            xccx = (1.0 - _PSI) * xbx + _PSI * vx[2]
            xccy = (1.0 - _PSI) * xby + _PSI * vy[2]
            sh1x = vx[0] + _SIGMA * (vx[1] - vx[0])
            sh1y = vy[0] + _SIGMA * (vy[1] - vy[0])
            sh2x = vx[0] + _SIGMA * (vx[2] - vx[0])
            sh2y = vy[0] + _SIGMA * (vy[2] - vy[0])

            fxr = f_of(xrx, xry)
            best = fxr < vf[0]
            good = fxr < vf[1]
            worse = fxr < vf[2]
            # lazily evaluated candidates: values identical to the jnp
            # path's eager batch wherever they are consumed
            fxe = cond_eval(best, xex, xey)
            use_xe = best & (fxe < fxr)
            need_xc = (~best) & (~good) & worse
            need_xcc = (~best) & (~good) & (~worse)
            fxc = cond_eval(need_xc, xcx, xcy)
            fxcc = cond_eval(need_xcc, xccx, xccy)
            accept_xc = need_xc & (fxc <= fxr)
            accept_xcc = need_xcc & (fxcc < vf[2])
            shrink = (need_xc & ~accept_xc) | (need_xcc & ~accept_xcc)
            fsh1 = cond_eval(shrink, sh1x, sh1y)
            fsh2 = cond_eval(shrink, sh2x, sh2y)

            new_lx = jnp.where(
                use_xe, xex,
                jnp.where(accept_xc, xcx, jnp.where(accept_xcc, xccx, xrx)),
            )
            new_ly = jnp.where(
                use_xe, xey,
                jnp.where(accept_xc, xcy, jnp.where(accept_xcc, xccy, xry)),
            )
            new_lf = jnp.where(
                use_xe, fxe,
                jnp.where(accept_xc, fxc, jnp.where(accept_xcc, fxcc, fxr)),
            )

            nvx = [vx[0], jnp.where(shrink, sh1x, vx[1]),
                   jnp.where(shrink, sh2x, new_lx)]
            nvy = [vy[0], jnp.where(shrink, sh1y, vy[1]),
                   jnp.where(shrink, sh2y, new_ly)]
            nvf = [vf[0], jnp.where(shrink, fsh1, vf[1]),
                   jnp.where(shrink, fsh2, new_lf)]
            nvx, nvy, nvf = sort3(nvx, nvy, nvf)
            return (*nvx, *nvy, *nvf, it + _i32(1))

        def masked_body(state):
            active = lane_active(state)
            new = body(state)
            return tuple(
                _sel(active, n, o) for n, o in zip(new, state)
            )

        def loop_cond(state):
            return jnp.max(lane_active(state).astype(dtype)) > half

        state = jax.lax.while_loop(loop_cond, masked_body, state0)
        vx0, vy0, vf0, it = state[0], state[3], state[6], state[9]
        capped = (it >= _i32(maxiter)) & ~converged(
            state[0:3], state[3:6], state[6:9]
        )
        x_out[:] = jnp.concatenate([vx0, vy0], axis=0)
        stats_out[:] = jnp.concatenate(
            [vf0, capped.astype(dtype), it.astype(dtype)], axis=0
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "maxiter", "xatol", "fatol", "tile", "interpret", "brute_ns"
    ),
)
def nm_xy_flat(
    coords: jnp.ndarray,  # (B, N, 3) rotated molecules
    vdw: jnp.ndarray,  # (B, N)
    zanchor: jnp.ndarray,  # (B,)
    x0: jnp.ndarray,  # (B, 2) polish start / (B,) grid half-width
    *,
    maxiter: int,
    xatol: float = 1e-4,
    fatol: float = 1e-4,
    tile: int = 128,
    interpret: bool | None = None,
    brute_ns: int = 0,
):
    """Run the fused (brute grid +) NM polish over a flat batch;
    returns ``(x (B,2), f (B,), capped (B,))``.  With ``brute_ns > 0``
    the ``x0`` argument is the per-lane grid half-width (B,) and the
    kernel computes the grid argmin itself."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = coords.shape
    dtype = x0.dtype
    # atoms on the sublane axis: granularity 8 (see lbfgsb_stable_flat)
    n_pad = _round_up(max(n, 8), 8)
    tile = min(tile, _round_up(max(b, 8), 8))
    b_pad = _round_up(max(b, 8), tile)

    coords_t = jnp.full((3, n_pad, b_pad), 1.0e6, dtype)
    coords_t = coords_t.at[:, :n, :b].set(
        jnp.transpose(coords.astype(dtype), (2, 1, 0))
    )
    vdw_t = jnp.zeros((n_pad, b_pad), dtype).at[:n, :b].set(vdw.T)
    za_t = jnp.zeros((1, b_pad), dtype).at[0, :b].set(zanchor)
    x0_rows = 1 if brute_ns > 0 else 2
    x0_2d = x0.reshape(b, x0_rows)
    x0_t = jnp.zeros((x0_rows, b_pad), dtype).at[:, :b].set(x0_2d.T)
    valid_t = jnp.zeros((1, b_pad), dtype).at[0, :b].set(1.0)

    kernel = nm_xy_kernel_body(
        maxiter=maxiter, xatol=xatol, fatol=fatol, brute_ns=brute_ns
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
            spec(1),
            spec(x0_rows),
            spec(1),
        ],
        out_specs=(spec(2), spec(3)),
        out_shape=(
            jax.ShapeDtypeStruct((2, b_pad), dtype),
            jax.ShapeDtypeStruct((3, b_pad), dtype),
        ),
        interpret=interpret,
    )(coords_t, vdw_t, za_t, x0_t, valid_t)

    return (
        x_t[:, :b].T,
        stats[0, :b],
        stats[1, :b] > 0.5,
    )


@functools.lru_cache(maxsize=8)
def _nm_nd(maxiter, xatol, fatol, tile, brute_ns=0):
    """Rank-polymorphic, vmap-transparent NM polish (see
    lbfgsb_pallas._stable_opt_nd for the custom_vmap pattern)."""
    from jax import custom_batching

    x0_shape = () if brute_ns > 0 else (2,)

    @custom_batching.custom_vmap
    def opt(coords, vdw, zanchor, x0):
        lead = coords.shape[:-2]
        n = coords.shape[-2]
        b = 1
        for s in lead:
            b *= s
        x, f, capped = nm_xy_flat(
            coords.reshape((b, n, 3)),
            vdw.reshape((b, n)),
            zanchor.reshape((b,)),
            x0.reshape((b,) + x0_shape),
            maxiter=maxiter,
            xatol=xatol,
            fatol=fatol,
            tile=tile,
            brute_ns=brute_ns,
        )
        return (
            x.reshape(lead + (2,)),
            f.reshape(lead),
            capped.reshape(lead),
        )

    @opt.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        bargs = []
        for a, b_ in zip(args, in_batched):
            if not b_:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            bargs.append(a)
        return opt(*bargs), (True, True, True)

    return opt


def nm_xy_stable_pallas(rmol_coords, rmol_vdw, z_star, x0, maxiter: int,
                        xatol: float = 1e-4, fatol: float = 1e-4,
                        tile: int = 128):
    """Window-xy NM polish through the fused kernel.

    Drop-in for the ``nelder_mead`` stage of
    :func:`pywindow_tpu.ops.optim.brute_then_polish` with the stable
    delta-space objective (reference: scipy ``fmin`` polish,
    utilities.py:1312-1317).  Safe under any vmap nesting.  Returns
    ``(xy (2,), f (), capped ())`` per lane.
    """
    opt = _nm_nd(maxiter, xatol, fatol, tile)
    zs = jnp.asarray(z_star, rmol_coords.dtype)
    return opt(rmol_coords, rmol_vdw, zs, x0)


def brute_nm_xy_stable_pallas(
    rmol_coords, rmol_vdw, z_star, half, ns: int, maxiter: int,
    xatol: float = 1e-4, fatol: float = 1e-4, tile: int = 128,
):
    """Fused brute grid + NM polish in ONE kernel dispatch.

    Drop-in for ``brute_start`` + :func:`nm_xy_stable_pallas` on the
    routed TPU path (reference: ``scipy.optimize.brute(..., Ns=ns,
    finish=fmin)``, utilities.py:1312-1317): ``half`` is the per-lane
    grid half-width (scipy's bound ±window_radius), the ns x ns
    inclusive grid is scanned in-kernel against the VMEM-resident
    clearance context, and the polish starts from its first-min
    argmin.  Safe under any vmap nesting; returns
    ``(xy (2,), f (), capped ())`` per lane.
    """
    opt = _nm_nd(maxiter, xatol, fatol, tile, brute_ns=int(ns))
    zs = jnp.asarray(z_star, rmol_coords.dtype)
    hf = jnp.asarray(half, rmol_coords.dtype)
    return opt(rmol_coords, rmol_vdw, zs, hf)
