"""On-device derivative-free optimisers for the pore/window refinement.

The reference leans on scipy: ``minimize`` (L-BFGS-B) for the pore centre
and window z (reference: utilities.py:400-426, :1301-1305), and
``brute`` + ``fmin`` (Nelder-Mead) for the window xy plane
(reference: utilities.py:1312-1317).  Parity target is the *optimum*, not
the optimiser: the objectives are piecewise-smooth max/min-clearance
fields whose local optima are pinned by 2-4 active atoms, so a tightly
converged Nelder-Mead lands on the same point scipy does (validated
against the golden suites to < 1e-3 A).

Everything here is pure jnp + ``lax.while_loop``: jit-able, vmap-able
across windows x molecules x frames, with static iteration bounds.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# scipy Nelder-Mead standard coefficients (non-adaptive).
_RHO = 1.0  # reflection
_CHI = 2.0  # expansion
_PSI = 0.5  # contraction
_SIGMA = 0.5  # shrink
_NONZDELT = 0.05
_ZDELT = 0.00025


def _initial_simplex(x0: jnp.ndarray, init_step: jnp.ndarray) -> jnp.ndarray:
    """Simplex of d+1 points: x0 plus one displacement per dimension."""
    d = x0.shape[-1]
    eye = jnp.eye(d, dtype=x0.dtype)
    return jnp.concatenate(
        [x0[None, :], x0[None, :] + eye * init_step[None, :]], axis=0
    )


def scipy_default_step(x0: jnp.ndarray) -> jnp.ndarray:
    """scipy fmin's initial-simplex displacement rule per coordinate."""
    return jnp.where(x0 != 0.0, _NONZDELT * x0, _ZDELT)


def nelder_mead(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    init_step: jnp.ndarray | None = None,
    lower: jnp.ndarray | None = None,
    upper: jnp.ndarray | None = None,
    xatol: float = 1e-8,
    fatol: float = 1e-12,
    maxiter: int = 400,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Minimise ``f`` over R^d with the scipy fmin update rules.

    ``lower``/``upper`` clip every proposed vertex into the box (the
    reference enforces bounds through L-BFGS-B; clipping reproduces the
    same interior optima).  Returns ``(x_best, f_best)``.
    """
    d = x0.shape[-1]
    if init_step is None:
        init_step = scipy_default_step(x0)

    def clip(x):
        if lower is not None:
            x = jnp.maximum(x, lower)
        if upper is not None:
            x = jnp.minimum(x, upper)
        return x

    sim = jax.vmap(clip)(_initial_simplex(x0, init_step))
    fsim = jax.vmap(f)(sim)
    order = jnp.argsort(fsim)
    sim, fsim = sim[order], fsim[order]

    def converged(sim, fsim):
        x_spread = jnp.max(jnp.abs(sim[1:] - sim[0]))
        f_spread = jnp.max(jnp.abs(fsim[1:] - fsim[0]))
        return (x_spread <= xatol) & (f_spread <= fatol)

    def body(state):
        sim, fsim, it = state
        xbar = jnp.mean(sim[:-1], axis=0)
        xr = clip((1.0 + _RHO) * xbar - _RHO * sim[-1])
        fxr = f(xr)

        xe = clip((1.0 + _RHO * _CHI) * xbar - _RHO * _CHI * sim[-1])
        xc = clip((1.0 + _PSI * _RHO) * xbar - _PSI * _RHO * sim[-1])
        xcc = clip((1.0 - _PSI) * xbar + _PSI * sim[-1])

        best = fxr < fsim[0]
        good = fxr < fsim[-2]
        worse = fxr < fsim[-1]

        # Pick which single candidate (if any) replaces the worst vertex;
        # evaluate only the one actually needed per the scipy branch order.
        inf = jnp.asarray(jnp.inf, dtype=fsim.dtype)
        fxe = jax.lax.cond(best, f, lambda _: inf, xe)
        use_xe = best & (fxe < fxr)
        need_xc = (~best) & (~good) & worse
        need_xcc = (~best) & (~good) & (~worse)
        fxc = jax.lax.cond(need_xc, f, lambda _: inf, xc)
        fxcc = jax.lax.cond(need_xcc, f, lambda _: inf, xcc)

        accept_xc = need_xc & (fxc <= fxr)
        accept_xcc = need_xcc & (fxcc < fsim[-1])
        # unresolved contractions shrink the whole simplex towards the best
        shrink = (need_xc & ~accept_xc) | (need_xcc & ~accept_xcc)

        new_last = jnp.where(
            use_xe[..., None],
            xe,
            jnp.where(
                accept_xc[..., None],
                xc,
                jnp.where(accept_xcc[..., None], xcc, xr),
            ),
        )
        new_flast = jnp.where(
            use_xe, fxe, jnp.where(accept_xc, fxc, jnp.where(accept_xcc, fxcc, fxr))
        )
        replaced_sim = sim.at[-1].set(new_last)
        replaced_fsim = fsim.at[-1].set(new_flast)

        shrunk_sim = jax.vmap(clip)(sim[0] + _SIGMA * (sim - sim[0]))
        shrunk_fsim = jax.vmap(f)(shrunk_sim)

        sim = jnp.where(shrink, shrunk_sim, replaced_sim)
        fsim = jnp.where(shrink, shrunk_fsim, replaced_fsim)
        order = jnp.argsort(fsim)
        return sim[order], fsim[order], it + 1

    def cond(state):
        sim, fsim, it = state
        return (it < maxiter) & ~converged(sim, fsim)

    sim, fsim, _ = jax.lax.while_loop(cond, body, (sim, fsim, 0))
    return sim[0], fsim[0]


def brute_then_polish(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    ns: int,
    maxiter: int = 400,
    xatol: float = 1e-4,
    fatol: float = 1e-4,
    f_batch: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense 2-D grid minimisation followed by a Nelder-Mead polish.

    Mirrors ``scipy.optimize.brute(..., Ns=ns, finish=fmin)``
    (reference: utilities.py:1312-1317): the grid is ``linspace`` with
    both endpoints included; the polish starts from the best grid point
    with scipy's default initial-simplex rule and fmin's default
    tolerances (xtol=ftol=1e-4).

    ``f_batch``: optional fused (K, d) -> (K,) evaluator for the grid
    pass (callers route it through a Pallas kernel on TPU so the
    (grid, atoms) clearance intermediate stays out of HBM); the polish
    always uses the scalar ``f``.
    """
    gx = jnp.linspace(lower[0], upper[0], ns)
    gy = jnp.linspace(lower[1], upper[1], ns)
    grid = jnp.stack(
        [
            jnp.repeat(gx, ns),
            jnp.tile(gy, ns),
        ],
        axis=-1,
    )  # row-major (x outer) like np.mgrid -> argmin tie behaviour matches
    fg = f_batch(grid) if f_batch is not None else jax.vmap(f)(grid)
    # one-hot contraction, NOT grid[argmin]: a batched dynamic gather
    # under nested vmap lowers to a (ns^2, ns^2) one-hot select per
    # window (~9 MB/frame measured on CC3) and was the pipeline's
    # single largest HBM temp.  argmin keeps scipy's first-min ties.
    i = jnp.argmin(fg)
    sel = jnp.arange(fg.shape[0]) == i
    # masked sum, not a one-hot matmul: TPU f32 matmuls default to bf16
    # multiplies, which would round the selected grid point itself.
    x0 = jnp.sum(jnp.where(sel[:, None], grid, 0.0), axis=0)
    return nelder_mead(
        f, x0, xatol=xatol, fatol=fatol, maxiter=maxiter
    )
