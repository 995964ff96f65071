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
    f_batch: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimise ``f`` over R^d with the scipy fmin update rules.

    Returns ``(x_best, f_best, capped)``; ``capped`` is True when the
    iteration budget stopped the search before convergence.

    ``lower``/``upper`` clip every proposed vertex into the box (the
    reference enforces bounds through L-BFGS-B; clipping reproduces the
    same interior optima).  Returns ``(x_best, f_best)``.

    ``f_batch``: optional fused (K, d) -> (K,) evaluator.  Every
    candidate of one iteration (reflection, expansion, the two
    contractions and the shrunk vertices) is then evaluated in ONE
    batched call instead of per-candidate op chains — selection is
    identical, but the while-body's sequential op chain (the dominant
    latency inside vmapped pipelines, where ``lax.cond`` computes both
    branches anyway) shrinks ~3x.
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

    if f_batch is None:
        def f_batch(pts):  # noqa: E306
            return jax.vmap(f)(pts)

    def sort_simplex(sim, fsim):
        """Stable sort of the d+1 vertices by f, as an unrolled
        compare/select network (equivalent to the stable
        ``jnp.argsort`` + gather, but ~10x cheaper inside a TPU while
        body — XLA's sort lowering is a multi-pass bitonic with layout
        shuffles).  Bubble passes with strict > swaps preserve the
        original order of ties, matching stable argsort."""
        n = sim.shape[0]
        rows = [sim[i] for i in range(n)]
        fs = [fsim[i] for i in range(n)]
        for _ in range(n - 1):
            for i in range(n - 1):
                sw = fs[i] > fs[i + 1]
                fi, fj = fs[i], fs[i + 1]
                ri, rj = rows[i], rows[i + 1]
                fs[i] = jnp.where(sw, fj, fi)
                fs[i + 1] = jnp.where(sw, fi, fj)
                rows[i] = jnp.where(sw, rj, ri)
                rows[i + 1] = jnp.where(sw, ri, rj)
        return jnp.stack(rows), jnp.stack(fs)

    sim = jax.vmap(clip)(_initial_simplex(x0, init_step))
    fsim = f_batch(sim)
    sim, fsim = sort_simplex(sim, fsim)

    def converged(sim, fsim):
        x_spread = jnp.max(jnp.abs(sim[1:] - sim[0]))
        f_spread = jnp.max(jnp.abs(fsim[1:] - fsim[0]))
        return (x_spread <= xatol) & (f_spread <= fatol)

    def body(state):
        sim, fsim, it = state
        xbar = jnp.mean(sim[:-1], axis=0)
        xr = clip((1.0 + _RHO) * xbar - _RHO * sim[-1])
        xe = clip((1.0 + _RHO * _CHI) * xbar - _RHO * _CHI * sim[-1])
        xc = clip((1.0 + _PSI * _RHO) * xbar - _PSI * _RHO * sim[-1])
        xcc = clip((1.0 - _PSI) * xbar + _PSI * sim[-1])
        shrunk_sim = jax.vmap(clip)(sim[0] + _SIGMA * (sim - sim[0]))

        # one fused evaluation of every point this iteration could need;
        # scipy evaluates lazily, but the values (hence the branch
        # decisions below) are identical
        cand = jnp.concatenate(
            [jnp.stack([xr, xe, xc, xcc]), shrunk_sim[1:]], axis=0
        )
        fc = f_batch(cand)
        fxr, fxe, fxc, fxcc = fc[0], fc[1], fc[2], fc[3]
        shrunk_fsim = jnp.concatenate([fsim[:1], fc[4:]], axis=0)

        best = fxr < fsim[0]
        good = fxr < fsim[-2]
        worse = fxr < fsim[-1]

        use_xe = best & (fxe < fxr)
        need_xc = (~best) & (~good) & worse
        need_xcc = (~best) & (~good) & (~worse)

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

        sim = jnp.where(shrink, shrunk_sim, replaced_sim)
        fsim = jnp.where(shrink, shrunk_fsim, replaced_fsim)
        sim, fsim = sort_simplex(sim, fsim)
        return sim, fsim, it + 1

    def cond(state):
        sim, fsim, it = state
        return (it < maxiter) & ~converged(sim, fsim)

    sim, fsim, it = jax.lax.while_loop(cond, body, (sim, fsim, 0))
    # budget-stopped (a larger maxiter would keep iterating): drives the
    # fast-budget escalation retry (see AnalysisConfig.fast_budgets)
    capped = (it >= maxiter) & ~converged(sim, fsim)
    return sim[0], fsim[0], capped


def brute_then_polish(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    ns: int,
    maxiter: int = 400,
    xatol: float = 1e-4,
    fatol: float = 1e-4,
    f_batch: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense 2-D grid minimisation followed by a Nelder-Mead polish.

    Returns ``(x_best, f_best, capped)`` — ``capped`` True when the
    polish stopped on its iteration budget rather than convergence.

    Mirrors ``scipy.optimize.brute(..., Ns=ns, finish=fmin)``
    (reference: utilities.py:1312-1317): the grid is ``linspace`` with
    both endpoints included; the polish starts from the best grid point
    with scipy's default initial-simplex rule and fmin's default
    tolerances (xtol=ftol=1e-4).

    ``f_batch``: optional fused (K, d) -> (K,) evaluator used for the
    grid pass (callers route it through a Pallas kernel on TPU so the
    (grid, atoms) clearance intermediate stays out of HBM) AND for the
    per-iteration candidate batches of the polish.
    """
    x0 = brute_start(f, lower, upper, ns, f_batch=f_batch)
    return nelder_mead(
        f, x0, xatol=xatol, fatol=fatol, maxiter=maxiter,
        f_batch=f_batch,
    )


def brute_start(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    ns: int,
    f_batch: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """The dense-grid argmin that seeds the polish (scipy ``brute``'s
    grid pass; reference: utilities.py:1312-1314).  Split out so the
    TPU path can pair this exact jnp grid with the fused Pallas
    Nelder–Mead kernel (ops/nm_pallas.py)."""
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
    sel = jnp.arange(fg.shape[0], dtype=jnp.int32) == i
    # masked sum, not a one-hot matmul: TPU f32 matmuls default to bf16
    # multiplies, which would round the selected grid point itself.
    return jnp.sum(jnp.where(sel[:, None], grid, 0.0), axis=0)
