"""Pallas TPU kernels for the vdW clearance field and the ray sweep.

``clearance(p) = min_i(||x_i - p|| - vdw_i)`` is the framework's hot
primitive (see ops/geometry.py).  This module provides hand-tiled
Pallas implementations that keep the molecule resident in VMEM and
stream probe/ray tiles through the VPU:

- :func:`clearance_min_pallas` — standalone clearance field (large-N
  regime; measured 2.1x at Q=65536/N=4096, bitwise equal to jnp).
- :func:`path_sweep_pallas` — the fused ray-path sweep behind
  ``ops.rays.path_analysis``.  The jnp formulation materialises a
  ``(B, P*L, N)`` distance intermediate in HBM (the round-1 batch
  ceiling: allocation failure at B=1920 on CC3); this kernel walks the
  L path steps in-kernel and reduces each ray to (ok, argmin step,
  min clearance), so nothing larger than ``(B, P, N)-per-step-tile``
  ever exists — and that lives in VMEM, not HBM.

The analysis pipeline's *latency* is optimiser while_loops, not
clearance compute, so ``clearance_min_pallas`` stays unrouted; the ray
sweep routing is about HBM capacity (batch ceiling), not speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _i32(v: int):
    """Index-map constants pinned to i32: under x64 a bare python int
    traces as i64 and 64-bit values crash the mosaic layout inferer."""
    import jax.numpy as _jnp

    return _jnp.int32(v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def clearance_min_pallas(
    probes: jnp.ndarray,  # (Q, 3)
    coords: jnp.ndarray,  # (N, 3) padded slots parked far away
    vdw: jnp.ndarray,  # (N,)
    tile_q: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:  # (Q,)
    """min over atoms of (||x - p|| - vdw) per probe, Pallas-tiled.

    Padded atoms must follow the MolArrays convention (coords ~1e6,
    vdw 0) so they can never win the min — no mask needed in-kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q, _ = probes.shape
    n = coords.shape[0]
    dtype = probes.dtype
    tile_q = min(tile_q, _round_up(max(q, 8), 8))
    q_pad = _round_up(max(q, 8), tile_q)
    n_pad = _round_up(max(n, 128), 128)

    probes_p = jnp.zeros((q_pad, 3), dtype).at[:q].set(probes)
    coords_p = jnp.full((n_pad, 3), 1.0e6, dtype).at[:n].set(coords)
    vdw_p = jnp.zeros((n_pad,), dtype).at[:n].set(vdw)

    def kernel(p_ref, x_ref, r_ref, out_ref):
        p = p_ref[:]  # (tile_q, 3)
        x = x_ref[:]  # (n_pad, 3)
        r = r_ref[:]  # (1, n_pad)
        # diff-form distances: exact in f32 (the gram form cancels).
        # (tile_q, n_pad) built one coordinate at a time to keep the
        # working set at 2D tiles.
        acc = None
        for k in range(3):
            d = p[:, k][:, None] - x[:, k][None, :]
            acc = d * d if acc is None else acc + d * d
        dist = jnp.sqrt(acc) - r
        out_ref[:] = jnp.min(dist, axis=1, keepdims=True)

    out = pl.pallas_call(
        kernel,
        grid=(q_pad // tile_q,),
        in_specs=[
            pl.BlockSpec(
                (tile_q, 3), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_pad, 3), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_pad), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, 1), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((q_pad, 1), dtype),
        interpret=interpret,
    )(probes_p, coords_p, vdw_p.reshape(1, n_pad))
    return out[:q, 0]


@functools.lru_cache(maxsize=8)
def _pick_tile_p(n_pad: int) -> int:
    """Ray-tile size keeping the per-step (tile_p, N) working set ~<=4MB
    of VMEM (v5e has ~16MB/core; leave room for atoms + double buffers)."""
    tile = 512
    while tile > 8 and tile * n_pad * 4 > 4 * 1024 * 1024:
        tile //= 2
    return tile


#: atom counts above this keep the legacy atoms-on-lanes kernels: the
#: transposed layout holds full (n8, tile_p) working arrays in VMEM and
#: cannot shrink the ray tile below one 128-lane register, so a huge
#: molecule would overflow scoped vmem there (the wide layout instead
#: shrinks its ray rows down to 8).
_TRANSPOSE_ATOM_LIMIT = 4096


@functools.lru_cache(maxsize=16)
def _fit_tile_lanes(p: int, n8: int) -> int:
    """Ray tile (lane axis, multiple of 128) minimising padded work.

    The transposed kernels put rays on lanes: real VPU work scales with
    the padded lane count, so the tile is chosen to minimise
    ``programs * tile`` under a ~2MB cap on one (n8, tile) f32 array
    (several live at once in-kernel) — e.g. 810 rays become 7x128
    (pad 896, 0 dead tiles) instead of 2x512 (pad 1024, 26% dead).
    """
    cap = max(128, (2 * 1024 * 1024 // (n8 * 4)) // 128 * 128)
    p128 = _round_up(max(p, 128), 128)
    best = p128  # tile == p128 when it fits the cap: one program
    if p128 <= cap:
        return p128
    best_total, best_tile = None, 128
    for progs in range(1, p128 // 128 + 1):
        tile = _round_up(-(-p128 // progs), 128)
        if tile > cap:
            continue
        total = tile * progs
        if (
            best_total is None
            or total < best_total
            or (total == best_total and tile > best_tile)
        ):
            best_total, best_tile = total, tile
    return best_tile


def _fit_tile(p: int, cap: int) -> int:
    """Ray tile <= cap minimising padding: split the rays over the
    fewest programs the VMEM cap allows and round the per-program share
    up to 8 — e.g. 810 rays under a 512 cap become 2x408 (pad 816)
    instead of 2x512 (pad 1024, 26% dead lanes).  Padded rays are inert
    in both kernels (results sliced off; per-ray arithmetic independent)
    so the tiling never changes real-ray values."""
    p8 = _round_up(max(p, 8), 8)
    if p8 <= cap:
        return p8
    progs = -(-p8 // cap)
    return _round_up(-(-p8 // progs), 8)


def path_sweep_pallas(
    vectors: jnp.ndarray,  # (P, 3) ray end points (path start = origin)
    chunks: jnp.ndarray,  # (P,) int32 path chunk counts (>= 1)
    coords: jnp.ndarray,  # (N, 3) atom coordinates (padded slots ~1e6)
    vdw: jnp.ndarray,  # (N,) vdW radii (padded slots 0)
    max_steps: int,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused ray-path sweep: per ray (all_clear, argmin step, min clearance).

    Walks each ray in ``max_steps`` clearance evaluations at
    ``l * vector / chunks`` (l = 0..max_steps-1, steps beyond ``chunks``
    masked), reducing over path steps AND atoms in-kernel so the
    ``(P, max_steps, N)`` intermediate of the jnp formulation never
    reaches HBM.  Implements ``ops.rays.path_analysis`` semantics
    (reference behaviour: utilities.py:1100-1129) in Gram form, which
    agrees with the jnp difference form to ~1e-6 A in f32 (FMA/layout
    rounding; the 7-system golden gate is the arbiter — exact under the
    x64 test config).  Padded atoms follow the MolArrays convention
    (coords ~1e6, vdw 0) and cannot win the min.  Returns float arrays:
    (ok (P,), pos (P,), cmin (P,)).

    Layout: atoms on the SUBLANE axis (granularity 8), rays on lanes —
    a lane-aligned atom axis streamed 34% dead lanes through the VPU on
    CC3 (168 -> 256 slots).  The two layouts agree to the same ~1e-6 A
    (tile choice never reorders a ray's own reduction); molecules above
    :data:`_TRANSPOSE_ATOM_LIMIT` atoms keep the wide layout, whose ray
    tile can shrink to 8 rows.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = vectors.shape[0]
    n = coords.shape[0]
    dtype = vectors.dtype
    big = 1.0e30  # python float: jnp scalars become captured consts in-kernel

    if n > _TRANSPOSE_ATOM_LIMIT:
        return _path_sweep_pallas_wide(
            vectors, chunks, coords, vdw, max_steps, interpret
        )

    n8 = _round_up(max(n, 8), 8)
    tile_p = _fit_tile_lanes(p, n8)
    p_pad = _round_up(max(p, 128), tile_p)

    vectors_t = jnp.zeros((3, p_pad), dtype).at[:, :p].set(vectors.T)
    # padded rays walk the zero vector with chunks=1: clearance at the
    # origin, finite and harmless; results are sliced off below.
    chunksf_p = (
        jnp.ones((1, p_pad), dtype).at[0, :p].set(chunks.astype(dtype))
    )
    coords_p = jnp.full((n8, 3), 1.0e6, dtype).at[:n].set(coords)
    vdw_col = jnp.zeros((n8, 1), dtype).at[:n, 0].set(vdw)

    def kernel(v_ref, ch_ref, x_ref, r_ref, ok_ref, pos_ref, cmin_ref):
        ch = ch_ref[:]  # (1, tile_p)
        r = r_ref[:]  # (n8, 1)
        zero = jnp.asarray(0.0, dtype)

        # Gram-form distances: the probe point of ray p at step l is
        # q = (l/ch_p) * v_p, so d^2 = frac^2 |v|^2 - 2 frac (x.v) + |x|^2
        # with the (n8, tile_p) Gram matrix G = x.v and the squared
        # norms hoisted OUT of the step loop — 3 full-tile ops per step
        # (broadcast add, fused multiply-add, clamp) instead of the six
        # of the diff form.  The clamp guards sqrt against the ~1e-5 A^2
        # rounding of the cancelled form; a clamped probe sits inside an
        # atom (clearance < -vdw), where c = -r keeps the ray blocked
        # and never wins the min of an open ray.  Accuracy vs the diff
        # form: ~1e-6 A on clearances (terms <= |q||x| ~ 1e2 at 2^-24),
        # arbitrated by the 7-system golden gate (<0.01 A contract).
        g = None
        x2 = None
        v2 = None
        for k in range(3):
            xk = x_ref[:, k : k + 1]  # (n8, 1)
            vk = v_ref[k : k + 1, :]  # (1, tile_p)
            t = xk * vk
            g = t if g is None else g + t  # (n8, tile_p)
            x2 = xk * xk if x2 is None else x2 + xk * xk  # (n8, 1)
            v2 = vk * vk if v2 is None else v2 + vk * vk  # (1, tile_p)

        def body(step, carry):
            ok, pos, cmin = carry
            lf = step.astype(dtype)
            frac = lf / ch  # (1, tile_p) — same div as the jnp path
            row = frac * frac * v2  # (1, tile_p)
            neg2f = jnp.asarray(-2.0, dtype) * frac  # (1, tile_p)
            d2 = jnp.maximum((row + x2) + neg2f * g, zero)
            c = jnp.sqrt(d2) - r  # (n8, tile_p)
            cl = jnp.min(c, axis=0, keepdims=True)  # (1, tile_p)
            validl = lf <= ch
            # dtype-pinned (a bare 1.0/0.0 where would be x64's f64)
            ok = ok * ((cl > jnp.asarray(0.0, dtype)) | ~validl).astype(
                dtype
            )
            cm = jnp.where(validl, cl, jnp.full_like(cl, big))
            better = cm < cmin
            cmin = jnp.where(better, cm, cmin)
            pos = jnp.where(better, lf, pos)
            return ok, pos, cmin

        ok0 = jnp.ones((1, ch.shape[1]), dtype)
        pos0 = jnp.zeros((1, ch.shape[1]), dtype)
        cmin0 = jnp.full((1, ch.shape[1]), big, dtype)
        # dynamic trip count (see _path_sweep_pallas_wide); per-tile max
        n_steps = jnp.minimum(
            jnp.max(ch).astype(jnp.int32) + jnp.int32(1),
            jnp.int32(max_steps),
        )
        ok, pos, cmin = jax.lax.fori_loop(
            jnp.int32(0), n_steps, body, (ok0, pos0, cmin0)
        )
        ok_ref[:] = ok
        pos_ref[:] = pos
        cmin_ref[:] = cmin

    row_spec = pl.BlockSpec(
        (1, tile_p), lambda i: (_i32(0), i), memory_space=pltpu.VMEM
    )
    atom_spec = lambda cols: pl.BlockSpec(  # noqa: E731
        (n8, cols), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
    )
    n_tiles = p_pad // tile_p
    ok, pos, cmin = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (3, tile_p), lambda i: (_i32(0), i), memory_space=pltpu.VMEM
            ),
            row_spec,
            atom_spec(3),
            atom_spec(1),
        ],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, p_pad), dtype),
            jax.ShapeDtypeStruct((1, p_pad), dtype),
            jax.ShapeDtypeStruct((1, p_pad), dtype),
        ),
        interpret=interpret,
    )(vectors_t, chunksf_p, coords_p, vdw_col)
    return ok[0, :p], pos[0, :p], cmin[0, :p]


def _path_sweep_pallas_wide(
    vectors: jnp.ndarray,
    chunks: jnp.ndarray,
    coords: jnp.ndarray,
    vdw: jnp.ndarray,
    max_steps: int,
    interpret: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Legacy atoms-on-lanes path sweep (very large molecules only)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = vectors.shape[0]
    n = coords.shape[0]
    dtype = vectors.dtype
    big = 1.0e30

    n_pad = _round_up(max(n, 128), 128)
    # fit the ray tile to the ray count (the W-slot refinement sweep
    # has P~16 and must not pad to a 512-ray tile; a spiral of 810
    # must not pad to 1024 — see _fit_tile)
    tile_p = _fit_tile(p, _pick_tile_p(n_pad))
    p_pad = _round_up(max(p, 8), tile_p)

    vectors_p = jnp.zeros((p_pad, 3), dtype).at[:p].set(vectors)
    # padded rays walk the zero vector with chunks=1: clearance at the
    # origin, finite and harmless; results are sliced off below.
    chunksf_p = (
        jnp.ones((p_pad, 1), dtype)
        .at[:p, 0]
        .set(chunks.astype(dtype))
    )
    coords_t = jnp.full((3, n_pad), 1.0e6, dtype).at[:, :n].set(coords.T)
    vdw_p = jnp.zeros((1, n_pad), dtype).at[0, :n].set(vdw)

    def kernel(v_ref, ch_ref, x_ref, r_ref, ok_ref, pos_ref, cmin_ref):
        v = v_ref[:]  # (tile_p, 3)
        ch = ch_ref[:]  # (tile_p, 1)
        r = r_ref[:]  # (1, n_pad)
        zero = jnp.asarray(0.0, dtype)

        # Gram-form distances with hoisted norms — see the transposed
        # kernel above for the derivation and the clamp rationale.
        g = None
        x2 = None
        v2 = None
        for k in range(3):
            xk = x_ref[k : k + 1, :]  # (1, n_pad)
            vk = v[:, k : k + 1]  # (tile_p, 1)
            t = vk * xk
            g = t if g is None else g + t  # (tile_p, n_pad)
            x2 = xk * xk if x2 is None else x2 + xk * xk  # (1, n_pad)
            v2 = vk * vk if v2 is None else v2 + vk * vk  # (tile_p, 1)

        def body(step, carry):
            ok, pos, cmin = carry
            lf = step.astype(dtype)
            frac = lf / ch  # (tile_p, 1) — same div as the jnp path
            col = frac * frac * v2  # (tile_p, 1)
            neg2f = jnp.asarray(-2.0, dtype) * frac  # (tile_p, 1)
            d2 = jnp.maximum((col + x2) + neg2f * g, zero)
            c = jnp.sqrt(d2) - r  # (tile_p, n_pad)
            cl = jnp.min(c, axis=1, keepdims=True)  # (tile_p, 1)
            validl = lf <= ch
            # dtype-pinned (a bare 1.0/0.0 where would be x64's f64)
            ok = ok * ((cl > jnp.asarray(0.0, dtype)) | ~validl).astype(
                dtype
            )
            cm = jnp.where(validl, cl, jnp.full_like(cl, big))
            better = cm < cmin
            cmin = jnp.where(better, cm, cmin)
            pos = jnp.where(better, lf, pos)
            return ok, pos, cmin

        ok0 = jnp.ones((v.shape[0], 1), dtype)
        pos0 = jnp.zeros((v.shape[0], 1), dtype)
        cmin0 = jnp.full((v.shape[0], 1), big, dtype)
        # dynamic trip count: steps beyond every ray's chunk count are
        # fully masked no-ops (validl False -> ok unchanged, cm = big
        # never wins), so stopping at max(ch)+1 is bitwise identical to
        # the static max_steps walk.  Spiral rays all share one radius,
        # so this trims the l1 padding (e.g. 16 -> 12 on CC3, ~25% of
        # the kernel's work; measured ~18 ms at B=4320).
        # i32 loop bounds: python ints would make the counter i64 under
        # x64, and 64-bit types crash the mosaic layout inferer
        n_steps = jnp.minimum(
            jnp.max(ch).astype(jnp.int32) + jnp.int32(1),
            jnp.int32(max_steps),
        )
        ok, pos, cmin = jax.lax.fori_loop(
            jnp.int32(0), n_steps, body, (ok0, pos0, cmin0)
        )
        ok_ref[:] = ok
        pos_ref[:] = pos
        cmin_ref[:] = cmin

    out_spec = pl.BlockSpec(
        (tile_p, 1), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
    )
    ok, pos, cmin = pl.pallas_call(
        kernel,
        grid=(p_pad // tile_p,),
        in_specs=[
            pl.BlockSpec(
                (tile_p, 3), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_p, 1), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, n_pad), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_pad), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((p_pad, 1), dtype),
            jax.ShapeDtypeStruct((p_pad, 1), dtype),
            jax.ShapeDtypeStruct((p_pad, 1), dtype),
        ),
        interpret=interpret,
    )(vectors_p, chunksf_p, coords_t, vdw_p)
    return ok[:p, 0], pos[:p, 0], cmin[:p, 0]


def ray_exit_pallas(
    unit: jnp.ndarray,  # (P, 3) unit ray directions
    rel: jnp.ndarray,  # (N, 3) atom coords relative to the ray origin
    #                    (padded slots zeroed, per MolArrays masking)
    vdw: jnp.ndarray,  # (N,) vdW radii (padded slots 0)
    origin: jnp.ndarray,  # (3,) ray origin in the molecule frame
    interpret: bool | None = None,
    want_exit: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused analytic ray/vdW-sphere intersection reduction.

    Per ray: does ANY sphere block it from the front, and what is the
    farthest 'exit' intersection distance from the frame origin
    (reference: utilities.py:1132-1161 ``vector_preanalysis`` and
    :1556-1583 ``vector_analysis_reversed``).  The jnp formulation
    (ops.rays.ray_sphere_intersections) materialises (P, N, 3)
    intermediates in HBM; here everything reduces over atoms in-kernel.

    The 'front' test uses the algebraic identity
    ``|p0|^2 < |p1|^2  <=>  t_hc > 0  and  t_ca + o.u > 0``
    (expand ``|o + t u|^2 = t^2 + 2 t (o.u) + |o|^2`` with ``|u| = 1``;
    ``t0/t1 = t_ca -/+ t_hc``), which removes both |p|^2 evaluations
    from the (atoms x rays) block; the exit distance keeps only
    ``|p1|^2`` in expanded form, and its sqrt is hoisted to the per-ray
    row (sqrt is monotone, so max commutes with it bitwise).

    ``want_exit=False`` (the pre-analysis, which consumes only
    ``any_front``) skips the exit computation entirely — the slim
    kernel needs no sqrt at all; ``max_exit`` is then -1e30 everywhere.

    Returns float arrays (any_front (P,), max_exit (P,)); rays with no
    front intersection report max_exit = -1e30.

    Layout: atoms on sublanes, rays on lanes (see
    :func:`path_sweep_pallas`); molecules above
    :data:`_TRANSPOSE_ATOM_LIMIT` atoms keep the wide layout.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = unit.shape[0]
    n = rel.shape[0]
    dtype = unit.dtype
    big = 1.0e30

    if n > _TRANSPOSE_ATOM_LIMIT:
        return _ray_exit_pallas_wide(
            unit, rel, vdw, origin, interpret, want_exit
        )

    n8 = _round_up(max(n, 8), 8)
    tile_p = _fit_tile_lanes(p, n8)
    p_pad = _round_up(max(p, 128), tile_p)

    unit_t = jnp.zeros((3, p_pad), dtype).at[:, :p].set(unit.T)
    # padded atoms: rel 0 / vdw 0 -> under_sqrt = 0 -> never a hit
    rel_p = jnp.zeros((n8, 3), dtype).at[:n].set(rel)
    vdw_col = jnp.zeros((n8, 1), dtype).at[:n, 0].set(vdw)
    org = jnp.zeros((1, 3), dtype).at[0].set(origin)

    def kernel(u_ref, x_ref, r_ref, o_ref, anyf_ref, mexit_ref):
        r = r_ref[:]  # (n8, 1)
        # literals pinned to the kernel dtype (see the wide variant)
        zero = jnp.asarray(0.0, dtype)
        neg_big = jnp.asarray(-big, dtype)

        t_ca = None
        ou = None  # (1, tile_p) o.u per ray
        o2 = None  # (1, 1) |o|^2
        for k in range(3):
            uk = u_ref[k : k + 1, :]
            t = uk * x_ref[:, k : k + 1]
            t_ca = t if t_ca is None else t_ca + t  # (n8, tile_p)
            ok_ = o_ref[0:1, k : k + 1]  # (1, 1)
            ouk = ok_ * uk
            ou = ouk if ou is None else ou + ouk
            o2 = ok_ * ok_ if o2 is None else o2 + ok_ * ok_
        # perpendicular distance in the stable diff form (the gram form
        # |x|^2 - t_ca^2 cancels catastrophically near tangency)
        d2 = None
        for k in range(3):
            perp = x_ref[:, k : k + 1] - t_ca * u_ref[k : k + 1, :]
            d2 = perp * perp if d2 is None else d2 + perp * perp
        under = r * r - d2
        hits = under > zero
        front = hits & ((t_ca + ou) > zero)
        anyf = jnp.max(front.astype(dtype), axis=0, keepdims=True)
        anyf_ref[:] = anyf
        if want_exit:
            t_hc = jnp.sqrt(jnp.where(hits, under, zero))
            t1 = t_ca + t_hc
            p1n2 = t1 * (t1 + (ou + ou)) + o2
            m = jnp.max(
                jnp.where(front, p1n2, neg_big), axis=0, keepdims=True
            )
            mexit_ref[:] = jnp.where(
                anyf > zero, jnp.sqrt(jnp.maximum(m, zero)), neg_big
            )
        else:
            mexit_ref[:] = jnp.full_like(anyf, neg_big)

    out_spec = pl.BlockSpec(
        (1, tile_p), lambda i: (_i32(0), i), memory_space=pltpu.VMEM
    )
    n_tiles = p_pad // tile_p
    anyf, mexit = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (3, tile_p), lambda i: (_i32(0), i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n8, 3), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n8, 1), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, p_pad), dtype),
            jax.ShapeDtypeStruct((1, p_pad), dtype),
        ),
        interpret=interpret,
    )(unit_t, rel_p, vdw_col, org)
    return anyf[0, :p], mexit[0, :p]


def _ray_exit_pallas_wide(
    unit: jnp.ndarray,
    rel: jnp.ndarray,
    vdw: jnp.ndarray,
    origin: jnp.ndarray,
    interpret: bool,
    want_exit: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Legacy atoms-on-lanes intersection reduction (very large
    molecules only — see :data:`_TRANSPOSE_ATOM_LIMIT`).  Same
    algebraic 'front' shortcut and hoisted exit sqrt as
    :func:`ray_exit_pallas`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = unit.shape[0]
    n = rel.shape[0]
    dtype = unit.dtype
    big = 1.0e30

    n_pad = _round_up(max(n, 128), 128)
    # fit the ray tile to the ray count (the W-slot refinement sweep
    # has P~16 and must not pad to a 512-ray tile; a spiral of 810
    # must not pad to 1024 — see _fit_tile)
    tile_p = _fit_tile(p, _pick_tile_p(n_pad))
    p_pad = _round_up(max(p, 8), tile_p)

    unit_p = jnp.zeros((p_pad, 3), dtype).at[:p].set(unit)
    # padded atoms: rel 0 / vdw 0 -> under_sqrt = 0 -> never a hit
    rel_t = jnp.zeros((3, n_pad), dtype).at[:, :n].set(rel.T)
    vdw_p = jnp.zeros((1, n_pad), dtype).at[0, :n].set(vdw)
    org = jnp.zeros((1, 3), dtype).at[0].set(origin)

    def kernel(u_ref, x_ref, r_ref, o_ref, anyf_ref, mexit_ref):
        u = u_ref[:]  # (tile_p, 3)
        r = r_ref[:]  # (1, n_pad)
        # literals pinned to the kernel dtype: under x64 a bare python
        # float traces as a weak-f64 constant whose f64->f32 cast
        # (tpu.truncf) mosaic cannot legalize
        zero = jnp.asarray(0.0, dtype)
        neg_big = jnp.asarray(-big, dtype)

        t_ca = None
        ou = None  # (tile_p, 1) o.u per ray
        o2 = None  # (1, 1) |o|^2
        for k in range(3):
            uk = u[:, k : k + 1]
            t = uk * x_ref[k : k + 1, :]
            t_ca = t if t_ca is None else t_ca + t  # (tile_p, n_pad)
            ok_ = o_ref[0:1, k : k + 1]  # (1, 1)
            ouk = ok_ * uk
            ou = ouk if ou is None else ou + ouk
            o2 = ok_ * ok_ if o2 is None else o2 + ok_ * ok_
        d2 = None
        for k in range(3):
            perp = x_ref[k : k + 1, :] - t_ca * u[:, k : k + 1]
            d2 = perp * perp if d2 is None else d2 + perp * perp
        under = r * r - d2
        hits = under > zero
        front = hits & ((t_ca + ou) > zero)
        anyf = jnp.max(
            # dtype-pinned: bare 1.0/0.0 branches would lower as the
            # x64 default float and break the f32 output ref
            front.astype(u.dtype), axis=1, keepdims=True
        )
        anyf_ref[:] = anyf
        if want_exit:
            t_hc = jnp.sqrt(jnp.where(hits, under, zero))
            t1 = t_ca + t_hc
            p1n2 = t1 * (t1 + (ou + ou)) + o2
            m = jnp.max(
                jnp.where(front, p1n2, neg_big), axis=1, keepdims=True
            )
            mexit_ref[:] = jnp.where(
                anyf > zero, jnp.sqrt(jnp.maximum(m, zero)), neg_big
            )
        else:
            mexit_ref[:] = jnp.full_like(anyf, neg_big)

    out_spec = pl.BlockSpec(
        (tile_p, 1), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
    )
    anyf, mexit = pl.pallas_call(
        kernel,
        grid=(p_pad // tile_p,),
        in_specs=[
            pl.BlockSpec(
                (tile_p, 3), lambda i: (i, _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, n_pad), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_pad), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3), lambda i: (_i32(0), _i32(0)), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((p_pad, 1), dtype),
            jax.ShapeDtypeStruct((p_pad, 1), dtype),
        ),
        interpret=interpret,
    )(unit_p, rel_t, vdw_p, org)
    return anyf[:p, 0], mexit[:p, 0]


# ---------------------------------------------------------------------------
# W-slot fine re-sampling: frames on lanes
# ---------------------------------------------------------------------------

#: Minimum flattened batch for the frames-on-lanes fine-path kernel;
#: below it the step-chunked jnp scan wins (lane utilisation < 1 tile).
_FINE_BATCH_MIN = 128


def _route_fine_to_pallas() -> bool:
    """Route the W-slot fine re-sampling to the frames-on-lanes kernel?

    TPU only; ``PYWINDOW_TPU_NO_PALLAS=1`` / ``PYWINDOW_TPU_NO_FINE_PALLAS=1``
    disable, ``PYWINDOW_TPU_FORCE_FINE_PALLAS=1`` forces interpret-mode
    routing on any backend (integration tests)."""
    import os

    if os.environ.get("PYWINDOW_TPU_NO_PALLAS"):
        return False
    if os.environ.get("PYWINDOW_TPU_NO_FINE_PALLAS"):
        return False
    if os.environ.get("PYWINDOW_TPU_FORCE_FINE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def _fine_scan_flat(vectors, chunksf, coords, vdw, max_steps):
    """Flat-batch mirror of ``ops.rays._path_small_p_chunked`` (the
    few-ray step-chunked scan), value-identical: the atom mask is
    unnecessary because padded atoms sit at ``FAR_AWAY`` and can never
    win the clearance min."""
    dtype = vectors.dtype
    big = jnp.asarray(1.0e30, dtype)
    chunk_len = 16
    n_chunks = (max_steps + chunk_len - 1) // chunk_len
    steps_all = jnp.arange(
        n_chunks * chunk_len, dtype=dtype
    ).reshape(n_chunks, chunk_len)

    shape_p = vectors.shape[:-1]  # (b, W)
    init = (
        jnp.ones(shape_p, dtype=bool),
        jnp.zeros(shape_p, dtype),
        jnp.full(shape_p, big, dtype),
    )

    def blk(carry, steps):
        ok, pos, cmin = carry
        frac = steps / chunksf[..., None]  # (b, W, chunk)
        pathway = vectors[..., None, :] * frac[..., None]
        # (b, W, chunk, N) distances, one chunk block at a time
        diff = pathway[..., None, :] - coords[:, None, None, :, :]
        c = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) - vdw[
            :, None, None, :
        ]
        c = jnp.min(c, axis=-1)  # (b, W, chunk)
        valid = (steps <= chunksf[..., None]) & (
            steps < jnp.asarray(float(max_steps), dtype)
        )
        ok = ok & jnp.all((c > 0.0) | ~valid, axis=-1)
        c_masked = jnp.where(valid, c, big)
        blk_min = jnp.min(c_masked, axis=-1)
        blk_pos = steps[jnp.argmin(c_masked, axis=-1)]
        better = blk_min < cmin
        cmin = jnp.where(better, blk_min, cmin)
        pos = jnp.where(better, blk_pos, pos)
        return (ok, pos, cmin), None

    (ok, pos, cmin), _ = jax.lax.scan(blk, init, steps_all)
    return ok.astype(dtype), pos, cmin


@functools.lru_cache(maxsize=16)
def _fine_path_nd(w: int, max_steps: int, dtype_name: str):
    """Rank-polymorphic, vmap-transparent W-slot fine path sweep.

    Same ``custom_vmap`` collapse as the fused optimiser kernels
    (ops/lbfgsb_pallas.py:_stable_opt_nd): nested vmaps flatten into
    ONE frames-on-lanes pallas dispatch.  The per-molecule trace (the
    unbatched base call, b = 1) falls back to the step-chunked scan —
    lane utilisation below one 128-frame tile is not worth a kernel.
    """
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fp(vectors, chunksf, coords, vdw):
        lead = vectors.shape[:-2]
        b = 1
        for s in lead:
            b *= s
        flat = _fine_path_flat(
            vectors.reshape((b,) + vectors.shape[len(lead):]),
            chunksf.reshape((b, w)),
            coords.reshape((b,) + coords.shape[len(lead):]),
            vdw.reshape((b, vdw.shape[-1])),
            max_steps,
        )
        return tuple(r.reshape(lead + (w,)) for r in flat)

    @fp.def_vmap
    def _rule(axis_size, in_batched, *args):  # noqa: ANN001
        bargs = []
        for a, b_ in zip(args, in_batched):
            if not b_:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            bargs.append(a)
        return fp(*bargs), (True, True, True)

    return fp


def _fine_path_flat(vectors, chunksf, coords, vdw, max_steps):
    """(b, W, 3) ray slots over (b, N, 3) frames -> (okf, posf, cmin).

    Frames-on-lanes layout: 128 frames per program on the lane axis,
    the W ray slots unrolled and the path steps walked by a
    ``fori_loop`` — each step is a fused ``(N8, 128)`` clearance
    evaluation reduced into running (ok, first-argmin step, min
    clearance) rows, exactly the scan's arithmetic (same diff-form
    distances, same strict-< first-minimum rule).  Replaces a
    per-frame 8-lane-wide scan that left 94% of the VPU lanes idle
    (the W-slot re-sampling was ~27 ms of the B=8640 step).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"
    b, w = chunksf.shape
    n = coords.shape[-2]
    dtype = vectors.dtype

    if b < _FINE_BATCH_MIN:
        return _fine_scan_flat(vectors, chunksf, coords, vdw, max_steps)

    n8 = _round_up(max(n, 8), 8)
    w8 = _round_up(max(w, 8), 8)
    b_pad = _round_up(b, 128)

    # transposed HBM operands, frames on the minor (lane) axis
    vec_t = jnp.zeros((w8 * 3, b_pad), dtype)
    vec_t = vec_t.at[: w * 3, :b].set(
        jnp.transpose(vectors, (1, 2, 0)).reshape(w * 3, b)
    )
    # padded lanes/slots divide by 1.0 (results sliced off)
    ch_t = jnp.ones((w8, b_pad), dtype).at[:w, :b].set(
        jnp.transpose(chunksf)
    )
    x_t = jnp.full((3 * n8, b_pad), 1.0e6, dtype)
    x_t = x_t.at[
        jnp.arange(3)[:, None] * n8 + jnp.arange(n)[None, :],
        : b,
    ].set(jnp.transpose(coords, (2, 1, 0)).reshape(3, n, b))
    r_t = jnp.zeros((n8, b_pad), dtype).at[:n, :b].set(
        jnp.transpose(vdw)
    )

    big = 1.0e30

    def kernel(v_ref, ch_ref, x_ref, r_ref, ok_ref, pos_ref, cm_ref):
        zero = jnp.asarray(0.0, dtype)
        one = jnp.asarray(1.0, dtype)
        bigc = jnp.asarray(big, dtype)
        r = r_ref[:]  # (n8, 128)
        for wi in range(w8):
            ch = ch_ref[wi : wi + 1, :]  # (1, 128)
            v0 = v_ref[3 * wi : 3 * wi + 1, :]
            v1 = v_ref[3 * wi + 1 : 3 * wi + 2, :]
            v2 = v_ref[3 * wi + 2 : 3 * wi + 3, :]

            def body(s, carry, ch=ch, v0=v0, v1=v1, v2=v2):
                okf, pos, cmin = carry
                sf = s.astype(dtype)
                frac = sf / ch  # (1, 128)
                d0 = x_ref[0 * n8 : 1 * n8, :] - v0 * frac
                d2_ = d0 * d0
                d1 = x_ref[1 * n8 : 2 * n8, :] - v1 * frac
                d2_ = d2_ + d1 * d1
                dz = x_ref[2 * n8 : 3 * n8, :] - v2 * frac
                d2_ = d2_ + dz * dz
                c = jnp.sqrt(d2_) - r  # (n8, 128)
                cm = jnp.min(c, axis=0, keepdims=True)  # (1, 128)
                valid = sf <= ch  # (1, 128) single-row bool
                okf = jnp.where(valid & (cm <= zero), zero, okf)
                better = valid & (cm < cmin)
                cmin = jnp.where(better, cm, cmin)
                pos = jnp.where(better, sf, pos)
                return okf, pos, cmin

            okf, pos, cmin = jax.lax.fori_loop(
                0,
                max_steps,
                body,
                (
                    jnp.full((1, 128), one),
                    jnp.full((1, 128), zero),
                    jnp.full((1, 128), bigc),
                ),
            )
            ok_ref[wi : wi + 1, :] = okf
            pos_ref[wi : wi + 1, :] = pos
            cm_ref[wi : wi + 1, :] = cmin

    spec_out = pl.BlockSpec(
        (w8, 128), lambda i: (_i32(0), i), memory_space=pltpu.VMEM
    )
    okf, posf, cmin = pl.pallas_call(
        kernel,
        grid=(b_pad // 128,),
        in_specs=[
            pl.BlockSpec(
                (w8 * 3, 128), lambda i: (_i32(0), i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (w8, 128), lambda i: (_i32(0), i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3 * n8, 128), lambda i: (_i32(0), i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n8, 128), lambda i: (_i32(0), i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(spec_out, spec_out, spec_out),
        out_shape=(
            jax.ShapeDtypeStruct((w8, b_pad), dtype),
            jax.ShapeDtypeStruct((w8, b_pad), dtype),
            jax.ShapeDtypeStruct((w8, b_pad), dtype),
        ),
        interpret=interpret,
    )(vec_t, ch_t, x_t, r_t)
    return (
        jnp.transpose(okf[:w, :b]),
        jnp.transpose(posf[:w, :b]),
        jnp.transpose(cmin[:w, :b]),
    )


def fine_path_sweep(vectors, chunksf, coords, vdw, max_steps: int):
    """Public entry for the W-slot fine re-sampling (see
    :func:`_fine_path_flat`): per-molecule signature ``(W, 3) rays,
    (W,) float chunks, (N, 3) coords, (N,) vdw`` — safe under any vmap
    nesting.  Returns ``(okf, posf, cmin)`` rows (floats; ok > 0.5)."""
    w = vectors.shape[-2]
    fp = _fine_path_nd(w, int(max_steps), jnp.dtype(vectors.dtype).name)
    return fp(vectors, chunksf, coords, vdw)
