"""Core geometry kernels: the fused vdW-clearance primitive and friends.

One primitive underlies almost everything the reference computes with
repeated sklearn ``euclidean_distances`` calls (reference:
utilities.py:355-388, :1100-1129): the *clearance field*

    clearance(p) = min_i ( ||x_i - p|| - vdw_i )        over valid atoms

Maximum diameter, pore diameter, ray-path analysis and both optimisers are
all thin wrappers over it, evaluated batched over points x windows x
molecules x frames via ``vmap``.  Everything here is pure jnp over padded,
masked arrays (see :mod:`pywindow_tpu.ops.encoding`) and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pywindow_tpu.ops.encoding import MolArrays

BIG = 1.0e30


def center_of_mass(mol: MolArrays) -> jnp.ndarray:
    """Mass-weighted centre (reference: utilities.py:127-148)."""
    w = jnp.where(mol.mask, mol.mass, 0.0)
    return jnp.sum(mol.coords * w[..., None], axis=-2) / jnp.sum(
        w, axis=-1, keepdims=True
    )


def center_of_coor(mol: MolArrays) -> jnp.ndarray:
    """Unweighted coordinate mean (reference: utilities.py:110-124)."""
    w = mol.mask.astype(mol.coords.dtype)
    return jnp.sum(mol.coords * w[..., None], axis=-2) / jnp.sum(
        w, axis=-1, keepdims=True
    )


def molecular_weight(mol: MolArrays) -> jnp.ndarray:
    """Sum of atomic masses (reference: utilities.py:96-107)."""
    return jnp.sum(jnp.where(mol.mask, mol.mass, 0.0), axis=-1)


def shift_to(mol: MolArrays, target_com: jnp.ndarray) -> MolArrays:
    """Translate so the centre of mass lands on ``target_com``.

    Mirrors ``shift_com`` (reference: utilities.py:344-352) where
    ``com_adjust`` is the requested post-shift centre of mass.
    """
    shift = center_of_mass(mol) - target_com
    return mol._replace(
        coords=jnp.where(
            mol.mask[..., None], mol.coords - shift[..., None, :], mol.coords
        )
    )


def pairwise_distances(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances between point sets ``a`` (..,P,3), ``b`` (..,N,3).

    Written as diff-then-norm: at the few-thousand-point scale of this
    workload the MXU gains of the gram-matrix form are not worth its
    catastrophic cancellation, and accuracy is the contract here.
    """
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def clearance_field(points: jnp.ndarray, mol: MolArrays) -> jnp.ndarray:
    """vdW clearance of each probe point: ``min_i(||x_i - p|| - vdw_i)``.

    points: (..., P, 3) broadcast against mol batch dims -> (..., P).
    Padded atoms cannot win the min (masked to +BIG).
    """
    d = pairwise_distances(points, mol.coords) - mol.vdw[..., None, :]
    return jnp.min(jnp.where(mol.mask[..., None, :], d, BIG), axis=-1)


def clearance_diff(
    x: jnp.ndarray, disp: jnp.ndarray, mol: MolArrays
) -> jnp.ndarray:
    """Cancellation-free clearance differences around a base point.

    For each displacement ``s_k`` returns
    ``clearance(x + s_k) - clearance(x)`` with the displacement treated
    *symbolically*: the per-atom distance change is computed as
    ``(|p-a|^2 - |x-a|^2) / (|p-a| + |x-a|) = s.((x-a)+(p-a)) / (d_p + d_x)``
    — no large-magnitude subtraction ever happens, so the result stays
    accurate (relative ~eps_f32 of the difference itself) even for
    ``|s| ~ 1e-8``, where a plain f32 ``f(x+s) - f(x)`` is pure
    cancellation noise.  This is what lets the float32 pipeline drive
    scipy-f64-style finite differences (ops/lbfgsb.py stable mode)
    without emulated float64.

    The difference of clearance minima is reduced as
    ``min_i((c_i - m0) + delta_i)`` with ``m0 = min_i c_i``: the
    ``c_i - m0`` operands are nearby f32 values (exact by Sterbenz for
    every atom that can win), and adding the small ``delta_i`` keeps
    full relative precision instead of being absorbed into a ~f-sized
    magnitude.

    x: (..., 3); disp: (..., K, 3) -> (..., K).

    Implementation note (HBM): the (K, N) work is written in unrolled
    per-coordinate broadcast form with ``num = 2 * disp.dxv + |disp|^2``
    and ``|p-a|^2 = |x-a|^2 + num`` (exact algebra), so no
    ``(..., K, N, 3)`` tensor and no mid-chain coordinate reductions
    exist — XLA fuses the whole (K, N) DAG into the final min-reduction
    and streams it.  The earlier stacked form materialised two
    ``(B, W, K, N)`` HLO temps (26 GB at the production batch size,
    the HBM ceiling of the brute-grid refinement stage).
    """
    dxv = x[..., None, :] - mol.coords  # (..., N, 3)
    db2 = jnp.sum(dxv * dxv, axis=-1)  # (..., N)
    db = jnp.sqrt(db2)
    cb = jnp.where(mol.mask, db - mol.vdw, BIG)
    m0 = jnp.min(cb, axis=-1)
    base = cb - m0[..., None]  # (..., N)

    s2 = jnp.sum(disp * disp, axis=-1)  # (..., K)
    g = None
    for k in range(3):
        t = disp[..., :, k, None] * dxv[..., None, :, k]
        g = t if g is None else g + t  # (..., K, N)
    num = 2.0 * g + s2[..., :, None]
    # |p-a|^2 = db2 + num >= 0 exactly; clamp f32 rounding dips
    dp = jnp.sqrt(jnp.maximum(db2[..., None, :] + num, 0.0))
    den = db[..., None, :] + dp
    delta = num / jnp.where(den == 0.0, 1.0, den)
    q = jnp.where(
        mol.mask[..., None, :], base[..., None, :] + delta, BIG
    )
    return jnp.min(q, axis=-1)


def pore_stable_probe(mol: MolArrays):
    """Symbolic-difference evaluator of the pore objective ``-2*clearance``.

    Returns ``probe(x, disp, h) -> (delta_f, grad)`` for
    :func:`pywindow_tpu.ops.lbfgsb.lbfgsb_minimize_stable`:
    ``delta_f = f(x+disp) - f(x)`` via :func:`clearance_diff`
    (cancellation-free for any ``|disp|``), and the 2-point FD gradient
    at ``x + disp`` whose numerators are symbolic ``h``-displacements —
    scipy's ``h = 1e-8`` step works in float32 because the difference
    never passes through absolute f values (reference behaviour:
    utilities.py:400-426 with scipy float64 FD).
    """

    def probe(x, disp, h):
        delta = clearance_diff(x, disp[None, :], mol)[0]
        p = x + disp
        dprobe = clearance_diff(p, jnp.diag(h), mol)
        return -2.0 * delta, -2.0 * (dprobe / h)

    return probe


def clearance_and_argmin(
    points: jnp.ndarray, mol: MolArrays
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clearance plus the index of the limiting atom (for reporting)."""
    d = pairwise_distances(points, mol.coords) - mol.vdw[..., None, :]
    d = jnp.where(mol.mask[..., None, :], d, BIG)
    return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1)


def max_dim(mol: MolArrays) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Maximum vdW-corrected diameter and the two atoms realising it.

    Upper-triangle (diagonal included) argmax of
    ``dist(i,j) + vdw_i + vdw_j``, row-major on ties — matching
    ``np.triu`` + ``argmax`` in the reference (utilities.py:355-372).
    """
    d = pairwise_distances(mol.coords, mol.coords)
    d = d + mol.vdw[..., :, None] + mol.vdw[..., None, :]
    n = mol.coords.shape[-2]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    cols = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = (
        (rows <= cols)
        & mol.mask[..., :, None]
        & mol.mask[..., None, :]
    )
    d = jnp.where(valid, d, -BIG)
    flat = d.reshape(*d.shape[:-2], n * n)
    idx = jnp.argmax(flat, axis=-1)
    return idx // n, idx % n, jnp.take_along_axis(
        flat, idx[..., None], axis=-1
    )[..., 0]


def max_dim_value(mol: MolArrays) -> jnp.ndarray:
    """Maximum vdW-corrected diameter, value only.

    Exactly the maximum :func:`max_dim` returns (max is an exact
    selection, so dropping the argmax machinery and the upper-triangle
    restriction of the symmetric matrix is value-neutral), but with a
    single reduce-max consumer XLA streams the pairwise field instead
    of materialising (N, N) temps for a separate argmax pass — the
    argmax form cost ~10% of the batched pipeline's device time at its
    two value-only call sites (window sphere radius, average-diameter
    sampling radius).
    """
    d = pairwise_distances(mol.coords, mol.coords)
    d = d + mol.vdw[..., :, None] + mol.vdw[..., None, :]
    valid = mol.mask[..., :, None] & mol.mask[..., None, :]
    return jnp.max(jnp.where(valid, d, -BIG), axis=(-2, -1))


def pore_diameter(
    mol: MolArrays, com: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intrinsic pore diameter ``2 * clearance(com)`` and limiting atom.

    reference: utilities.py:375-388.
    """
    if com is None:
        com = center_of_mass(mol)
    c, idx = clearance_and_argmin(com[..., None, :], mol)
    return 2.0 * c[..., 0], idx[..., 0]


def sphere_volume(radius: jnp.ndarray) -> jnp.ndarray:
    """4/3 pi r^3 (reference: utilities.py:429-431)."""
    return 4.0 / 3.0 * jnp.pi * radius**3


# ---------------------------------------------------------------------------
# shape descriptors (reference: utilities.py:434-650)
# ---------------------------------------------------------------------------


def gyration_tensor(mol: MolArrays) -> jnp.ndarray:
    """COM-corrected gyration tensor / N (reference: utilities.py:461-495)."""
    com = center_of_mass(mol)
    x = jnp.where(mol.mask[..., None], mol.coords - com[..., None, :], 0.0)
    n = jnp.sum(mol.mask, axis=-1).astype(x.dtype)
    t = jnp.einsum(
        "...ni,...nj->...ij", x, x, precision=jax.lax.Precision.HIGHEST
    )
    return t / n[..., None, None]


def inertia_tensor(mol: MolArrays) -> jnp.ndarray:
    """Mass-weighted inertia tensor / N.

    Two reference quirks reproduced: dividing by atom count (not total
    mass) and no centre-of-mass correction (utilities.py:498-529).  One
    reference quirk deliberately NOT reproduced: its (N,1)x(N,)
    broadcasting bug sums every mass against every coordinate
    (producing sum(m) * sum(u) instead of sum(m*u)), which scrambles
    the eigenstructure for heteronuclear molecules; this kernel
    computes the physically correct contraction.
    """
    x = jnp.where(mol.mask[..., None], mol.coords, 0.0)
    m = jnp.where(mol.mask, mol.mass, 0.0)
    r2 = jnp.sum(x * x, axis=-1)
    eye = jnp.eye(3, dtype=x.dtype)
    t = jnp.einsum("...n,...ij->...ij", m * r2, eye) - jnp.einsum(
        "...n,...ni,...nj->...ij",
        m,
        x,
        x,
        precision=jax.lax.Precision.HIGHEST,
    )
    n = jnp.sum(mol.mask, axis=-1).astype(x.dtype)
    return t / n[..., None, None]


def sorted_eigenvalues(tensor: jnp.ndarray) -> jnp.ndarray:
    """Descending eigenvalues of a symmetric 3x3 tensor."""
    vals = jnp.linalg.eigvalsh(tensor)
    return vals[..., ::-1]


def asphericity(eigvals_desc: jnp.ndarray) -> jnp.ndarray:
    """Asphericity b from descending inertia eigenvalues
    (reference: utilities.py:626)."""
    return eigvals_desc[..., 0] - 0.5 * (
        eigvals_desc[..., 1] + eigvals_desc[..., 2]
    )


def acylindricity(eigvals_desc: jnp.ndarray) -> jnp.ndarray:
    """Acylindricity c from descending inertia eigenvalues
    (reference: utilities.py:633)."""
    return eigvals_desc[..., 1] - eigvals_desc[..., 2]


def relative_shape_anisotropy(eigvals_desc: jnp.ndarray) -> jnp.ndarray:
    """Relative shape anisotropy kappa^2 in [0, 1]
    (reference: utilities.py:640)."""
    s = jnp.sum(eigvals_desc, axis=-1)
    pair = (
        eigvals_desc[..., 0] * eigvals_desc[..., 1]
        + eigvals_desc[..., 0] * eigvals_desc[..., 2]
        + eigvals_desc[..., 1] * eigvals_desc[..., 2]
    )
    return 1.0 - 3.0 * pair / (s * s)
