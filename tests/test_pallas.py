"""Pallas clearance kernel: numerics vs the XLA-fused path.

On CPU this runs in interpreter mode; on the real TPU the kernel was
measured bitwise-identical and ~2x faster than the fused broadcast at
(Q=65536, N=4096) — see ops/pallas_kernels.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pywindow_tpu.ops import encoding, geometry
from pywindow_tpu.ops.pallas_kernels import clearance_min_pallas


@pytest.mark.parametrize(("q", "n"), [(100, 50), (1024, 256), (513, 129)])
def test_pallas_matches_xla(q, n):
    rng = np.random.default_rng(q + n)
    probes = rng.normal(size=(q, 3)) * 10
    coords = rng.normal(size=(n, 3)) * 12
    vdw = rng.uniform(1.0, 2.0, n)
    mol = encoding.MolArrays(
        coords=coords,
        mass=vdw,
        vdw=vdw,
        cov=vdw,
        mask=np.ones(n, bool),
    )
    ref = np.asarray(geometry.clearance_field(probes, mol))
    got = np.asarray(
        clearance_min_pallas(probes, coords, vdw, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_pallas_respects_padding_convention():
    """Padded atoms (far coords, zero vdw) never win the min."""
    rng = np.random.default_rng(3)
    coords = np.concatenate(
        [rng.normal(size=(40, 3)) * 5, np.full((24, 3), 1.0e6)]
    )
    vdw = np.concatenate([rng.uniform(1, 2, 40), np.zeros(24)])
    probes = rng.normal(size=(64, 3)) * 5
    mol = encoding.MolArrays(
        coords=coords[:40],
        mass=vdw[:40],
        vdw=vdw[:40],
        cov=vdw[:40],
        mask=np.ones(40, bool),
    )
    ref = np.asarray(geometry.clearance_field(probes, mol))
    got = np.asarray(
        clearance_min_pallas(probes, coords, vdw, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-10)


def _random_mol(n, seed, pad_to=None):
    rng = np.random.default_rng(seed)
    coords = rng.normal(size=(n, 3)) * 8
    vdw = rng.uniform(1.2, 2.0, n)
    mol = encoding.MolArrays(
        coords=coords, mass=vdw, vdw=vdw, cov=vdw, mask=np.ones(n, bool)
    )
    if pad_to:
        pad = pad_to - n
        mol = encoding.MolArrays(
            coords=np.concatenate(
                [coords, np.full((pad, 3), encoding.FAR_AWAY)]
            ),
            mass=np.concatenate([vdw, np.zeros(pad)]),
            vdw=np.concatenate([vdw, np.zeros(pad)]),
            cov=np.concatenate([vdw, np.zeros(pad)]),
            mask=np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]),
        )
    return mol


@pytest.mark.parametrize(
    ("p", "n", "l"), [(64, 40, 12), (797, 168, 16), (16, 424, 144)]
)
def test_path_sweep_pallas_matches_jnp(p, n, l):
    """Fused path sweep == jnp path_analysis (ok bitwise, width ~f32)."""
    from pywindow_tpu.ops import rays

    mol = _random_mol(n, seed=p + n, pad_to=((n + 63) // 64) * 64)
    pts = np.asarray(
        rays.golden_spiral(p, 9.5, dtype=mol.coords.dtype)
    )
    ref = rays.path_analysis(pts, mol, 1.0, l, use_pallas=False)
    got = rays.path_analysis(pts, mol, 1.0, l, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ref.ok), np.asarray(got.ok))
    np.testing.assert_allclose(
        np.asarray(got.width), np.asarray(ref.width), atol=2e-5
    )
    # identical argmin step -> identical narrow-point geometry
    np.testing.assert_array_equal(
        np.asarray(ref.dist), np.asarray(got.dist)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.narrow), np.asarray(got.narrow)
    )


def test_ray_exit_pallas_matches_jnp():
    """Fused intersection reduction == jnp pre/reversed analysis."""
    from pywindow_tpu.ops import rays

    mol = _random_mol(120, seed=7, pad_to=128)
    pts = np.asarray(rays.golden_spiral(300, 14.0, dtype=np.float64))
    open_ref = np.asarray(rays.preanalysis_open(pts, mol, use_pallas=False))
    open_got = np.asarray(rays.preanalysis_open(pts, mol, use_pallas=True))
    np.testing.assert_array_equal(open_ref, open_got)

    has_ref, d_ref = rays.reversed_exit_distance(pts, mol, use_pallas=False)
    has_got, d_got = rays.reversed_exit_distance(pts, mol, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(has_ref), np.asarray(has_got))
    d_ref, d_got = np.asarray(d_ref), np.asarray(d_got)
    np.testing.assert_allclose(
        d_got[np.asarray(has_ref)], d_ref[np.asarray(has_ref)], atol=1e-6
    )


def test_path_sweep_pallas_under_vmap():
    """The routed sweep composes with vmap over a molecule batch."""
    import jax

    from pywindow_tpu.ops import rays

    mols = [_random_mol(50, seed=s, pad_to=64) for s in range(3)]
    batch = encoding.MolArrays(
        *(np.stack([np.asarray(getattr(m, f)) for m in mols])
          for f in encoding.MolArrays._fields)
    )
    pts = np.asarray(rays.golden_spiral(128, 9.0, dtype=np.float64))
    f_ref = jax.jit(
        jax.vmap(lambda m: rays.path_analysis(pts, m, 1.0, 12, use_pallas=False))
    )
    f_got = jax.jit(
        jax.vmap(lambda m: rays.path_analysis(pts, m, 1.0, 12, use_pallas=True))
    )
    ref, got = f_ref(batch), f_got(batch)
    np.testing.assert_array_equal(np.asarray(ref.ok), np.asarray(got.ok))
    np.testing.assert_allclose(
        np.asarray(got.width), np.asarray(ref.width), atol=2e-5
    )


def test_fine_path_frames_on_lanes_matches_scan(monkeypatch):
    """The frames-on-lanes W-slot kernel (interpret mode) matches the
    step-chunked scan: ok/argmin-step exactly, min clearance to 1 ulp
    (FMA contraction order, same class as the other routed kernels —
    the TPU golden gate arbitrates behaviour)."""
    import pywindow_tpu.ops.pallas_kernels as pk

    rng = np.random.RandomState(3)
    b, w, n, L = 16, 8, 40, 24
    vectors = jnp.asarray(rng.randn(b, w, 3) * 5.0)
    chunksf = jnp.asarray(
        np.maximum(
            np.floor(
                np.linalg.norm(np.asarray(vectors), axis=-1) / 0.5
            ),
            1.0,
        )
    )
    coords = jnp.asarray(rng.randn(b, n, 3) * 6.0)
    vdw = jnp.asarray(1.0 + rng.rand(b, n))

    ref = pk._fine_scan_flat(vectors, chunksf, coords, vdw, L)
    monkeypatch.setattr(pk, "_FINE_BATCH_MIN", 8)
    got = pk._fine_path_flat(vectors, chunksf, coords, vdw, L)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_allclose(
        np.asarray(ref[2]), np.asarray(got[2]), rtol=0, atol=1e-12
    )


def test_fine_path_sweep_vmap_collapse(monkeypatch):
    """fine_path_sweep under a molecule vmap equals per-molecule scan
    results (the custom_vmap rule collapses to one flat dispatch)."""
    import pywindow_tpu.ops.pallas_kernels as pk

    rng = np.random.RandomState(7)
    b, w, n, L = 12, 8, 30, 16
    vectors = jnp.asarray(rng.randn(b, w, 3) * 4.0)
    chunksf = jnp.asarray(
        np.maximum(
            np.floor(
                np.linalg.norm(np.asarray(vectors), axis=-1) / 0.5
            ),
            1.0,
        )
    )
    coords = jnp.asarray(rng.randn(b, n, 3) * 5.0)
    vdw = jnp.asarray(1.0 + rng.rand(b, n))

    monkeypatch.setattr(pk, "_FINE_BATCH_MIN", 4)
    got = jax.vmap(
        lambda v, c, x, r: pk.fine_path_sweep(v, c, x, r, L)
    )(vectors, chunksf, coords, vdw)
    ref = pk._fine_scan_flat(vectors, chunksf, coords, vdw, L)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_allclose(
        np.asarray(ref[2]), np.asarray(got[2]), rtol=0, atol=1e-12
    )
