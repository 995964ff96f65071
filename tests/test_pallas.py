"""Pallas clearance kernel: numerics vs the XLA-fused path.

On CPU this runs in interpreter mode; on the real TPU the kernel was
measured bitwise-identical and ~2x faster than the fused broadcast at
(Q=65536, N=4096) — see ops/pallas_kernels.py.
"""

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
