"""Host-side <-> device-side molecule encoding.

The reference carries molecules as ``{"elements": str array,
"coordinates": (N, 3) float array, ...}`` dicts and looks radii up from
dicts inside every hot loop (reference: utilities.py:355-388, :1395).
Here the string work happens once at the boundary: elements become integer
ids, per-atom mass/vdW/covalent vectors are gathered from constant tables,
and the result is padded to a static shape with an explicit validity mask
so that every downstream kernel is jit/vmap/shard_map friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from pywindow_tpu import tables
from pywindow_tpu.config import default_dtype, pad_multiple


class MolArrays(NamedTuple):
    """Padded, masked device representation of one (or a batch of) molecules.

    All arrays share leading batch dims; the trailing atom axis is padded
    to a static size.  Padded slots have ``mask == False``, zero mass and
    vdW/covalent radius, and coordinates parked far away (1e6) so they can
    never win a distance ``min``; max-style reductions must still apply
    ``mask`` explicitly.
    """

    coords: jnp.ndarray  # (..., N, 3)
    mass: jnp.ndarray  # (..., N)
    vdw: jnp.ndarray  # (..., N)
    cov: jnp.ndarray  # (..., N)
    mask: jnp.ndarray  # (..., N) bool

    @property
    def n_atoms(self) -> jnp.ndarray:
        """Real (unpadded) atom count per molecule."""
        return jnp.sum(self.mask, axis=-1)


#: coordinate sentinel for padded atom slots.
FAR_AWAY = 1.0e6


def round_up(n: int, multiple: int) -> int:
    """Smallest multiple of *multiple* that is >= *n* (pad sizing)."""
    return ((n + multiple - 1) // multiple) * multiple


def _encode_host(
    elements: np.ndarray,
    coordinates: np.ndarray,
    n_pad: int,
    dtype: np.dtype,
) -> tuple[np.ndarray, ...]:
    """One molecule's padded field arrays, all host-side numpy."""
    ids = tables.element_ids(elements)
    n = len(ids)
    if n_pad < n:
        msg = f"pad_to={n_pad} smaller than atom count {n}"
        raise ValueError(msg)
    coords = np.full((n_pad, 3), FAR_AWAY, dtype=dtype)
    coords[:n] = np.asarray(coordinates, dtype=dtype)
    mass = np.zeros(n_pad, dtype=dtype)
    vdw = np.zeros(n_pad, dtype=dtype)
    cov = np.zeros(n_pad, dtype=dtype)
    mass[:n] = tables.ELEMENT_MASS[ids]
    vdw[:n] = tables.ELEMENT_VDW[ids]
    cov[:n] = tables.ELEMENT_COV[ids]
    mask = np.zeros(n_pad, dtype=bool)
    mask[:n] = True
    return coords, mass, vdw, cov, mask


def encode(
    elements: np.ndarray,
    coordinates: np.ndarray,
    pad_to: int | None = None,
    dtype: np.dtype | None = None,
) -> MolArrays:
    """Encode one molecule's host data into padded device arrays."""
    dtype = dtype or default_dtype()
    n = len(elements)
    n_pad = (
        pad_to if pad_to is not None else round_up(max(n, 1), pad_multiple())
    )
    fields = _encode_host(elements, coordinates, n_pad, dtype)
    return MolArrays(*(jnp.asarray(f) for f in fields))


def encode_batch(
    systems: list[tuple[np.ndarray, np.ndarray]],
    pad_to: int | None = None,
    dtype: np.dtype | None = None,
) -> MolArrays:
    """Encode a list of (elements, coordinates) into one stacked batch.

    The whole batch is assembled host-side and shipped as ONE transfer
    per field — per-molecule device puts are latency-bound (painfully so
    over a tunneled TPU).
    """
    dtype = dtype or default_dtype()
    n_max = max(len(e) for e, _ in systems)
    n_pad = pad_to if pad_to is not None else round_up(n_max, pad_multiple())
    per_mol = [
        _encode_host(e, c, n_pad, dtype) for e, c in systems
    ]
    stacked = (np.stack(field) for field in zip(*per_mol))
    return MolArrays(*(jnp.asarray(f) for f in stacked))
