"""Static configuration for the analysis kernels.

The reference scatters tuning knobs across function kwargs
(reference: src/pywindow/_internal/utilities.py — ``adjust``, ``increment``,
``tol``, ``lb_z``, ``z_second_mini`` …).  Here they are centralised in one
frozen dataclass whose fields are *static* under ``jax.jit``: a config value
change retraces, which is exactly the semantics these parameters need.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np


def default_dtype() -> np.dtype:
    """Pick the compute dtype for geometry kernels.

    float64 when running on CPU with x64 enabled (golden-value parity and
    cross-checks against the reference), float32 otherwise (TPU-native
    mode — validated to <0.01 Å against the same goldens).  On a TPU
    backend the default stays float32 even with x64 enabled: there,
    enabling x64 exists to unlock the float64 *pore-optimiser stage*
    (see :func:`pore_opt_dtype`), not to run the pipeline in emulated
    f64.  ``PYWINDOW_TPU_FORCE_F32=1`` forces f32 anywhere (CPU
    simulation of the TPU mixed mode).
    """
    if os.environ.get("PYWINDOW_TPU_FORCE_F32"):
        return np.dtype(np.float32)
    if not jax.config.read("jax_enable_x64"):
        return np.dtype(np.float32)
    try:
        platform = jax.default_backend()
    except RuntimeError:  # pragma: no cover - no backend at all
        platform = "cpu"
    if platform == "tpu":
        return np.dtype(np.float32)
    return np.dtype(np.float64)


def pore_opt_mode(dtype) -> str:
    """How the pore-centre optimisation stage runs.

    The optimised pore centre seeds the whole window pipeline (ray
    origins, cluster membership, widest-ray choice); on plateau systems
    (NUXHIZ-class) a naive float32 L-BFGS-B stops ~0.13 Å from the
    float64 stopping point and every window inherits the shift
    (~0.22 Å on NUXHIZ).  Modes:

    - ``"stable"`` (float32 default): the symbolic-difference driver
      (:func:`pywindow_tpu.ops.lbfgsb.lbfgsb_minimize_stable`) — all
      optimiser decisions consume cancellation-free clearance
      differences, reproducing the float64 stopping behaviour at
      float32 speed (measured NUXHIZ centre offset 3.3e-4 Å vs the f64
      point; naive f32: 0.155 Å).  No x64 required.
    - ``"promote"``: legacy mixed mode — cast the stage to float64
      (requires x64; *emulated* double-word arithmetic on TPU, a
      measured 29% pipeline cost at B=1440).
    - ``"classic"`` (float64 default): the plain driver in the pipeline
      dtype — the scipy-parity golden path.

    ``PYWINDOW_TPU_PORE_OPT`` overrides the choice.
    """
    env = os.environ.get("PYWINDOW_TPU_PORE_OPT")
    if env:
        if env not in ("classic", "stable", "promote"):
            msg = f"PYWINDOW_TPU_PORE_OPT={env!r}: expected classic|stable|promote"
            raise ValueError(msg)
        return env
    if np.dtype(dtype) == np.float32:
        return "stable"
    return "classic"


def window_opt_mode(dtype) -> str:
    """How the per-window refinement optimisers (z L-BFGS-B, xy
    brute + Nelder–Mead) consume the clearance objective.

    - ``"stable"`` (float32 default): all optimiser *decisions* run on
      cancellation-free clearance differences — the z stage through the
      symbolic-difference L-BFGS-B driver (scipy's ``h = 1e-8`` FD step
      works verbatim in f32), the xy stage by evaluating every grid /
      simplex candidate as ``f(p) - f(anchor)`` via
      :func:`pywindow_tpu.ops.geometry.clearance_diff` (Nelder–Mead is
      translation-invariant in ``f``, so the update path is identical
      to an exact-arithmetic run on the same landscape).  This is what
      keeps plateau systems (NUXHIZ-class) from landing one kink over:
      plain f32 FD gradients at ``|f| ~ 8`` carry ~1e-6 cancellation
      noise and push the z/xy stop to a neighbouring ridge point.
    - ``"classic"`` (float64 default): plain drivers in the pipeline
      dtype — the scipy-parity golden path.

    ``PYWINDOW_TPU_WINDOW_OPT`` overrides the choice.
    """
    env = os.environ.get("PYWINDOW_TPU_WINDOW_OPT")
    if env:
        if env not in ("classic", "stable"):
            msg = (
                f"PYWINDOW_TPU_WINDOW_OPT={env!r}: expected classic|stable"
            )
            raise ValueError(msg)
        return env
    if np.dtype(dtype) == np.float32:
        return "stable"
    return "classic"


def pore_opt_dtype(dtype) -> np.dtype:
    """Dtype for the pore-centre stage under ``pore_opt_mode() == "promote"``:
    float64 whenever representable (x64 enabled), else the pipeline dtype."""
    if np.dtype(dtype) == np.float32 and jax.config.read("jax_enable_x64"):
        return np.dtype(np.float64)
    return np.dtype(dtype)


def pad_multiple() -> int:
    """Atom-axis padding granularity.

    8 everywhere: every Pallas kernel keeps atoms on the *sublane* axis
    (granularity 8), so padding the encoding to 128 only added dead
    atom rows the kernels then streamed through the VPU — on CC3
    (168 atoms) a measured ~34% of the clearance work (168 -> 256).
    XLA-land ops are indifferent (they tile the atom axis internally
    either way).  ``PYWINDOW_TPU_PAD`` overrides (e.g. 128 to restore
    the historical lane-aligned encoding for A/B timing).
    """
    override = os.environ.get("PYWINDOW_TPU_PAD")
    if override:
        return int(override)
    return 8


@dataclasses.dataclass(frozen=True)
class AnalysisConfig:
    """Static parameters of the pore/window analysis.

    Mirrors the reference defaults (utilities.py:1364-1377, :391-426,
    :1191-1199, :820-824) so that default runs reproduce the golden values.
    """

    #: sampling-density multiplier for the golden-spiral sphere
    #: (utilities.py:1409).
    adjust: float = 1.0
    #: coarse ray-path step in Angstrom (utilities.py:1104).
    increment: float = 1.0
    #: fine ray-path step for window refinement (utilities.py:1196).
    increment2: float = 0.1
    #: shift the sampling origin to the optimised pore centre first
    #: (utilities.py:1381-1390).
    pore_opt: bool = True
    #: covalent-bond distance tolerance in Angstrom (utilities.py:823).
    bond_tol: float = 0.4
    #: window z-optimisation lower bound tied to the ray narrow point
    #: (utilities.py:1296-1297).
    lb_z: bool = True
    #: optional second z minimisation pass (off by default,
    #: utilities.py:1327-1334).
    z_second_mini: bool = False
    #: DBSCAN min_samples (sklearn default used by utilities.py:1478).
    dbscan_min_samples: int = 5
    #: brute-grid resolution per xy axis (scipy.optimize.brute default Ns,
    #: utilities.py:1312).
    brute_ns: int = 20
    #: number of window slots tracked per molecule (padded, masked).
    #: Refinement cost scales with the slot count, so the default stays
    #: small; the host entry points escalate automatically (cap doubled,
    #: re-run) whenever a molecule saturates it, up to
    #: :data:`MAX_WINDOWS_CEILING` — the reference has no cap at all.
    max_windows: int = 8
    #: open-ray compaction cap as a fraction of the sampling-point count.
    #: The coarse path sweep and the DBSCAN clustering only ever consume
    #: rays the analytic pre-analysis left open (typically 0-60% of the
    #: spiral; see find_windows), so those stages run on a compacted
    #: (order-preserving) slot array of ``round_up(frac * P, 128)`` rays
    #: — the two dominant device costs shrink by 2-4x.  Molecules whose
    #: open-ray count exceeds the cap are flagged and transparently
    #: re-run with a doubled fraction by the host entry points (same
    #: escalation pattern as ``max_windows``).  ``>= 1.0`` disables
    #: compaction (full-spiral path).
    open_cap_frac: float = 0.4
    #: iteration budget for the on-device bounded quasi-Newton optimiser.
    opt_maxiter: int = 120
    #: iteration budget for the Nelder–Mead polish stages.
    nm_maxiter: int = 400
    #: run the fused pipeline with reduced optimiser budgets (below) and
    #: escalate outliers.  The vmapped while_loops pay the SLOWEST lane
    #: of the whole batch: one frame needing 60 L-BFGS-B iterations
    #: stalls thousands that need 14 (measured median on CC3 MD
    #: frames).  With fast budgets, frames whose optimisers hit the cap
    #: set a packed flag and are transparently re-run at the full
    #: budgets by the host escalation (same pattern as max_windows /
    #: open_cap_frac), so final results are identical to a full-budget
    #: run — the cap only bounds the wasted lockstep iterations.
    fast_budgets: bool = True
    #: capped quasi-Newton budget under ``fast_budgets``.
    fast_opt_maxiter: int = 40
    #: capped Nelder–Mead budget under ``fast_budgets``.
    fast_nm_maxiter: int = 120

    def __post_init__(self) -> None:
        if self.adjust <= 0 or self.increment <= 0 or self.increment2 <= 0:
            msg = "adjust/increment/increment2 must be positive"
            raise ValueError(msg)
        if self.open_cap_frac <= 0:
            msg = "open_cap_frac must be positive (>= 1.0 disables)"
            raise ValueError(msg)


def effective_budgets(cfg: AnalysisConfig) -> tuple[int, int]:
    """(quasi-Newton, Nelder–Mead) iteration budgets the fused pipeline
    actually runs with — the fast caps under ``cfg.fast_budgets``, the
    full budgets otherwise (escalation re-runs)."""
    if cfg.fast_budgets:
        return (
            min(cfg.opt_maxiter, cfg.fast_opt_maxiter),
            min(cfg.nm_maxiter, cfg.fast_nm_maxiter),
        )
    return cfg.opt_maxiter, cfg.nm_maxiter


DEFAULT_CONFIG = AnalysisConfig()

#: escalation bound for the automatic max_windows doubling; a molecule
#: with more windows than this logs the saturation warning instead.
MAX_WINDOWS_CEILING = 64
