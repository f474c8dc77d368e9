"""Freedom (degrees-of-freedom) analysis.

Mirrors ``ezpz/src/solver/find_dof.rs``: compute an orthonormal basis of the
Jacobian's nullspace at the solved point, then classify variables by their
"participation" (squared row norm in that basis). Row norms of an orthonormal
nullspace basis are basis-independent (they are the diagonal of the projector
onto the nullspace), so an SVD-based nullspace gives the same participation
values as the reference's column-pivoted-QR back-substitution.

Two paths:

* ``freedom_analysis`` — host numpy, one system: the reference documents
  this as an expensive structure-change-only analysis (``lib.rs:89-92``),
  not part of the hot path.
* ``participation_device`` / ``freedom_analysis_batch`` — device-side and
  vmappable: a fleet of B sketches computes ALL participations in one
  batched SVD on device and one device->host transfer, instead of B
  sequential host SVDs + B Jacobian transfers. Branch-free rank handling:
  nullspace rows are selected by masking singular values against the same
  1e-8 relative threshold, so the participation values are bit-identical
  in exact arithmetic to the host path's ``vt[rank:]`` slice.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .outcomes import FreedomAnalysis
from .utils.errors import EmptySystemNotAllowed

TOLERANCE_BASE = 1e-8  # find_dof.rs:12


def freedom_analysis(jacobian: np.ndarray) -> FreedomAnalysis:
    """``jacobian``: dense (m, n) weighted Jacobian at the final values.

    A single row constraining only the first of three variables leaves the
    other two underconstrained:

    >>> freedom_analysis([[1.0, 0.0, 0.0]]).underconstrained()
    [1, 2]
    >>> freedom_analysis(np.eye(3)).is_underconstrained()
    False
    """
    j = np.asarray(jacobian, dtype=np.float64)
    m, nvars = j.shape
    if min(m, nvars) == 0:
        raise EmptySystemNotAllowed()

    # Rank-revealing decomposition. The reference thresholds |diag(R)| of a
    # column-pivoted QR at 1e-8 * max (find_dof.rs:40-47); singular values
    # play the same role with the same relative tolerance.
    _u, s, vt = np.linalg.svd(j, full_matrices=True)
    largest = float(s[0]) if s.size else 0.0
    tol = TOLERANCE_BASE * largest
    rank = int(np.sum(s > tol))
    nullity = nvars - rank
    if nullity == 0:
        return FreedomAnalysis([])

    nullspace = vt[rank:, :].T  # (nvars, nullity), orthonormal columns

    # Participation per variable (find_dof.rs:81-104): squared row norm,
    # classified against (1e-3 * max participation)^2.
    participation = np.sum(nullspace * nullspace, axis=1)
    max_participation = float(participation.max()) if participation.size else 0.0
    var_tol = 1e-3 * max_participation
    squared_tol = var_tol * var_tol
    under: List[int] = [int(i) for i in range(nvars) if participation[i] > squared_tol]
    return FreedomAnalysis(under)


def participation_device(j):
    """Device-side participation of one dense (m, n) Jacobian. Returns
    ``(participation (n,), nullity scalar i32)`` — jit/vmap-compatible.

    Same math as ``freedom_analysis`` without data-dependent shapes: with
    ``full_matrices=True`` the rows of ``vt`` beyond ``len(s)`` span the
    trailing nullspace (implicit zero singular values), so padding ``s``
    with zeros to n and masking ``s <= 1e-8 * s_max`` selects exactly the
    rows the host path slices with ``vt[rank:]``.
    """
    import jax.numpy as jnp

    m, n = j.shape
    _u, s, vt = jnp.linalg.svd(j, full_matrices=True)
    s_pad = jnp.concatenate(
        [s, jnp.zeros((n - s.shape[0],), s.dtype)]
    ) if s.shape[0] < n else s[:n]
    tol = TOLERANCE_BASE * s_pad[0]
    mask = s_pad <= tol  # (n,) — True rows of vt form the nullspace basis
    participation = jnp.sum(
        (vt * vt) * mask[:, None].astype(vt.dtype), axis=0
    )
    return participation, jnp.sum(mask).astype(jnp.int32)


def underconstrained_from_participation(participation: np.ndarray) -> FreedomAnalysis:
    """Host classification step shared by both paths (find_dof.rs:81-104)."""
    participation = np.asarray(participation)
    max_participation = float(participation.max()) if participation.size else 0.0
    var_tol = 1e-3 * max_participation
    squared_tol = var_tol * var_tol
    return FreedomAnalysis(
        [int(i) for i in np.nonzero(participation > squared_tol)[0]]
    )


def freedom_analysis_batch(j_batch) -> List[FreedomAnalysis]:
    """Batched analysis of (B, m, n) dense Jacobians: one vmapped device
    SVD, one transfer, B host classifications. Loop-equivalent to calling
    ``freedom_analysis`` per item."""
    import jax
    import jax.numpy as jnp

    j_batch = jnp.asarray(j_batch)
    if j_batch.ndim != 3 or min(j_batch.shape[1:]) == 0:
        raise EmptySystemNotAllowed()
    parts, _null = jax.jit(jax.vmap(participation_device))(j_batch)
    parts = np.asarray(parts)
    return [underconstrained_from_participation(parts[i])
            for i in range(parts.shape[0])]
