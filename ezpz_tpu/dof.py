"""Freedom (degrees-of-freedom) analysis.

Mirrors ``ezpz/src/solver/find_dof.rs``: compute an orthonormal basis of the
Jacobian's nullspace at the solved point, then classify variables by their
"participation" (squared row norm in that basis). Row norms of an orthonormal
nullspace basis are basis-independent (they are the diagonal of the projector
onto the nullspace), so an SVD-based nullspace gives the same participation
values as the reference's column-pivoted-QR back-substitution.

Runs on host in numpy: the reference documents this as an expensive
structure-change-only analysis (``lib.rs:89-92``), not part of the hot path.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .outcomes import FreedomAnalysis
from .utils.errors import EmptySystemNotAllowed

TOLERANCE_BASE = 1e-8  # find_dof.rs:12


def freedom_analysis(jacobian: np.ndarray) -> FreedomAnalysis:
    """``jacobian``: dense (m, n) weighted Jacobian at the final values."""
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
