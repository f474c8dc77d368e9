"""Banded SPD Cholesky factor/solve via ``lax.scan``.

Chain-like coupled systems produce a boundary Schur complement whose
graph is (block-)tridiagonal: part p's boundary variables couple only to
parts p-1 / p+1, so under the natural boundary ordering the matrix has
half-bandwidth ``bw`` = a few interface widths. The reference serves
these systems through its general sparse LLT (`newton.rs:87-102`), whose
fill-in on a banded matrix IS the band — this module is the TPU-shaped
equivalent: a fixed-band factorization with static shapes.

Cost: O(n * bw^2) flops and 3n sequential scan steps (factor + two
substitutions) instead of the dense O(n^3) Cholesky or ~sqrt(cond(S))
preconditioned-CG matvecs. Each scan step is a (bw,)- or (bw, bw)-shaped
vector op, so a ``vmap`` over a solve batch turns the steps into
(B, bw)-wide VPU work — sequential in n but fully vectorized across the
batch, which is exactly the coupled-fleet regime (`parallel/block_schur`).

Storage: LOWER band, ``Ab[i, d] = A[i, i - bw + d]`` for
``d in [0, bw]`` (so ``Ab[i, bw]`` is the diagonal); entries that fall
off the left edge are zero. The factor uses the same layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def banded_cholesky(Ab: jnp.ndarray):
    """Factor an SPD banded matrix given as a lower band.

    ``Ab``: (n, bw+1) lower band (see module docstring). Returns
    ``(Lb, fail)`` with the same layout (``Lb[i, bw]`` = diagonal of L)
    and a scalar bool ``fail`` set when a pivot is non-finite or
    non-positive (numerically non-SPD); the factor is zero-diagonal-safe
    to substitute with (pivots sanitized to 1.0) so callers can discard
    the result exactly like ``ops.linalg.spd_solve``.
    """
    n, bwp1 = Ab.shape
    bw = bwp1 - 1

    def step(window, a_row):
        # window: (bw, bw+1) — band rows of L for rows i-bw..i-1, aligned
        # so window[k, d] = L[i-bw+k, (i-bw+k) - bw + d].
        # Row i of L: for each d in [0, bw): column j = i - bw + d,
        #   L[i, j] = (A[i, j] - sum_{k < j, j-k <= bw} L[i,k] L[j,k]) / L[j,j]
        # computed in increasing d (a serial bw-length chain, unrolled at
        # trace time — bw is small and static).
        row = jnp.zeros((bwp1,), Ab.dtype)
        for d in range(bw):
            # Row j = i - bw + d lives at window[d]. Align the already-
            # computed entries of row i (columns i-bw .. i-bw+d-1) with
            # row j's band (columns j-bw .. j): row i's column (i-bw+t)
            # sits at position t; in row j's band it sits at
            # (i-bw+t) - (j-bw) = t - d + bw.
            s = jnp.zeros((), Ab.dtype)
            for t in range(d):
                s = s + row[t] * window[d, t - d + bw]
            pivot = window[d, bw]
            row = row.at[d].set((a_row[d] - s) / pivot)
        s = jnp.sum(row[:bw] * row[:bw])
        diag2 = a_row[bw] - s
        bad = ~(diag2 > 0) | ~jnp.isfinite(diag2)
        diag = jnp.where(bad, 1.0, jnp.sqrt(jnp.where(bad, 1.0, diag2)))
        row = row.at[bw].set(diag)
        new_window = jnp.concatenate([window, row[None, :]], axis=0)[1:]
        return new_window, (row, bad)

    # Virtual rows above the top: identity diagonal, zero off-band —
    # matches the zero padding of Ab's left edge, so the first real rows
    # divide by 1.0 and subtract 0.0 for out-of-range terms.
    w0 = jnp.zeros((bw, bwp1), Ab.dtype).at[:, bw].set(1.0)
    _, (Lb, bads) = jax.lax.scan(step, w0, Ab)
    return Lb, jnp.any(bads)


def banded_solve(Lb: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b given the lower-band factor from
    ``banded_cholesky``. ``b``: (n,) or (n, m)."""
    n, bwp1 = Lb.shape
    bw = bwp1 - 1
    vec = b.ndim == 1
    r = b[:, None] if vec else b
    m = r.shape[1]

    # Forward: y[i] = (b[i] - sum_{d<bw} L[i, i-bw+d] y[i-bw+d]) / L[i,i].
    def fwd(carry, inp):
        lrow, bi = inp  # (bw+1,), (m,)
        s = jnp.einsum("d,dm->m", lrow[:bw], carry)
        yi = (bi - s) / lrow[bw]
        return jnp.concatenate([carry, yi[None, :]], axis=0)[1:], yi

    _, y = jax.lax.scan(fwd, jnp.zeros((bw, m), Lb.dtype), (Lb, r))

    # Backward with L^T: x[i] = (y[i] - sum_{t=1..bw} L[i+t, i] x[i+t])
    #                           / L[i, i].
    # Row i+t's entry for column i sits at band position bw - t. Scan in
    # reverse carrying the NEXT bw solutions x[i+1..i+bw] (newest first)
    # and the corresponding band rows.
    def bwd(carry, inp):
        xs, lrows = carry  # (bw, m), (bw, bw+1): rows i+1..i+bw
        lrow, yi = inp
        s = jnp.zeros((m,), Lb.dtype)
        for t in range(1, bw + 1):
            s = s + lrows[t - 1, bw - t] * xs[t - 1]
        xi = (yi - s) / lrow[bw]
        xs = jnp.concatenate([xi[None, :], xs], axis=0)[:bw]
        lrows = jnp.concatenate([lrow[None, :], lrows], axis=0)[:bw]
        return (xs, lrows), xi

    carry0 = (
        jnp.zeros((bw, m), Lb.dtype),
        jnp.zeros((bw, bwp1), Lb.dtype).at[:, bw].set(1.0),
    )
    _, x_rev = jax.lax.scan(bwd, carry0, (Lb, y), reverse=True)
    x = x_rev
    return x[:, 0] if vec else x


def banded_spd_solve(Ab: jnp.ndarray, b: jnp.ndarray):
    """``spd_solve`` interface for a banded matrix: returns ``(x, fail)``
    with x zero-filled on failure."""
    Lb, fail = banded_cholesky(Ab)
    x = banded_solve(Lb, b)
    return jnp.where(fail, jnp.zeros_like(x), x), fail


def dense_to_band(A: jnp.ndarray, bw: int) -> jnp.ndarray:
    """Extract the lower band of a dense (n, n) matrix (test helper)."""
    n = A.shape[0]
    Ab = jnp.zeros((n, bw + 1), A.dtype)
    for d in range(bw + 1):
        col = jnp.arange(n) - bw + d
        vals = jnp.where(
            col >= 0, A[jnp.arange(n), jnp.clip(col, 0, n - 1)], 0.0
        )
        Ab = Ab.at[:, d].set(vals)
    return Ab
