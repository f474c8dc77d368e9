"""SPD solves tuned for TPU.

XLA's batched ``jnp.linalg.cholesky`` lowers to a serialized decomposition
that is ~100x slower than elementwise code for tiny matrices on TPU (335 ms
vs 3 ms for 150k 4x4 f64 factorizations on v5e). Constraint-sketch normal
equations are almost always tiny, so we unroll Cholesky-Crout for small
static n — pure VPU elementwise ops that fuse into the surrounding LM loop —
and fall back to the LAPACK-style path only for large systems.

Failure semantics match ``jnp.linalg.cholesky``: a non-SPD matrix yields NaN
(sqrt of a negative), which the LM loop detects and treats as a rejected
step (mirroring faer's LltError::Numeric, ``newton.rs:96-99``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this size the unrolled program gets big; use XLA's cholesky.
UNROLL_MAX_N = 24


def _chol_unrolled(A):
    """Lower Cholesky factor as an n x n list of scalars (leading batch dims
    broadcast through). Unrolled Cholesky-Crout."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def _solve_unrolled(L, b):
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def spd_solve(A: jnp.ndarray, b: jnp.ndarray):
    """Solve A x = b for SPD A.

    Returns ``(x, fail)`` where ``fail`` is a scalar bool (NaN encountered =>
    numerically non-SPD). ``x`` is zero-filled when failed. Shapes: A (n, n),
    b (n,) — batch via vmap (everything here is elementwise, so vmap is free).
    """
    n = A.shape[-1]
    if n == 0:
        return jnp.zeros_like(b), jnp.asarray(False)
    if n <= UNROLL_MAX_N:
        L = _chol_unrolled(A)
        diag = jnp.stack([L[i][i] for i in range(n)], axis=-1)
        fail = jnp.any(jnp.isnan(diag))
        # Sanitize the diagonal so the solve never divides by NaN/0 when the
        # result is discarded anyway.
        Lsafe = [row[:] for row in L]
        for i in range(n):
            Lsafe[i][i] = jnp.where(jnp.isnan(L[i][i]) | (L[i][i] == 0.0), 1.0, L[i][i])
            for k in range(i):
                Lsafe[i][k] = jnp.where(jnp.isnan(L[i][k]), 0.0, L[i][k])
        x = _solve_unrolled(Lsafe, b)
        x = jnp.where(fail, jnp.zeros_like(x), x)
        return x, fail
    chol = jnp.linalg.cholesky(A)
    fail = jnp.any(jnp.isnan(chol))
    chol_safe = jnp.where(fail, jnp.eye(n, dtype=A.dtype), chol)
    x = jax.scipy.linalg.cho_solve((chol_safe, True), b)
    x = jnp.where(fail, jnp.zeros_like(x), x)
    return x, fail


def spd_solve_multi(A: jnp.ndarray, B: jnp.ndarray):
    """Solve A X = B for SPD A with multiple right-hand sides B (n, m).
    Returns (X, fail)."""
    n = A.shape[-1]
    if n <= UNROLL_MAX_N:
        L = _chol_unrolled(A)
        diag = jnp.stack([L[i][i] for i in range(n)], axis=-1)
        fail = jnp.any(jnp.isnan(diag))
        Lsafe = [row[:] for row in L]
        for i in range(n):
            Lsafe[i][i] = jnp.where(jnp.isnan(L[i][i]) | (L[i][i] == 0.0), 1.0, L[i][i])
            for k in range(i):
                Lsafe[i][k] = jnp.where(jnp.isnan(L[i][k]), 0.0, L[i][k])
        x = jax.vmap(lambda bb: _solve_unrolled(Lsafe, bb), in_axes=1, out_axes=1)(B)
        x = jnp.where(fail, jnp.zeros_like(x), x)
        return x, fail
    chol = jnp.linalg.cholesky(A)
    fail = jnp.any(jnp.isnan(chol))
    chol_safe = jnp.where(fail, jnp.eye(n, dtype=A.dtype), chol)
    x = jax.scipy.linalg.cho_solve((chol_safe, True), B)
    x = jnp.where(fail, jnp.zeros_like(x), x)
    return x, fail
