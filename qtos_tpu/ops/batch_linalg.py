"""Batched small-SPD factorization/solve without LAPACK-style lowering.

XLA's `cholesky` + `triangular_solve` on TPU lower to column-loop routines
that are latency-bound for the tiny (36x36) KKT blocks of the gait solver.
These unrolled versions express the same math as masked elementwise updates
over the whole (..., n, n) batch — pure VPU work that XLA fuses cleanly, and
the template the Pallas lane-batched kernel follows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_unrolled(A: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Lower Cholesky factor of SPD A (..., n, n), column loop unrolled."""
    n = A.shape[-1]
    rows = jnp.arange(n)
    L = jnp.zeros_like(A)
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(A[..., j, j], eps))
        col = A[..., :, j] / d[..., None]
        col = jnp.where(rows >= j, col, 0.0)
        L = L.at[..., :, j].set(col)
        A = A - col[..., :, None] * col[..., None, :]
    return L


def solve_lower(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L Y = B for lower-triangular L: (..., n, n) @ (..., n, m)."""
    n = L.shape[-1]
    rows = jnp.arange(n)
    Y = B
    for j in range(n):
        yj = Y[..., j, :] / L[..., j, j][..., None]
        colj = jnp.where(rows > j, L[..., :, j], 0.0)
        Y = Y - colj[..., :, None] * yj[..., None, :]
        Y = Y.at[..., j, :].set(yj)
    return Y


def solve_upper_t(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L^T X = B for lower-triangular L (i.e. upper system)."""
    n = L.shape[-1]
    rows = jnp.arange(n)
    X = B
    for j in range(n - 1, -1, -1):
        xj = X[..., j, :] / L[..., j, j][..., None]
        # L^T column j is L row j: entries L[j, k] for k < j
        rowj = jnp.where(rows < j, L[..., j, :], 0.0)
        X = X - rowj[..., :, None] * xj[..., None, :]
        X = X.at[..., j, :].set(xj)
    return X


def spd_solve(A: jax.Array, B: jax.Array) -> jax.Array:
    """A^{-1} B for SPD A (..., n, n), B (..., n, m)."""
    L = cholesky_unrolled(A)
    return solve_upper_t(L, solve_lower(L, B))


def spd_solve_vec(A: jax.Array, b: jax.Array) -> jax.Array:
    """A^{-1} b for SPD A (..., n, n), b (..., n)."""
    return spd_solve(A, b[..., None])[..., 0]
