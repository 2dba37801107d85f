"""Batched block-tridiagonal SPD solves — the KKT backbone of the gait solver.

The collocation NLP couples only adjacent knots, so every Gauss-Newton system
is block-tridiagonal in time with small dense blocks (state width ~30).  This
replaces the general sparse LU (MUMPS) used by the reference's IPOPT inner
loop (reference: logs/towr_log.out:37, Dockerfile:15-21) with a structure-
exploiting block Thomas factorization that XLA maps to batched small matmuls;
the scenario batch rides vmap/sharding.

`block_tridiag_solve` is the reference implementation (lax.scan of Cholesky
blocks); a Pallas kernel with the batch axis on lanes lives in
``qtos_tpu.ops.pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


def block_tridiag_solve(D: jax.Array, L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve H x = b for SPD block-tridiagonal H.

    H = blocktridiag(diag=D[k], lower=L[k] at (k+1, k), upper=L[k]^T).

    Args:
      D: (K, n, n) diagonal blocks (SPD after regularization).
      L: (K-1, n, n) sub-diagonal blocks.
      b: (K, n) right-hand side.

    Returns:
      x: (K, n).
    """
    K, n, _ = D.shape
    Lpad = jnp.concatenate([jnp.zeros((1, n, n), D.dtype), L], axis=0)

    def fwd(carry, inp):
      S_prev, y_prev = carry
      Dk, Lk, bk = inp
      c_prev = cho_factor(S_prev, lower=True)
      # W^T = S_{k-1}^{-1} L_k^T   (n, n)
      Wt = cho_solve(c_prev, jnp.swapaxes(Lk, -1, -2))
      Sk = Dk - Lk @ Wt
      yk = bk - Lk @ cho_solve(c_prev, y_prev)
      return (Sk, yk), (Sk, yk, Lk)

    S0 = D[0]
    y0 = b[0]
    (_, _), (Ss_rest, ys_rest, _) = jax.lax.scan(
        fwd, (S0, y0), (D[1:], Lpad[1:], b[1:])
    )
    Ss = jnp.concatenate([S0[None], Ss_rest], axis=0)
    ys = jnp.concatenate([y0[None], ys_rest], axis=0)

    def bwd(x_next, inp):
      Sk, yk, Lk_next = inp
      c = cho_factor(Sk, lower=True)
      xk = cho_solve(c, yk - jnp.swapaxes(Lk_next, -1, -2) @ x_next)
      return xk, xk

    Lnext = jnp.concatenate([L, jnp.zeros((1, n, n), D.dtype)], axis=0)
    _, xs = jax.lax.scan(bwd, jnp.zeros((n,), D.dtype), (Ss, ys, Lnext), reverse=True)
    return xs


def block_tridiag_matvec(D: jax.Array, L: jax.Array, x: jax.Array) -> jax.Array:
    """H @ x for the block-tridiagonal H defined as above. Shapes as in solve."""
    y = jnp.einsum("kij,kj->ki", D, x)
    y = y.at[1:].add(jnp.einsum("kij,kj->ki", L, x[:-1]))
    y = y.at[:-1].add(jnp.einsum("kji,kj->ki", L, x[1:]))
    return y
