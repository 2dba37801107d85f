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

from qtos_tpu.ops.batch_linalg import cholesky_unrolled, solve_lower, solve_upper_t


def _use_unrolled() -> bool:
    # XLA's LAPACK-style cholesky/triangular_solve is latency-bound on TPU for
    # tiny blocks (the unrolled masked-update version is ~2.5x faster there),
    # but on CPU the native LAPACK path is both faster and far quicker to
    # compile.
    return jax.default_backend() != "cpu"


def _chol(A):
    if _use_unrolled():
        return cholesky_unrolled(A)
    return cho_factor(A, lower=True)[0]


def _chol_solve(L, B):
    if _use_unrolled():
        return solve_upper_t(L, solve_lower(L, B))
    return cho_solve((L, True), B)


def _chol_solve_vec(L, b):
    return _chol_solve(L, b[..., None])[..., 0]


# ---------------------------------------------------------------------------
# Batch-on-lanes implementation (TPU layout: batch axis LAST = vector lanes).
# A (B, n, n) layout maps the tiny n x n blocks onto the (8, 128) vector tiles
# and starves the VPU; (n, n, B) makes every unrolled Cholesky/substitution
# step a full-width (n, B) vector op.  `block_tridiag_solve` exposes this via
# a custom vmap rule, so the vmapped per-scenario solver hits it automatically.
# ---------------------------------------------------------------------------


def _chol_lanes(A):
    """Cholesky of SPD A (n, n, B) -> lower factor, unrolled columns."""
    n = A.shape[0]
    rows = jnp.arange(n)[:, None]
    Lc = jnp.zeros_like(A)
    for j in range(n):
        d = jax.lax.rsqrt(jnp.maximum(A[j, j], 1e-12))          # (B,)
        col = A[:, j] * d[None, :]                               # (n, B)
        col = jnp.where(rows >= j, col, 0.0)
        Lc = Lc.at[:, j].set(col)
        A = A - col[:, None, :] * col[None, :, :]
    return Lc


def _solve_lower_lanes(Lc, R):
    """Lc Y = R with Lc (n, n, B) lower, R (n, m, B)."""
    n = Lc.shape[0]
    rows = jnp.arange(n)[:, None]
    Y = R
    for j in range(n):
        yj = Y[j] / Lc[j, j][None, :]                            # (m, B)
        colj = jnp.where(rows > j, Lc[:, j], 0.0)                # (n, B)
        Y = Y - colj[:, None, :] * yj[None, :, :]
        Y = Y.at[j].set(yj)
    return Y


def _solve_upper_t_lanes(Lc, R):
    """Lc^T X = R."""
    n = Lc.shape[0]
    rows = jnp.arange(n)[:, None]
    X = R
    for j in range(n - 1, -1, -1):
        xj = X[j] / Lc[j, j][None, :]
        rowj = jnp.where(rows < j, Lc[j, :], 0.0)                # (n, B)
        X = X - rowj[:, None, :] * xj[None, :, :]
        X = X.at[j].set(xj)
    return X


def _spd_solve_lanes(Lc, R):
    return _solve_upper_t_lanes(Lc, _solve_lower_lanes(Lc, R))


def _matmul_lanes(A, B):
    """(n, m, B) @ (m, p, B) -> (n, p, B) contraction over the middle axis."""
    return jnp.einsum("imb,mjb->ijb", A, B)


def _block_tridiag_solve_lanes(D, L, b):
    """Thomas solve with batch on the last axis.

    D (K, n, n, B), L (K-1, n, n, B), b (K, n, B) -> x (K, n, B).
    """
    K, n = D.shape[0], D.shape[1]
    Lpad = jnp.concatenate([jnp.zeros((1,) + L.shape[1:], D.dtype), L], 0)

    def fwd(carry, inp):
        Lc_prev, y_prev = carry
        Dk, Lk, bk = inp
        LkT = jnp.swapaxes(Lk, 0, 1)
        Wt = _spd_solve_lanes(Lc_prev, LkT)                      # S^-1 L^T
        Sk = Dk - _matmul_lanes(Lk, Wt)
        u = _spd_solve_lanes(Lc_prev, y_prev[:, None, :])[:, 0, :]
        yk = bk - jnp.einsum("imb,mb->ib", Lk, u)
        Lck = _chol_lanes(Sk)
        return (Lck, yk), (Lck, yk)

    Lc0 = _chol_lanes(D[0])
    (_, _), (Lcs_rest, ys_rest) = jax.lax.scan(
        fwd, (Lc0, b[0]), (D[1:], Lpad[1:], b[1:])
    )
    Lcs = jnp.concatenate([Lc0[None], Lcs_rest], 0)
    ys = jnp.concatenate([b[0][None], ys_rest], 0)

    def bwd(x_next, inp):
        Lck, yk, Lk_next = inp
        rhs = yk - jnp.einsum("mib,mb->ib", Lk_next, x_next)     # L^T x
        xk = _spd_solve_lanes(Lck, rhs[:, None, :])[:, 0, :]
        return xk, xk

    Lnext = jnp.concatenate([L, jnp.zeros((1,) + L.shape[1:], D.dtype)], 0)
    _, xs = jax.lax.scan(
        bwd, jnp.zeros(b.shape[1:], D.dtype), (Lcs, ys, Lnext), reverse=True
    )
    return xs


@jax.custom_batching.custom_vmap
def block_tridiag_solve(D: jax.Array, L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve H x = b for SPD block-tridiagonal H.

    H = blocktridiag(diag=D[k], lower=L[k] at (k+1, k), upper=L[k]^T).

    Args:
      D: (K, n, n) diagonal blocks (SPD after regularization).
      L: (K-1, n, n) sub-diagonal blocks.
      b: (K, n) right-hand side.

    Returns:
      x: (K, n).

    Under `vmap`, dispatches to the batch-on-lanes implementation above.
    """
    K, n, _ = D.shape
    Lpad = jnp.concatenate([jnp.zeros((1, n, n), D.dtype), L], axis=0)

    def fwd(carry, inp):
      S_prev, y_prev = carry
      Dk, Lk, bk = inp
      c_prev = _chol(S_prev)
      # W^T = S_{k-1}^{-1} L_k^T   (n, n)
      Wt = _chol_solve(c_prev, jnp.swapaxes(Lk, -1, -2))
      Sk = Dk - Lk @ Wt
      yk = bk - Lk @ _chol_solve_vec(c_prev, y_prev)
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
      xk = _chol_solve_vec(_chol(Sk), yk - jnp.swapaxes(Lk_next, -1, -2) @ x_next)
      return xk, xk

    Lnext = jnp.concatenate([L, jnp.zeros((1, n, n), D.dtype)], axis=0)
    _, xs = jax.lax.scan(bwd, jnp.zeros((n,), D.dtype), (Ss, ys, Lnext), reverse=True)
    return xs


def _use_pallas_btd() -> bool:
    import os

    if os.environ.get("QTOS_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


@block_tridiag_solve.def_vmap
def _block_tridiag_solve_vmap(axis_size, in_batched, D, L, b):
    del axis_size
    # Move the batch axis to the lanes (last) position; broadcast unbatched args.
    db, lb, bb = in_batched
    if not db:
        D = jnp.broadcast_to(D[None], (b.shape[0] if bb else L.shape[0],) + D.shape)
        db = True
    if _use_pallas_btd() and D.ndim == 4:
        from qtos_tpu.ops.pallas.btd import btd_solve_pallas

        B = D.shape[0]
        Lb = L if lb else jnp.broadcast_to(L[None], (B,) + L.shape)
        bb_ = b if bb else jnp.broadcast_to(b[None], (B,) + b.shape)
        return btd_solve_pallas(D, Lb, bb_), True
    Dt = jnp.moveaxis(D, 0, -1)
    Lt = jnp.moveaxis(L, 0, -1) if lb else jnp.broadcast_to(L[..., None], L.shape + (Dt.shape[-1],))
    bt = jnp.moveaxis(b, 0, -1) if bb else jnp.broadcast_to(b[..., None], b.shape + (Dt.shape[-1],))
    xt = _block_tridiag_solve_lanes(Dt, Lt, bt)
    return jnp.moveaxis(xt, -1, 0), True


# A block-cyclic-reduction (time-parallel) factorization was implemented and
# benchmarked here through round 3 as the SURVEY.md §5.7 "sequence parallel"
# analog.  Measured on TPU v5e it never beat the Thomas scan at any
# production shape — both are dispatch-bound at ~0.09 ms for K=41..401, n=36
# (XLA pipelines the scan's tiny Cholesky blocks well) — so it was removed
# rather than kept as unreached code.  Long horizons are scaled by
# receding-horizon decomposition (qtos_tpu.control.replan) instead.


def block_tridiag_matvec(D: jax.Array, L: jax.Array, x: jax.Array) -> jax.Array:
    """H @ x for the block-tridiagonal H defined as above. Shapes as in solve."""
    y = jnp.einsum("kij,kj->ki", D, x)
    y = y.at[1:].add(jnp.einsum("kij,kj->ki", L, x[:-1]))
    y = y.at[:-1].add(jnp.einsum("kji,kj->ki", L, x[1:]))
    return y
