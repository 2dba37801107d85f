"""Batched block-tridiagonal SPD solve as a single Pallas TPU kernel.

This is the KKT backbone of the gait solver (the role MUMPS plays inside
IPOPT for the reference — logs/towr_log.out:37), laid out for the hardware:
the scenario batch rides the 128 vector lanes, each Cholesky/substitution
step is a full-width (n, B) vector op, and the whole K-step Thomas recursion
runs in VMEM with per-step factors spilled to HBM for the back-substitution.

Design notes (hard-won on real hardware):
- every (n, n, B) block is stored COLUMN-major, i.e. as (col, row, B): each
  per-iteration access is then a dynamic slice on the MAJORmost axis — a
  contiguous (n, B) slab of whole sublane tiles.  Mid-axis `[:, pl.ds(j, 1)]`
  column reads decompose into n single-sublane gathers and dominated the
  kernel (~1.9x slower end to end);
- back-substitutions use the dot form (column read + sublane reduction)
  instead of the saxpy form (row read), so no strided row access survives;
- the subdiagonal blocks are ingested pre-transposed (see wrappers): both
  L u and L^T u then read columns of L from the same buffer;
- dynamic indexing goes through VMEM *refs* with `pl.ds` — Mosaic has no
  scatter, and static unrolling of the n=36 column loops explodes compile
  time;
- all DMA'd blocks are padded to a sublane multiple (8 for f32): unaligned
  (n, 128) HBM slices fault the device;
- the recursion is transpose-free: M with M Lc^T = L via a right triangular
  solve, then S_next = D - M M^T as symmetric outer products (symmetric
  blocks are storage-orientation agnostic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _row_ids(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)


def _rowvec(v, j):
    """Element j of v (n, B) as (B,), traced j (one-hot contraction)."""
    n = v.shape[0]
    ej = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == j).astype(v.dtype)
    return jnp.sum(v * ej, axis=0)


def _chol_ref(A_ref, Lc_ref, n):
    """In-place: Lc_ref <- chol(A_ref); A_ref destroyed.

    Both (n, n, B) column-major; A must be symmetric (so its storage
    orientation is irrelevant) and stays symmetric under the rank-1 updates.
    """
    rows = _row_ids(n)

    def body(j, _):
        diag = A_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]            # (B,)
        d = jax.lax.rsqrt(jnp.maximum(diag, 1e-12))
        col = A_ref[pl.ds(j, 1), :, :][0] * d[None, :]             # (n, B)
        col = jnp.where(rows >= j, col, 0.0)
        Lc_ref[pl.ds(j, 1), :, :] = col[None]
        A_ref[:] = A_ref[:] - col[:, None, :] * col[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _right_solve_ref(Lc_ref, M_ref, n):
    """In-place: M_ref <- M with M Lc^T = M_in. Both (n, n, B) column-major
    (M_ref[c] is column c of M over its rows)."""
    rows = _row_ids(n)

    def body(j, _):
        dj = Lc_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        mj = M_ref[pl.ds(j, 1), :, :][0] / dj[None, :]             # col j of M
        coeff = Lc_ref[pl.ds(j, 1), :, :][0]                       # col j of Lc
        coeff = jnp.where(rows > j, coeff, 0.0)
        # M[r, c] -= mj[r] * Lc[c, j] for c > j  (storage is (c, r, B))
        M_ref[:] = M_ref[:] - coeff[:, None, :] * mj[None, :, :]
        M_ref[pl.ds(j, 1), :, :] = mj[None]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _cho_solve_vec_ref(Lc_ref, r, n):
    """(Lc Lc^T)^-1 r for r (n, B) value; Lc factor lives in a column-major
    ref.  Forward pass is saxpy-form; backward pass is dot-form so both only
    ever read whole columns."""
    rows = _row_ids(n)

    def fwd(j, y):
        dj = Lc_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        yj = _rowvec(y, j) / dj
        below = Lc_ref[pl.ds(j, 1), :, :][0]
        below = jnp.where(rows > j, below, 0.0)
        ej = (rows == j).astype(y.dtype)
        y = y - below * yj[None, :]
        return y * (1.0 - ej) + ej * yj[None, :]

    y = jax.lax.fori_loop(0, n, fwd, r)

    def bwd(i, x):
        j = n - 1 - i
        dj = Lc_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        col = Lc_ref[pl.ds(j, 1), :, :][0]
        col = jnp.where(rows > j, col, 0.0)
        s = jnp.sum(col * x, axis=0)                    # sum_{r>j} Lc[r,j] x[r]
        xj = (_rowvec(x, j) - s) / dj
        ej = (rows == j).astype(x.dtype)
        return x * (1.0 - ej) + ej * xj[None, :]

    return jax.lax.fori_loop(0, n, bwd, y)


def _mmT_ref(M_ref, n):
    """M M^T from a column-major ref, accumulated column-by-column:
    (n, n, B) value (symmetric, so orientation-free)."""

    def body(m, acc):
        cm = M_ref[pl.ds(m, 1), :, :][0]
        return acc + cm[:, None, :] * cm[None, :, :]

    return jax.lax.fori_loop(0, n, body, jnp.zeros(M_ref.shape, M_ref.dtype))


def _mv_ref(Lt_ref, u, n):
    """(L u) for L stored TRANSPOSED (Lt_ref[c] = column c of L), u (n, B)."""

    def body(m, acc):
        return acc + Lt_ref[pl.ds(m, 1), :, :][0] * _rowvec(u, m)[None, :]

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(u))


def _mtv_ref(Lt_ref, u, n):
    """(L^T u) for L stored transposed: (L^T u)[c] = dot(column c of L, u)."""
    rows = _row_ids(n)

    def body(c, acc):
        col = Lt_ref[pl.ds(c, 1), :, :][0]
        s = jnp.sum(col * u, axis=0)                               # (B,)
        ec = (rows == c).astype(u.dtype)
        return acc + ec * s[None, :]

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(u))


def _btd_kernel(D_any, Lt_any, b_vmem, x_vmem, chol_any, y_vmem, dbuf, lbuf, cbuf, sems, *, K, n):
    g = pl.program_id(0)

    def load(src, dst, s):
        dma = pltpu.make_async_copy(src, dst, s)
        dma.start()
        dma.wait()

    # ---- forward elimination -------------------------------------------
    load(D_any.at[g, 0], dbuf, sems.at[0])
    _chol_ref(dbuf, cbuf, n)
    load(cbuf, chol_any.at[g, 0], sems.at[2])
    y_vmem[0] = b_vmem[0, 0]

    def fwd(k, y_prev):
        load(D_any.at[g, k], dbuf, sems.at[0])
        load(Lt_any.at[g, k - 1], lbuf, sems.at[1])
        u = _cho_solve_vec_ref(cbuf, y_prev, n)          # S_{k-1}^-1 y_{k-1}
        yk = b_vmem[0, k] - _mv_ref(lbuf, u, n)
        _right_solve_ref(cbuf, lbuf, n)                  # lbuf <- M, M Lc^T = L
        dbuf[:] = dbuf[:] - _mmT_ref(lbuf, n)            # S_k = D_k - M M^T
        _chol_ref(dbuf, cbuf, n)                         # cbuf <- chol(S_k)
        load(cbuf, chol_any.at[g, k], sems.at[2])
        y_vmem[k] = yk
        return yk

    y_last = jax.lax.fori_loop(1, K, fwd, b_vmem[0, 0])

    # ---- back substitution ---------------------------------------------
    xK = _cho_solve_vec_ref(cbuf, y_last, n)
    x_vmem[0, K - 1] = xK

    def bwd(i, x_next):
        k = K - 2 - i
        load(chol_any.at[g, k], cbuf, sems.at[2])
        load(Lt_any.at[g, k], lbuf, sems.at[1])
        rhs = y_vmem[k] - _mtv_ref(lbuf, x_next, n)
        xk = _cho_solve_vec_ref(cbuf, rhs, n)
        x_vmem[0, k] = xk
        return xk

    jax.lax.fori_loop(0, K - 1, bwd, xK)


def _pallas_btd_lanes_transposed(Dt, Ltt, bt, *, K, n, interpret=False):
    """Shared pallas_call: Dt (G, K, n, n, 128) symmetric blocks,
    Ltt (G, K, n, n, 128) subdiagonal blocks pre-transposed (col-major),
    bt (G, K, n, 128)."""
    G = Dt.shape[0]
    kernel = functools.partial(_btd_kernel, K=K, n=n)
    x_t, _ = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, n, LANES), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, n, LANES), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, K, n, LANES), Dt.dtype),
            jax.ShapeDtypeStruct((G, K, n, n, LANES), Dt.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, n, LANES), Dt.dtype),   # y
            pltpu.VMEM((n, n, LANES), Dt.dtype),   # dbuf
            pltpu.VMEM((n, n, LANES), Dt.dtype),   # lbuf
            pltpu.VMEM((n, n, LANES), Dt.dtype),   # cbuf
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(Dt, Ltt, bt)
    return x_t


@functools.partial(jax.jit, static_argnames=("interpret",))
def btd_solve_pallas(D: jax.Array, L: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    """Solve batched SPD block-tridiagonal systems.

    Args:
      D: (B, K, n, n) diagonal blocks.
      L: (B, K-1, n, n) sub-diagonal blocks.
      b: (B, K, n) right-hand sides.
      interpret: run in interpreter mode (CPU testing).

    Returns:
      x: (B, K, n).
    """
    B, K, n_in, _ = D.shape
    # Pad the block size to a sublane multiple (8 for f32): unaligned (n, 128)
    # DMA slices fault on real hardware.  Padded rows carry an identity
    # diagonal, keeping the system SPD and decoupled.
    n = ((n_in + 7) // 8) * 8
    if n != n_in:
        padn = n - n_in
        eye_pad = jnp.zeros((n, n), D.dtype).at[n_in:, n_in:].set(jnp.eye(padn, dtype=D.dtype))
        Dp_ = jnp.zeros(D.shape[:2] + (n, n), D.dtype) + eye_pad
        D = Dp_.at[..., :n_in, :n_in].set(D)
        L = jnp.pad(L, ((0, 0), (0, 0), (0, padn), (0, padn)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, padn)))
    if B % LANES != 0:
        padB = (-B) % LANES
        D = jnp.concatenate([D, jnp.broadcast_to(jnp.eye(n, dtype=D.dtype), (padB, K, n, n))], 0)
        L = jnp.concatenate([L, jnp.zeros((padB, K - 1, n, n), D.dtype)], 0)
        b = jnp.concatenate([b, jnp.zeros((padB, K, n), D.dtype)], 0)
    Bp = D.shape[0]
    G = Bp // LANES

    # lanes-last layout; D is symmetric, L enters column-major (transposed),
    # zero-padded to K blocks
    Dt = jnp.moveaxis(D.reshape(G, LANES, K, n, n), 1, -1)       # (G, K, n, n, 128)
    Lt = jnp.swapaxes(L, -1, -2)
    Lpad = jnp.concatenate([Lt, jnp.zeros((Bp, 1, n, n), D.dtype)], 1)
    Ltt = jnp.moveaxis(Lpad.reshape(G, LANES, K, n, n), 1, -1)
    bt = jnp.moveaxis(b.reshape(G, LANES, K, n), 1, -1)          # (G, K, n, 128)

    x_t = _pallas_btd_lanes_transposed(Dt, Ltt, bt, K=K, n=n, interpret=interpret)
    x = jnp.moveaxis(x_t, -1, 1).reshape(Bp, K, n)
    return x[:B, :, :n_in]


@jax.jit
def btd_solve_pallas_lanes(D: jax.Array, L: jax.Array, b: jax.Array) -> jax.Array:
    """Lanes-layout entry: D (K, n, n, B), L (K-1, n, n, B), b (K, n, B)
    -> x (K, n, B).

    The batch is already on the minor (lane) axis — the kernel's native
    layout — so no (B, K, n, n) <-> lanes transpose of the ~200 MB system is
    paid; only the cheap K/G regrouping of major axes plus the subdiagonal
    block transpose the kernel's column-major storage requires.
    """
    K, n_in, _, B = D.shape
    n = ((n_in + 7) // 8) * 8
    if n != n_in:
        padn = n - n_in
        eye_pad = jnp.zeros((n, n), D.dtype).at[n_in:, n_in:].set(
            jnp.eye(padn, dtype=D.dtype)
        )[None, :, :, None]
        Dp_ = jnp.zeros((K, n, n, B), D.dtype) + eye_pad
        D = Dp_.at[:, :n_in, :n_in, :].set(D)
        L = jnp.pad(L, ((0, 0), (0, padn), (0, padn), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, padn), (0, 0)))
    if B % LANES != 0:
        padB = (-B) % LANES
        eyeKn = jnp.broadcast_to(jnp.eye(n, dtype=D.dtype)[None, :, :, None], (K, n, n, padB))
        D = jnp.concatenate([D, eyeKn], axis=-1)
        L = jnp.concatenate([L, jnp.zeros((K - 1, n, n, padB), D.dtype)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((K, n, padB), D.dtype)], axis=-1)
    Bp = D.shape[-1]
    G = Bp // LANES

    Dt = jnp.moveaxis(D.reshape(K, n, n, G, LANES), 3, 0)          # (G, K, n, n, 128)
    Lt = jnp.swapaxes(L, 1, 2)                                     # column-major blocks
    Lpad = jnp.concatenate([Lt, jnp.zeros((1, n, n, Bp), D.dtype)], 0)
    Ltt = jnp.moveaxis(Lpad.reshape(K, n, n, G, LANES), 3, 0)
    bt = jnp.moveaxis(b.reshape(K, n, G, LANES), 2, 0)             # (G, K, n, 128)

    x_t = _pallas_btd_lanes_transposed(Dt, Ltt, bt, K=K, n=n)
    x = jnp.moveaxis(x_t, 0, 2).reshape(K, n, Bp)
    return x[:, :n_in, :B]
