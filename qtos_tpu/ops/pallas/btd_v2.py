"""Optimized batched block-tridiagonal SPD solve (Pallas TPU kernel, v2).

Same contract as `qtos_tpu.ops.pallas.btd` (the KKT backbone of the gait
solver — the role MUMPS plays inside IPOPT for the reference,
logs/towr_log.out:37), with three hardware-level improvements over v1:

1. **Ref-based vector substitution**: the forward/back triangular solves keep
   the working vector in a VMEM scratch ref, so element j is a `pl.ds` row
   read instead of a one-hot contraction over the full (n, B) value — cuts
   the vector-solve op count ~3x.
2. **Fused right-solve + Schur update**: column j of M = L Lc^-T is final the
   moment it is computed, so S_k = D_k - M M^T is accumulated rank-1 inside
   the same loop — one pass instead of two, and no (n, n, B) loop-carried
   value.
3. **Wide lane groups**: each grid step processes `lanes` (256 by default)
   scenarios instead of 128, halving per-iteration Mosaic loop overhead,
   which dominates at n ~ 40.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_ids(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)


def _chol_ref(A_ref, Lc_ref, n):
    """In-place: Lc_ref <- chol(A_ref); A_ref destroyed. Both (n, n, B)."""
    rows = _row_ids(n)

    def body(j, _):
        diag = A_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]            # (B,)
        d = jax.lax.rsqrt(jnp.maximum(diag, 1e-12))
        col = A_ref[:, pl.ds(j, 1), :][:, 0, :] * d[None, :]       # (n, B)
        col = jnp.where(rows >= j, col, 0.0)
        Lc_ref[:, pl.ds(j, 1), :] = col[:, None, :]
        A_ref[:] = A_ref[:] - col[:, None, :] * col[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _right_solve_schur_ref(Lc_ref, M_ref, S_ref, n):
    """Fused: M_ref <- M with M Lc^T = M_in, and S_ref -= M M^T.

    Column j of M is final at step j (M[:, j] = mj), so the Schur rank-1
    update S -= mj mj^T rides the same loop. All refs (n, n, B).
    """
    rows = _row_ids(n)

    def body(j, _):
        dj = Lc_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        mj = M_ref[:, pl.ds(j, 1), :][:, 0, :] / dj[None, :]
        coeff = Lc_ref[:, pl.ds(j, 1), :][:, 0, :]
        coeff = jnp.where(rows > j, coeff, 0.0)
        M_ref[:] = M_ref[:] - mj[:, None, :] * coeff[None, :, :]
        M_ref[:, pl.ds(j, 1), :] = mj[:, None, :]
        S_ref[:] = S_ref[:] - mj[:, None, :] * mj[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _cho_solve_inplace(Lc_ref, v_ref, n):
    """In-place v_ref <- (Lc Lc^T)^-1 v_ref; v_ref (n, B) VMEM scratch."""
    rows = _row_ids(n)

    def fwd(j, _):
        dj = Lc_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        yj = v_ref[pl.ds(j, 1), :][0] / dj                          # (B,)
        below = Lc_ref[:, pl.ds(j, 1), :][:, 0, :]
        below = jnp.where(rows > j, below, 0.0)
        v_ref[:] = v_ref[:] - below * yj[None, :]
        v_ref[pl.ds(j, 1), :] = yj[None, :]
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)

    def bwd(i, _):
        j = n - 1 - i
        dj = Lc_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0]
        xj = v_ref[pl.ds(j, 1), :][0] / dj
        above = Lc_ref[pl.ds(j, 1), :, :][0]                        # row j, (n, B)
        above = jnp.where(rows < j, above, 0.0)
        v_ref[:] = v_ref[:] - above * xj[None, :]
        v_ref[pl.ds(j, 1), :] = xj[None, :]
        return 0

    jax.lax.fori_loop(0, n, bwd, 0)


def _mv_ref(L_ref, u_ref, n, out_dtype):
    """(L u): L (n, n, B) ref, u (n, B) ref -> (n, B) value."""

    def body(m, acc):
        um = u_ref[pl.ds(m, 1), :][0]                               # (B,)
        return acc + L_ref[:, pl.ds(m, 1), :][:, 0, :] * um[None, :]

    return jax.lax.fori_loop(
        0, n, body, jnp.zeros(u_ref.shape, out_dtype)
    )


def _mtv_ref(L_ref, u_ref, n, out_dtype):
    """(L^T u)."""

    def body(m, acc):
        um = u_ref[pl.ds(m, 1), :][0]
        return acc + L_ref[pl.ds(m, 1), :, :][0] * um[None, :]

    return jax.lax.fori_loop(
        0, n, body, jnp.zeros(u_ref.shape, out_dtype)
    )


def _btd_kernel(
    D_any, L_any, b_vmem, x_vmem, chol_any, y_vmem, dbuf, lbuf, cbuf, vbuf, sems, *, K, n
):
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

    def fwd(k, _):
        load(D_any.at[g, k], dbuf, sems.at[0])
        load(L_any.at[g, k - 1], lbuf, sems.at[1])
        vbuf[:] = y_vmem[k - 1]
        _cho_solve_inplace(cbuf, vbuf, n)                # vbuf <- S_{k-1}^-1 y
        y_vmem[k] = b_vmem[0, k] - _mv_ref(lbuf, vbuf, n, dbuf.dtype)
        _right_solve_schur_ref(cbuf, lbuf, dbuf, n)      # dbuf <- D_k - M M^T
        _chol_ref(dbuf, cbuf, n)                         # cbuf <- chol(S_k)
        load(cbuf, chol_any.at[g, k], sems.at[2])
        return 0

    jax.lax.fori_loop(1, K, fwd, 0)

    # ---- back substitution ---------------------------------------------
    vbuf[:] = y_vmem[K - 1]
    _cho_solve_inplace(cbuf, vbuf, n)
    x_vmem[0, K - 1] = vbuf[:]

    def bwd(i, _):
        k = K - 2 - i
        load(chol_any.at[g, k], cbuf, sems.at[2])
        load(L_any.at[g, k], lbuf, sems.at[1])
        rhs = y_vmem[k] - _mtv_ref(lbuf, vbuf, n, vbuf.dtype)
        vbuf[:] = rhs
        _cho_solve_inplace(cbuf, vbuf, n)
        x_vmem[0, k] = vbuf[:]
        return 0

    jax.lax.fori_loop(0, K - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=("lanes", "interpret"))
def btd_solve_pallas_lanes_v2(
    D: jax.Array,
    L: jax.Array,
    b: jax.Array,
    lanes: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Lanes-layout batched SPD block-tridiagonal solve.

    D (K, n, n, B), L (K-1, n, n, B), b (K, n, B) -> x (K, n, B).
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
    if B % lanes != 0:
        padB = (-B) % lanes
        eyeKn = jnp.broadcast_to(jnp.eye(n, dtype=D.dtype)[None, :, :, None], (K, n, n, padB))
        D = jnp.concatenate([D, eyeKn], axis=-1)
        L = jnp.concatenate([L, jnp.zeros((K - 1, n, n, padB), D.dtype)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((K, n, padB), D.dtype)], axis=-1)
    Bp = D.shape[-1]
    G = Bp // lanes

    Dt = jnp.moveaxis(D.reshape(K, n, n, G, lanes), 3, 0)          # (G, K, n, n, lanes)
    Lpad = jnp.concatenate([L, jnp.zeros((1, n, n, Bp), D.dtype)], 0)
    Lt = jnp.moveaxis(Lpad.reshape(K, n, n, G, lanes), 3, 0)
    bt = jnp.moveaxis(b.reshape(K, n, G, lanes), 2, 0)             # (G, K, n, lanes)

    kernel = functools.partial(_btd_kernel, K=K, n=n)
    x_t, _ = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, K, n, lanes), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, n, lanes), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, K, n, lanes), D.dtype),
            jax.ShapeDtypeStruct((G, K, n, n, lanes), D.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, n, lanes), D.dtype),    # y
            pltpu.VMEM((n, n, lanes), D.dtype),    # dbuf (D_k then S_k)
            pltpu.VMEM((n, n, lanes), D.dtype),    # lbuf (L then M)
            pltpu.VMEM((n, n, lanes), D.dtype),    # cbuf (chol factor)
            pltpu.VMEM((n, lanes), D.dtype),       # vbuf (substitution vector)
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(Dt, Lt, bt)

    x = jnp.moveaxis(x_t, 0, 2).reshape(K, n, Bp)
    return x[:, :n_in, :B]
