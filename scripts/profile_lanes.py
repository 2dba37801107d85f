#!/usr/bin/env python3
"""Micro-profile of the batch-on-lanes solver path at bench shapes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.assemble_lanes import assemble_lanes, lanes_spec
from qtos_tpu.solver.transcription import initial_guess
from qtos_tpu.terrain import make_terrain


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    B, K = 1024, 41
    terrain = make_terrain(["plane", "plane", "plane"])
    cfg = SolverConfig(max_iters=16)
    goals = jnp.linspace(0.3, 0.8, B)
    specs = jax.vmap(lambda g: default_spec(terrain, goal_xy=(g, 0.0), K=K))(goals)

    x0 = jax.jit(jax.vmap(lambda s: initial_guess(s, terrain, cfg)))(specs)
    xT = jnp.transpose(x0, (2, 1, 0))  # (NV, K, B)
    ls = lanes_spec(specs)
    dt_ = specs.dt

    asm = jax.jit(lambda xt: assemble_lanes(xt, ls, terrain, cfg, dt_))
    D, L, g, merit = timeit("assemble_lanes (1x)", asm, xT)
    print("D", D.shape, D.dtype, f"{D.nbytes/1e6:.0f} MB; L {L.nbytes/1e6:.0f} MB")

    NV = D.shape[1]
    eyeNV = jnp.eye(NV, dtype=D.dtype)[None, :, :, None]
    diag = jnp.transpose(jnp.diagonal(D, axis1=1, axis2=2), (0, 2, 1))
    Dd = D + eyeNV * (1e-2 * diag + 1e-8)[:, :, None, :]

    from qtos_tpu.ops.pallas.btd import btd_solve_pallas_lanes

    timeit("btd_solve_pallas_lanes (1x)", jax.jit(btd_solve_pallas_lanes), Dd, L, g)

    from qtos_tpu.ops.tridiag import _block_tridiag_solve_lanes

    timeit("xla lanes thomas (1x)", jax.jit(_block_tridiag_solve_lanes), Dd, L, g)

    # LM bookkeeping cost: the where-selects + damping of one iteration
    @jax.jit
    def bookkeep(D, L, g, Db, Lb, gb, accept, lm):
        a4 = accept[None, None, None, :]
        a3 = accept[None, None, :]
        Db = jnp.where(a4, D, Db)
        Lb = jnp.where(a4, L, Lb)
        gb = jnp.where(a3, g, gb)
        diag = jnp.transpose(jnp.diagonal(Db, axis1=1, axis2=2), (0, 2, 1))
        dmat = lm[None, None, :] * diag + 1e-8
        Dd = Db + eyeNV * dmat[:, :, None, :]
        return Dd, Lb, gb

    accept = merit < jnp.inf
    lm = jnp.full((B,), 1e-4, D.dtype)
    timeit("LM bookkeeping (1x)", bookkeep, D, L, g, D, L, g, accept, lm)

    from qtos_tpu.solver.solve import solve_batch

    full = jax.jit(lambda s: solve_batch(s, terrain, cfg))
    timeit("full solve (16 iters)", full, specs, n=3)


if __name__ == "__main__":
    main()
