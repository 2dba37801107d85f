#!/usr/bin/env python3
"""Micro-profile of the batched gait solve: assemble vs linear-solve vs
residual cost, at bench shapes (B=1024, K=41, NV=36). Dev tool, not a test."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import _assemble, _merit, solve_batch
from qtos_tpu.ops.tridiag import block_tridiag_solve
from qtos_tpu.terrain import make_terrain


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return out


def main():
    B, K = 1024, 41
    terrain = make_terrain(["plane", "plane", "plane"])
    cfg = SolverConfig(max_iters=16)
    goals = jnp.linspace(0.3, 0.8, B)
    specs = jax.vmap(lambda g: default_spec(terrain, goal_xy=(g, 0.0), K=K))(goals)

    from qtos_tpu.solver.transcription import initial_guess

    x0 = jax.jit(jax.vmap(lambda s: initial_guess(s, terrain, cfg)))(specs)
    jax.block_until_ready(x0)

    asm = jax.jit(jax.vmap(lambda x, s: _assemble(x, s, terrain, cfg)))
    D, L, g, merit = timeit("assemble (1x)", asm, x0, specs)

    mer = jax.jit(jax.vmap(lambda x, s: _merit(x, s, terrain, cfg)))
    timeit("merit/residuals (1x)", mer, x0, specs)

    eyes = jnp.eye(D.shape[-1])
    Dd = D + 1e-2 * jnp.einsum("bkii->bki", D)[..., None] * eyes + 1e-6 * eyes
    solv = jax.jit(jax.vmap(block_tridiag_solve))
    timeit("block_tridiag_solve (1x)", solv, Dd, L, g)

    from qtos_tpu.ops.pallas.btd import btd_solve_pallas

    try:
        timeit("btd_solve_pallas (1x)", lambda a, b, c: btd_solve_pallas(a, b, c), Dd, L, g)
    except Exception as e:  # noqa: BLE001
        print("pallas btd failed:", e)

    full = jax.jit(lambda s: solve_batch(s, terrain, cfg))
    timeit("full solve (16 iters)", full, specs, n=3)


if __name__ == "__main__":
    main()


def sub_profile():
    import functools
    B, K = 1024, 41
    terrain = make_terrain(["plane", "plane", "plane"])
    cfg = SolverConfig(max_iters=16)
    goals = jnp.linspace(0.3, 0.8, B)
    specs = jax.vmap(lambda g: default_spec(terrain, goal_xy=(g, 0.0), K=K))(goals)
    from qtos_tpu.solver.transcription import initial_guess
    from qtos_tpu.solver.solve import _aux
    from qtos_tpu.solver.jacobians import interval_system, knot_system

    x0 = jax.jit(jax.vmap(lambda s: initial_guess(s, terrain, cfg)))(specs)
    jax.block_until_ready(x0)

    def knots_only(x, spec):
        aux = _aux(spec, terrain, cfg)
        return jax.vmap(lambda xk, a: knot_system(xk, a, spec, terrain, cfg))(x, aux)

    def ints_only(x, spec):
        return jax.vmap(
            lambda a, b, ca, cb: interval_system(a, b, ca, cb, spec, cfg)
        )(x[:-1], x[1:], spec.schedule.contact[:-1], spec.schedule.contact[1:])

    kf = jax.jit(jax.vmap(knots_only))
    rho_k, Jk = timeit("knot_system vmap", kf, x0, specs)
    itf = jax.jit(jax.vmap(ints_only))
    rho_i, Ja, Jb = timeit("interval_system vmap", itf, x0, specs)

    @jax.jit
    def eins(Jk, Ja, Jb, rho_k, rho_i):
        D = jnp.einsum("bkmi,bkmj->bkij", Jk, Jk)
        D = D.at[:, :-1].add(jnp.einsum("bkmi,bkmj->bkij", Ja, Ja))
        D = D.at[:, 1:].add(jnp.einsum("bkmi,bkmj->bkij", Jb, Jb))
        L = jnp.einsum("bkmi,bkmj->bkij", Jb, Ja)
        g = jnp.einsum("bkmi,bkm->bki", Jk, rho_k)
        g = g.at[:, :-1].add(jnp.einsum("bkmi,bkm->bki", Ja, rho_i))
        g = g.at[:, 1:].add(jnp.einsum("bkmi,bkm->bki", Jb, rho_i))
        return D, L, g

    timeit("normal-eq einsums", eins, Jk, Ja, Jb, rho_k, rho_i)
    print("Jk", Jk.shape, "Ja", Ja.shape)


sub_profile()
