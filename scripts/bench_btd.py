#!/usr/bin/env python3
"""Microbench: the Pallas batch-on-lanes BTD kernel at bench shapes.

Dev tool, not a test.  A v2 kernel variant (fused substitution, wider lane
tiles) lived here through round 3; measured at the production shape
(B=1024, K=41, n=36) it was 1.5x SLOWER than v1 (0.067 vs 0.046 ms) and
failed to compile at 512 lanes, so it was deleted and v1 remains the one
production kernel (dispatched from qtos_tpu.solver.solve._lanes_linsolve).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qtos_tpu.ops.pallas.btd import btd_solve_pallas_lanes
from qtos_tpu.ops.tridiag import _block_tridiag_solve_lanes, block_tridiag_matvec


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt*1e3:9.3f} ms", flush=True)
    return out


def make_system(B, K, n, key):
    k1, k2, k3 = jax.random.split(key, 3)
    A = jax.random.normal(k1, (K, n, n, B)) * 0.3
    D = jnp.einsum("kijb,kljb->kilb", A, A) + 3.0 * jnp.eye(n)[None, :, :, None]
    L = jax.random.normal(k2, (K - 1, n, n, B)) * 0.2
    b = jax.random.normal(k3, (K, n, B))
    return D, L, b


def main():
    B, K, n = 1024, 41, 36
    D, L, b = jax.jit(make_system, static_argnums=(0, 1, 2))(
        B, K, n, jax.random.PRNGKey(0)
    )
    jax.block_until_ready(D)

    x1 = timeit("pallas lanes kernel", btd_solve_pallas_lanes, D, L, b)
    xr = timeit("XLA lanes reference", jax.jit(_block_tridiag_solve_lanes), D, L, b)
    print(f"   max |pallas - xla| = {float(jnp.max(jnp.abs(x1 - xr))):.3e}")

    # residual check against the operator
    i = 7
    r = block_tridiag_matvec(D[..., i], L[..., i], x1[..., i]) - b[..., i]
    print(f"   residual (scenario {i}) = {float(jnp.max(jnp.abs(r))):.3e}")


if __name__ == "__main__":
    main()
