#!/usr/bin/env python3
"""Microbench: BTD kernel v1 vs v2 at bench shapes. Dev tool, not a test."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.ops.pallas.btd import btd_solve_pallas_lanes
from qtos_tpu.ops.pallas.btd_v2 import btd_solve_pallas_lanes_v2


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
    D, L, b = jax.jit(make_system, static_argnums=(0, 1, 2))(B, K, n, jax.random.PRNGKey(0))
    jax.block_until_ready(D)

    x1 = timeit("v1 (128 lanes)", btd_solve_pallas_lanes, D, L, b)
    for lanes in (128, 256, 512):
        try:
            x2 = timeit(f"v2 ({lanes} lanes)", lambda d, l, bb, la=lanes: btd_solve_pallas_lanes_v2(d, l, bb, lanes=la), D, L, b)
            err = float(jnp.max(jnp.abs(x1 - x2)))
            print(f"   max |v1 - v2| = {err:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"v2 ({lanes} lanes) failed: {type(e).__name__}: {str(e)[:200]}")

    # correctness vs XLA reference
    from qtos_tpu.ops.tridiag import _block_tridiag_solve_lanes

    xr = jax.jit(_block_tridiag_solve_lanes)(D, L, b)
    print("max |v1 - ref| =", float(jnp.max(jnp.abs(x1 - xr))))


if __name__ == "__main__":
    main()
