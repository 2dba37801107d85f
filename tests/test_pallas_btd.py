"""Pallas block-tridiagonal kernel: interpreter-mode correctness on CPU.

(Real-hardware runs are exercised by bench.py; the kernel is numerically
identical in interpret mode.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtos_tpu.ops.pallas.btd import btd_solve_pallas
from qtos_tpu.ops.tridiag import block_tridiag_matvec


@pytest.mark.parametrize("B,K,n", [(3, 7, 12), (2, 5, 36), (1, 9, 5)])
def test_pallas_btd_matches_reference(B, K, n):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, K, n, n)).astype(np.float32)
    D = jnp.asarray(A @ A.transpose(0, 1, 3, 2) + (n + 8) * np.eye(n, dtype=np.float32))
    L = jnp.asarray(0.3 * rng.normal(size=(B, K - 1, n, n)).astype(np.float32))
    xt = jnp.asarray(rng.normal(size=(B, K, n)).astype(np.float32))
    b = jax.vmap(block_tridiag_matvec)(D, L, xt)
    x = btd_solve_pallas(D, L, b, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xt), atol=5e-4)


def test_pallas_btd_pads_batch_and_blocks():
    """Non-multiple-of-128 batch and non-multiple-of-8 block size both pad."""
    rng = np.random.default_rng(1)
    B, K, n = 5, 4, 6
    A = rng.normal(size=(B, K, n, n)).astype(np.float32)
    D = jnp.asarray(A @ A.transpose(0, 1, 3, 2) + 10 * np.eye(n, dtype=np.float32))
    L = jnp.asarray(0.2 * rng.normal(size=(B, K - 1, n, n)).astype(np.float32))
    xt = jnp.asarray(rng.normal(size=(B, K, n)).astype(np.float32))
    b = jax.vmap(block_tridiag_matvec)(D, L, xt)
    x = btd_solve_pallas(D, L, b, interpret=True)
    assert x.shape == (B, K, n)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xt), atol=5e-4)
