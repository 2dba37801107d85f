import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtos_tpu.ops import rotations as rot
from qtos_tpu.ops import splines as sp
from qtos_tpu.ops.tridiag import block_tridiag_matvec, block_tridiag_solve


def test_euler_rot_roundtrip():
    rng = np.random.default_rng(0)
    eul = jnp.asarray(rng.uniform(-1.2, 1.2, size=(64, 3)), jnp.float32)
    R = rot.euler_to_rot(eul)
    back = rot.rot_to_euler(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(eul), atol=1e-5)
    # orthonormality
    I = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(3), I.shape), atol=1e-5)


def test_euler_rate_omega_consistency():
    """omega from euler_rate_matrix matches finite-difference of R."""
    eul = jnp.array([0.3, -0.2, 0.7])
    eul_dot = jnp.array([0.11, -0.4, 0.25])
    eps = 1e-4
    R0 = rot.euler_to_rot(eul)
    R1 = rot.euler_to_rot(eul + eps * eul_dot)
    Omega = (R1 - R0) / eps @ R0.T  # skew(omega_world)
    w_fd = jnp.array([Omega[2, 1], Omega[0, 2], Omega[1, 0]])
    w = rot.euler_rate_to_omega(eul, eul_dot)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_fd), atol=1e-2)
    # inverse map round-trips
    back = rot.omega_to_euler_rate(eul, w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(eul_dot), atol=1e-5)


def test_quat_matches_euler():
    eul = jnp.array([[0.2, -0.4, 1.1], [0.0, 0.0, 0.0]])
    Rq = rot.quat_to_rot(rot.euler_to_quat(eul))
    Re = rot.euler_to_rot(eul)
    np.testing.assert_allclose(np.asarray(Rq), np.asarray(Re), atol=1e-6)


def test_quat_integrate_matches_rotation():
    q = rot.quat_identity()
    w = jnp.array([0.0, 0.0, 1.0])
    dt = 0.001
    for _ in range(100):
        q = rot.quat_integrate(q, w, dt)
    eul = rot.quat_to_euler(q)
    np.testing.assert_allclose(float(eul[2]), 0.1, atol=1e-5)


def test_hermite_endpoint_and_derivative():
    x0 = jnp.array([0.0, 1.0])
    x1 = jnp.array([1.0, -1.0])
    v0 = jnp.array([0.5, 0.0])
    v1 = jnp.array([0.0, 2.0])
    dt = 0.2
    p0, vel0, _ = sp.hermite_eval(x0, x1, v0, v1, dt, jnp.array(0.0))
    p1, vel1, _ = sp.hermite_eval(x0, x1, v0, v1, dt, jnp.array(1.0))
    np.testing.assert_allclose(np.asarray(p0), np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(x1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel0), np.asarray(v0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vel1), np.asarray(v1), atol=1e-5)


def test_hermite_sampling_consistency():
    """Sampled velocity ~ finite difference of sampled position."""
    K, d = 9, 3
    rng = np.random.default_rng(1)
    kx = jnp.asarray(rng.normal(size=(K, d)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(K, d)), jnp.float32)
    dt = 0.1
    t = jnp.linspace(0.0, (K - 1) * dt, 500)
    pos, vel, _ = sp.sample_knots(kx, kv, dt, t)
    fd = (np.asarray(pos[2:]) - np.asarray(pos[:-2])) / (2 * float(t[1] - t[0]))
    # Central differences are only second-order accurate away from knot
    # boundaries (acceleration jumps there for a C1 spline).
    tt = np.asarray(t[1:-1]) / dt
    interior = np.abs(tt - np.round(tt)) > 0.02
    np.testing.assert_allclose(np.asarray(vel[1:-1])[interior], fd[interior], atol=5e-2)


def test_natural_cubic_matches_scipy():
    from scipy.interpolate import CubicSpline

    x = np.linspace(0, 4, 9)
    y = np.sin(x) + 0.1 * x**2
    m = sp.natural_cubic_coeffs(jnp.asarray(y, jnp.float32), float(x[1] - x[0]))
    xq = np.linspace(0, 4, 57)
    val, _ = sp.natural_cubic_eval(
        jnp.asarray(y, jnp.float32), m, float(x[1] - x[0]), 0.0, jnp.asarray(xq, jnp.float32)
    )
    ref = CubicSpline(x, y, bc_type="natural")(xq)
    np.testing.assert_allclose(np.asarray(val), ref, atol=2e-4)


@pytest.mark.parametrize("K,n", [(5, 4), (20, 8)])
def test_block_tridiag_solve(K, n):
    rng = np.random.default_rng(2)
    A = rng.normal(size=(K, n, n)).astype(np.float32)
    D = jnp.asarray(A @ A.transpose(0, 2, 1) + 5.0 * np.eye(n, dtype=np.float32)[None])
    L = jnp.asarray(0.3 * rng.normal(size=(K - 1, n, n)).astype(np.float32))
    x_true = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32))
    b = block_tridiag_matvec(D, L, x_true)
    x = block_tridiag_solve(D, L, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=2e-3)


def test_block_tridiag_vmap_batch():
    rng = np.random.default_rng(3)
    B, K, n = 4, 7, 6
    A = rng.normal(size=(B, K, n, n)).astype(np.float32)
    D = jnp.asarray(A @ A.transpose(0, 1, 3, 2) + 4.0 * np.eye(n, dtype=np.float32))
    L = jnp.asarray(0.2 * rng.normal(size=(B, K - 1, n, n)).astype(np.float32))
    xt = jnp.asarray(rng.normal(size=(B, K, n)).astype(np.float32))
    b = jax.vmap(block_tridiag_matvec)(D, L, xt)
    x = jax.vmap(block_tridiag_solve)(D, L, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xt), atol=2e-3)
