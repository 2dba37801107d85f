"""SO(3) utilities, batched-first and fully jittable.

Conventions
-----------
Euler angles are ``(roll, pitch, yaw)`` with the world-frame rotation

    R = Rz(yaw) @ Ry(pitch) @ Rx(roll)

matching the reference stack's TOWR CSV base-orientation columns
(reference: QTOS/utils.py:107-148 decodes ``COM[3:6]`` as euler angles and
QTOS/utils.py:173-210 builds the same Rz·Ry·Rx transform).

Quaternions are ``(x, y, z, w)`` (scalar last), matching the reference's
PyBullet convention (QTOS/robot/robot.py state dicts).

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rx(a: jax.Array) -> jax.Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def ry(a: jax.Array) -> jax.Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rz(a: jax.Array) -> jax.Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def euler_to_rot(eul: jax.Array) -> jax.Array:
    """(..., 3) euler (roll, pitch, yaw) -> (..., 3, 3) rotation matrix."""
    roll, pitch, yaw = eul[..., 0], eul[..., 1], eul[..., 2]
    return rz(yaw) @ ry(pitch) @ rx(roll)


def rot_to_euler(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3) euler (roll, pitch, yaw). Safe near gimbal lock."""
    sy = -R[..., 2, 0]
    cy = jnp.sqrt(jnp.clip(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2, 1e-12))
    pitch = jnp.arctan2(sy, cy)
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], -1)


def euler_rate_matrix(eul: jax.Array) -> jax.Array:
    """C(eul) with world angular velocity  w = C @ eul_dot.

    Columns are the world-frame axes each euler rate rotates about:
    roll about Rz·Ry·x̂, pitch about Rz·ŷ, yaw about ẑ.
    """
    roll, pitch, yaw = eul[..., 0], eul[..., 1], eul[..., 2]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(roll)
    o = jnp.ones_like(roll)
    return jnp.stack(
        [
            jnp.stack([cy * cp, -sy, z], -1),
            jnp.stack([sy * cp, cy, z], -1),
            jnp.stack([-sp, z, o], -1),
        ],
        -2,
    )


def euler_rate_matrix_inv(eul: jax.Array) -> jax.Array:
    """Closed-form C(eul)^-1 (XLA's generic 3x3 LU solve is ~5x slower on TPU)."""
    pitch, yaw = eul[..., 1], eul[..., 2]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(cp)
    inv_cp = 1.0 / jnp.where(jnp.abs(cp) < 1e-6, jnp.sign(cp) * 1e-6 + (cp == 0) * 1e-6, cp)
    return jnp.stack(
        [
            jnp.stack([cy * inv_cp, sy * inv_cp, z], -1),
            jnp.stack([-sy, cy, z], -1),
            jnp.stack([cy * sp * inv_cp, sy * sp * inv_cp, jnp.ones_like(cp)], -1),
        ],
        -2,
    )


def omega_to_euler_rate(eul: jax.Array, omega: jax.Array) -> jax.Array:
    """World angular velocity -> euler rates: eul_dot = C(eul)^-1 @ w."""
    return (euler_rate_matrix_inv(eul) @ omega[..., None])[..., 0]


def euler_rate_to_omega(eul: jax.Array, eul_dot: jax.Array) -> jax.Array:
    """Euler rates -> world angular velocity."""
    return (euler_rate_matrix(eul) @ eul_dot[..., None])[..., 0]


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], -1),
            jnp.stack([z, o, -x], -1),
            jnp.stack([-y, x, o], -1),
        ],
        -2,
    )


# ---------------------------------------------------------------------------
# Quaternions (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_identity() -> jax.Array:
    return jnp.array([0.0, 0.0, 0.0, 1.0])


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        -1,
    )


def quat_to_rot(q: jax.Array) -> jax.Array:
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 1e-12, 2.0 / n, 0.0)
    xx, yy, zz = x * x * s, y * y * s, z * z * s
    xy, xz, yz = x * y * s, x * z * s, y * z * s
    wx, wy, wz = w * x * s, w * y * s, w * z * s
    o = jnp.ones_like(x)
    return jnp.stack(
        [
            jnp.stack([o - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, o - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, o - (xx + yy)], -1),
        ],
        -2,
    )


def euler_to_quat(eul: jax.Array) -> jax.Array:
    r, p, y = eul[..., 0] * 0.5, eul[..., 1] * 0.5, eul[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        -1,
    )


def quat_to_euler(q: jax.Array) -> jax.Array:
    return rot_to_euler(quat_to_rot(q))


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by world angular velocity over dt (exact map)."""
    ang = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * ang * dt
    axis = omega_world / jnp.maximum(ang, 1e-9)
    dq = jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)
    out = quat_mul(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
