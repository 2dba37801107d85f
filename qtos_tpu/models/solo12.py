"""Analytic SOLO12 kinematics + single-rigid-body constants, pure JAX.

Replaces the reference's dual IK path — PyBullet ``calculateInverseKinematics``
(reference: QTOS/robot/robot.py:372-418) plus Pinocchio frame-Jacobian
differential IK (robot.py:420-525) — with closed-form FK/IK and autodiff
Jacobians that vmap over legs, timesteps, and scenarios.

Kinematic parameters from the reference URDF (data/urdf/solo12.urdf):
  base -> HAA   : (+-0.1946, +-0.0875, 0), axis x
  HAA  -> HFE   : (0, +-0.014, 0), axis y
  HFE  -> KFE   : (0, +-0.03745, -0.16), axis y
  KFE  -> FOOT  : (0, +-0.008, -0.16) (fixed ankle)

Leg order everywhere: [FL, FR, HL, HR] — matching the 37-column trajectory
schema (reference: QTOS/utils.py:107-148 ``vec_to_cmd_pose``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qtos_tpu.ops.rotations import euler_to_rot

LEG_NAMES = ("FL", "FR", "HL", "HR")

_HIP_X = 0.1946
_HIP_Y = 0.0875
_Y1 = 0.014
_Y2 = 0.03745
_Y3 = 0.008
_L_UP = 0.16
_L_LOW = 0.16

# Per-leg signs: x (front/hind), y (left/right).
_FH = jnp.array([1.0, 1.0, -1.0, -1.0])
_LR = jnp.array([1.0, -1.0, 1.0, -1.0])
# Knee bend direction matching q_init in data/config/solo12.yml (front knees
# flex negative, hind positive).
_KNEE_SIGN = jnp.array([-1.0, -1.0, 1.0, 1.0])


class Solo12:
    """Stateless model namespace; all methods are jit/vmap-safe functions."""

    n_legs = 4
    n_joints = 12
    # SRB mass: TOWR's effective single-rigid-body mass, identified from the
    # reference's own golden trajectory (data/traj/towr.csv): mean total fz/g
    # = 3.0026 kg; least-squares fit of m over all axes of m(a-g)=Σf gives
    # 2.987 kg (see tests/test_towr_deviation.py).  The yml `mass: 1.16115091`
    # (solo12.yml:12) is only the URDF's commented-out dummy base-link mass;
    # the real URDF links total 3.84 kg.  Using TOWR's 3.0 keeps solver+sim
    # consistent AND makes the quantitative deviation gate meaningful.
    mass = 3.0
    # Diagonal inertia from the reference yml (solo12.yml:13-19).  Regressing
    # TOWR's effective inertia from the golden trajectory's angular dynamics is
    # ill-conditioned (spline angular accelerations are FD-noise dominated; the
    # fit returns non-physical negatives for pitch/yaw), so the yml values are
    # retained — the dynamics residual is dominated by the linear SRB terms.
    inertia = jnp.diag(jnp.array([0.00578574, 0.01938108, 0.02476124]))
    inertia_inv = jnp.diag(1.0 / jnp.array([0.00578574, 0.01938108, 0.02476124]))
    stand_height = 0.24          # default CoM height (reference: scripts/main.py:111)
    # Nominal stance feet in base frame (reference: scripts/main.py:112-115).
    nominal_feet = jnp.array(
        [
            [0.21, 0.19, -0.24],
            [0.21, -0.19, -0.24],
            [-0.21, 0.19, -0.24],
            [-0.21, -0.19, -0.24],
        ]
    )
    q_init = jnp.array(
        [0.008, 0.38, -0.845, -0.008, 0.38, -0.845,
         0.0082, -0.38, 0.845, -0.0082, -0.38, 0.845]
    )  # reference: data/config/solo12.yml q_init (HR hip entry there is a typo -0.082)

    @staticmethod
    def hip_positions() -> jax.Array:
        """(4, 3) HAA joint origins in base frame."""
        return jnp.stack([_FH * _HIP_X, _LR * _HIP_Y, jnp.zeros(4)], axis=-1)

    # ------------------------------------------------------------------
    # Forward kinematics
    # ------------------------------------------------------------------

    @staticmethod
    def leg_fk(q_leg: jax.Array, leg: jax.Array) -> jax.Array:
        """Foot position in base frame for one leg.

        Args:
          q_leg: (..., 3) joint angles (HAA, HFE, KFE).
          leg: integer leg index (traced or static).
        Returns:
          (..., 3) foot position in base frame.
        """
        s = _LR[leg]
        f = _FH[leg]
        q0, q1, q2 = q_leg[..., 0], q_leg[..., 1], q_leg[..., 2]
        # Chain in the sagittal (x, z) plane driven by q1, q2.
        x3 = -_L_LOW * jnp.sin(q1 + q2)
        z3 = -_L_LOW * jnp.cos(q1 + q2)
        x = -_L_UP * jnp.sin(q1) + x3
        z = -_L_UP * jnp.cos(q1) + z3
        y = s * (_Y1 + _Y2 + _Y3) * jnp.ones_like(x)
        # Roll about x by q0.
        c0, s0 = jnp.cos(q0), jnp.sin(q0)
        yb = c0 * y - s0 * z
        zb = s0 * y + c0 * z
        hip = jnp.stack(
            [f * _HIP_X * jnp.ones_like(x), s * _HIP_Y * jnp.ones_like(x), jnp.zeros_like(x)],
            -1,
        )
        return hip + jnp.stack([x, yb, zb], -1)

    @staticmethod
    def fk(q: jax.Array) -> jax.Array:
        """(..., 12) joints -> (..., 4, 3) feet in base frame."""
        qs = q.reshape(q.shape[:-1] + (4, 3))
        feet = [Solo12.leg_fk(qs[..., i, :], i) for i in range(4)]
        return jnp.stack(feet, axis=-2)

    @staticmethod
    def fk_world(q: jax.Array, base_pos: jax.Array, base_eul: jax.Array) -> jax.Array:
        """Feet in world frame given base pose (euler orientation)."""
        R = euler_to_rot(base_eul)
        feet_b = Solo12.fk(q)
        return base_pos[..., None, :] + jnp.einsum("...ij,...kj->...ki", R, feet_b)

    # ------------------------------------------------------------------
    # Inverse kinematics (closed form)
    # ------------------------------------------------------------------

    @staticmethod
    def leg_ik(p_base: jax.Array, leg: jax.Array) -> jax.Array:
        """Closed-form IK for one leg.

        Args:
          p_base: (..., 3) desired foot position in base frame.
          leg: leg index.
        Returns:
          (..., 3) joint angles (HAA, HFE, KFE); clips unreachable targets to
          the workspace boundary rather than returning NaN.
        """
        s = _LR[leg]
        f = _FH[leg]
        d = s * (_Y1 + _Y2 + _Y3)
        v = p_base - jnp.stack(
            [
                f * _HIP_X * jnp.ones_like(p_base[..., 0]),
                s * _HIP_Y * jnp.ones_like(p_base[..., 0]),
                jnp.zeros_like(p_base[..., 0]),
            ],
            -1,
        )
        vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
        r2 = vy * vy + vz * vz
        r = jnp.sqrt(jnp.maximum(r2, d * d + 1e-10))
        zeta = jnp.sqrt(jnp.maximum(r2 - d * d, 1e-10))
        alpha = jnp.arctan2(vz, vy)
        beta = jnp.arctan2(-zeta, d * jnp.ones_like(zeta))
        q0 = alpha - beta
        # Wrap to [-pi, pi].
        q0 = jnp.arctan2(jnp.sin(q0), jnp.cos(q0))

        # Planar 2R in sagittal plane: target (vx, -zeta).
        px, pz = vx, -zeta
        l1, l2 = _L_UP, _L_LOW
        c2 = (px * px + pz * pz - l1 * l1 - l2 * l2) / (2 * l1 * l2)
        c2 = jnp.clip(c2, -1.0, 1.0)
        q2 = _KNEE_SIGN[leg] * jnp.arccos(c2)
        k1 = l1 + l2 * jnp.cos(q2)
        k2 = l2 * jnp.sin(q2)
        q1 = jnp.arctan2(-px, -pz) - jnp.arctan2(k2, k1)
        q1 = jnp.arctan2(jnp.sin(q1), jnp.cos(q1))
        del r
        return jnp.stack([q0, q1, q2], -1)

    @staticmethod
    def ik(feet_base: jax.Array) -> jax.Array:
        """(..., 4, 3) feet in base frame -> (..., 12) joint angles."""
        qs = [Solo12.leg_ik(feet_base[..., i, :], i) for i in range(4)]
        return jnp.concatenate(qs, axis=-1)

    @staticmethod
    def ik_world(feet_world: jax.Array, base_pos: jax.Array, base_eul: jax.Array) -> jax.Array:
        """World-frame feet targets -> joints, via the live base pose (the
        role of ``trajectory_2_world_frame`` + Bullet IK in the reference
        control loop, QTOS/utils.py:260-303 + robot.py:372-418)."""
        R = euler_to_rot(base_eul)
        feet_b = jnp.einsum("...ji,...kj->...ki", R, feet_world - base_pos[..., None, :])
        return Solo12.ik(feet_b)

    # ------------------------------------------------------------------
    # Jacobians / differential IK
    # ------------------------------------------------------------------

    @staticmethod
    def leg_jacobian(q_leg: jax.Array, leg: int) -> jax.Array:
        """(3, 3) foot Jacobian d p_base / d q_leg (autodiff; vmap for batches)."""
        return jax.jacfwd(lambda qq: Solo12.leg_fk(qq, leg))(q_leg)

    @staticmethod
    def jacobians(q: jax.Array) -> jax.Array:
        """(12,) -> (4, 3, 3) per-leg foot Jacobians."""
        qs = q.reshape(4, 3)
        return jnp.stack([Solo12.leg_jacobian(qs[i], i) for i in range(4)])

    @staticmethod
    def ik_dls(feet_base: jax.Array, q0: jax.Array, iters: int = 6, damping: float = 1e-4) -> jax.Array:
        """Damped-least-squares iterative IK (the Pinocchio-path analog,
        reference robot.py:493-525), used as a cross-check of the closed form.

        Args:
          feet_base: (4, 3) targets in base frame.
          q0: (12,) initial joints.
        """

        def body(_, q):
            err = feet_base - Solo12.fk(q)           # (4, 3)
            J = Solo12.jacobians(q)                   # (4, 3, 3)
            JT = jnp.swapaxes(J, -1, -2)
            A = J @ JT + damping * jnp.eye(3)
            dq = jnp.einsum("lij,lj->li", JT, jnp.linalg.solve(A, err[..., None])[..., 0])
            return q + dq.reshape(12)

        return jax.lax.fori_loop(0, iters, body, q0)
