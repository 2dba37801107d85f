"""PD-to-torque motor model.

Mirrors the contract of the reference's MotorModel (QTOS/robot/robot_motor.py:
30-110, constants adapted there from google-research/motion_imitation):
per-joint PD with hip/knee/ankle gain scaling and a hard clip at the observed
torque limit (t_max = 8.0 in data/config/solo12.yml).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MotorParams:
    # Defaults retuned for this engine's explicit joint model; the reference's
    # PyBullet-tuned values (kp 20, kd 0.08 — solo12.yml) are far underdamped
    # here because Bullet adds implicit joint stabilization.  These are the
    # TROT-tuned values; slower gaits use heavier damping via
    # control.loop.gait_control_params (the reference likewise retunes gains
    # per gait — MotorModel.UPDATE_GAIT, robot_motor.py:111).
    kp: float = 60.0
    kd: float = 1.2
    t_max: float = 8.0          # reference: solo12.yml t_max
    hip_scale: float = 1.0      # reference: solo12.yml *_gain_scale
    knee_scale: float = 1.0
    ankle_scale: float = 1.0

    def gain_vector(self) -> jax.Array:
        g = jnp.array([self.hip_scale, self.knee_scale, self.ankle_scale])
        return jnp.tile(g, 4)


def pd_torque(
    params: MotorParams,
    q_des: jax.Array,
    qd_des: jax.Array,
    q: jax.Array,
    qd: jax.Array,
    tau_ff: jax.Array | None = None,
) -> jax.Array:
    """(12,) desired/actual joints -> clipped motor torques.

    reference: robot_motor.py:64-110 (convert_to_torque / _ff variants)."""
    scale = params.gain_vector()
    tau = params.kp * scale * (q_des - q) + params.kd * scale * (qd_des - qd)
    if tau_ff is not None:
        tau = tau + tau_ff
    return jnp.clip(tau, -params.t_max, params.t_max)
