"""Soft-contact rigid-body dynamics for SOLO12, fully jittable.

Model: 6-DOF base (SRB mass/inertia) + 12 torque-driven joints with reflected
leg inertia; penalty contact (spring-damper normal + smooth Coulomb friction)
between feet and the heightfield.  This is the physics verifier the reference
delegates to PyBullet (QTOS/simulation.py:66-100 heightfield collision,
robot.py joint motors); a JAX formulation lets entire episodes run on device
as one `lax.scan` and batch across scenarios.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.ops.rotations import quat_integrate, quat_to_rot, euler_to_quat, quat_to_euler
from qtos_tpu.terrain.heightfield import Terrain, height_at


@struct.dataclass
class SimParams:
    dt: float = struct.field(pytree_node=False, default=0.001)   # reference: simulation.yml TIMESTEPS 0.001
    contact_kp: float = 5000.0
    contact_kd: float = 80.0
    friction: float = 1.0       # reference: simulation.yml friction 1.0
    tangent_kp: float = 2500.0  # anchor-spring (stiction) stiffness
    tangent_kd: float = 40.0
    joint_inertia: float = 0.012
    joint_damping: float = 0.3   # trot-tuned; walk/pace use 0.5 (gait_control_params)
    # Whole-robot rotational inertia multiplier over the base-only SRB values
    # (the legs' masses at the hips dominate roll inertia: base-only Ixx
    # 0.0058 vs ~0.05 with legs — using base-only makes contact damping
    # unstable through the roll lever arms at dt=1ms).
    inertia_scale: float = 5.0
    # Base collision sphere radius (keeps a collapsed robot from sinking
    # through the terrain; PyBullet collides the full body mesh).
    base_radius: float = 0.05


@struct.dataclass
class SimState:
    pos: jax.Array      # (3,) base CoM world position
    quat: jax.Array     # (4,) base orientation (x, y, z, w)
    v: jax.Array        # (3,) base linear velocity
    w: jax.Array        # (3,) base angular velocity (world)
    q: jax.Array        # (12,) joint angles
    qd: jax.Array       # (12,) joint velocities
    anchor: jax.Array   # (4, 2) stiction anchor xy per foot (world)

    @property
    def eul(self):
        return quat_to_euler(self.quat)


def init_state(base_pos, base_eul, q) -> SimState:
    base_pos = jnp.asarray(base_pos, jnp.float32)
    base_eul = jnp.asarray(base_eul, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    feet_w = Solo12.fk_world(q, base_pos, base_eul)
    return SimState(
        pos=base_pos,
        quat=euler_to_quat(base_eul),
        v=jnp.zeros(3),
        w=jnp.zeros(3),
        q=q,
        qd=jnp.zeros(12),
        anchor=feet_w[:, :2],
    )


def foot_kinematics(state: SimState):
    """World positions and velocities of the 4 feet, plus leg Jacobians."""
    R = quat_to_rot(state.quat)
    feet_b = Solo12.fk(state.q)                     # (4, 3)
    J = Solo12.jacobians(state.q)                   # (4, 3, 3)
    feet_w = state.pos + feet_b @ R.T
    arm_w = feet_b @ R.T                            # world lever arms
    qd_legs = state.qd.reshape(4, 3)
    v_joint = jnp.einsum("lij,lj->li", J, qd_legs)  # foot vel in base frame
    feet_vw = state.v + jnp.cross(state.w, arm_w) + v_joint @ R.T
    return feet_w, feet_vw, arm_w, J, R


def contact_forces(params: SimParams, terrain: Terrain, feet_w, feet_vw, anchor):
    """Penalty contact with stiction.

    Normal: spring-damper on penetration, Hunt-Crossley-style damping ramp so
    touchdown is not impulsive.  Tangential: spring to a per-foot anchor point
    (true static friction) saturated at the Coulomb cone; the anchor is
    projected back to the cone edge while sliding and reset out of contact.

    Returns (forces (4,3) world, new anchors (4,2)).
    """
    h = height_at(terrain, feet_w[:, 0], feet_w[:, 1])
    pen = h - feet_w[:, 2]
    active = pen > 0.0
    damp_gate = jnp.clip(pen / 0.003, 0.0, 1.0)
    fn = jnp.where(
        active,
        params.contact_kp * pen - params.contact_kd * damp_gate * feet_vw[:, 2],
        0.0,
    )
    fn = jnp.clip(fn, 0.0, 200.0)

    vt = feet_vw[:, :2]
    ft_raw = -params.tangent_kp * (feet_w[:, :2] - anchor) - params.tangent_kd * vt
    ft_raw = jnp.where(active[:, None], ft_raw, 0.0)
    ft_mag = jnp.linalg.norm(ft_raw, axis=-1, keepdims=True)
    limit = params.friction * fn[:, None]
    scale = jnp.minimum(1.0, limit / jnp.maximum(ft_mag, 1e-9))
    ft = ft_raw * scale

    # anchor update: track foot when airborne; creep to cone edge when sliding
    sliding = (ft_mag[:, 0] > limit[:, 0] + 1e-9) & active
    anchor_slide = feet_w[:, :2] + (ft + params.tangent_kd * vt) / params.tangent_kp
    new_anchor = jnp.where(
        active[:, None],
        jnp.where(sliding[:, None], anchor_slide, anchor),
        feet_w[:, :2],
    )
    return jnp.concatenate([ft, fn[:, None]], axis=-1), new_anchor


@functools.partial(jax.jit, static_argnames=())
def sim_step(state: SimState, tau: jax.Array, terrain: Terrain, params: SimParams) -> SimState:
    """One semi-implicit Euler step at params.dt under motor torques tau (12,)."""
    feet_w, feet_vw, arm_w, J, R = foot_kinematics(state)
    f_c, new_anchor = contact_forces(params, terrain, feet_w, feet_vw, state.anchor)

    # Base wrench (feet contact + gravity + base collision sphere).
    h_base = height_at(terrain, state.pos[0], state.pos[1])
    pen_base = h_base + params.base_radius - state.pos[2]
    f_base_z = jnp.clip(
        jnp.where(
            pen_base > 0.0,
            params.contact_kp * pen_base - params.contact_kd * state.v[2],
            0.0,
        ),
        0.0,
        200.0,
    )
    F = (
        jnp.sum(f_c, axis=0)
        + Solo12.mass * jnp.array([0.0, 0.0, -9.81])
        + jnp.array([0.0, 0.0, 1.0]) * f_base_z
    )
    T = jnp.sum(jnp.cross(arm_w, f_c), axis=0)
    I_w = params.inertia_scale * (R @ Solo12.inertia @ R.T)
    I_w_inv = (R @ Solo12.inertia_inv @ R.T) / params.inertia_scale
    a = F / Solo12.mass
    wd = I_w_inv @ (T - jnp.cross(state.w, I_w @ state.w))

    # Joint dynamics: motor + contact reaction through the leg Jacobian.
    f_b = f_c @ R                                           # world -> base frame
    tau_c = jnp.einsum("lji,lj->li", J, f_b).reshape(12)
    qdd = (tau + tau_c - params.joint_damping * state.qd) / params.joint_inertia

    dt = params.dt
    v_new = state.v + dt * a
    w_new = state.w + dt * wd
    qd_new = state.qd + dt * qdd
    return SimState(
        pos=state.pos + dt * v_new,
        quat=quat_integrate(state.quat, w_new, dt),
        v=v_new,
        w=w_new,
        q=state.q + dt * qd_new,
        qd=qd_new,
        anchor=new_anchor,
    )


@functools.partial(jax.jit, static_argnames=("n_steps",))
def rollout(state: SimState, tau_seq: jax.Array, terrain: Terrain, params: SimParams, n_steps: int):
    """Scan n_steps of fixed torque sequence (T, 12). Returns final state + CoM trace."""

    def tick(s, tau):
        s2 = sim_step(s, tau, terrain, params)
        return s2, s2.pos

    return jax.lax.scan(tick, state, tau_seq[:n_steps])
