"""The 1 kHz control loop as one XLA computation.

Per tick (reference: scripts/run.py:166-221): take the next trajectory row,
re-express the planned feet in the live base frame (the ``towr_transform`` of
QTOS/utils.py:412-436, including its ``ee_shift`` z offset), run IK, PD motor
model, and step the physics.  The reference does this in Python at wall-clock
1 kHz against PyBullet; here the whole episode is a `lax.scan` over the table,
so a multi-second run is one device call — and batches over scenarios.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.ops.rotations import euler_to_rot
from qtos_tpu.sim.engine import SimParams, SimState, init_state, sim_step
from qtos_tpu.sim.motor import MotorParams, pd_torque
from qtos_tpu.terrain.heightfield import Terrain


@struct.dataclass
class ControlParams:
    motor: MotorParams = struct.field(default_factory=MotorParams)
    sim: SimParams = struct.field(default_factory=SimParams)
    # z offset applied to planned feet in the base frame. The reference uses
    # 0.015 (utils.py:412 towr_transform) to compensate Bullet's foot-sphere
    # radius; our engine has point feet, so the default is 0.
    ee_shift: float = 0.0
    use_force_ff: bool = struct.field(pytree_node=False, default=True)
    # "live": re-express planned feet in the live base frame (the reference's
    # towr_transform semantics — tolerates base lag, never corrects it).
    # "hybrid" (default): live-frame targets PLUS a clipped proportional
    # correction of the world-frame base error — the live conveyor keeps
    # driving the gait while drift is steered out through foot placement.
    # "plan": track planned world-frame feet against the live base pose —
    # removes the live-frame drive entirely and diverges; kept for study.
    frame: str = struct.field(pytree_node=False, default="hybrid")
    # Proportional gain on the world-frame base error in "hybrid"/"plan"
    # modes (fraction of the error fed back into foot targets per tick).
    # Tuned on the exp_1 continuous run: 0.5 -> avg_com_err_per_s 47.5 (vs
    # 98.8 uncorrected "live", and the reference's own logged ~60); >=2.0
    # destabilizes.
    base_corr: float = 0.5
    # Per-axis cap on the hybrid correction shift [m] — the stabilizer that
    # keeps corrected targets inside the leg workspace no matter the drift.
    max_corr: float = 0.04
    # Time constant [s] of the low-pass filter on the per-foot correction:
    # the stance/swing split flips each foot's correction sign at contact
    # transitions, and feeding that step change straight into the joint
    # targets excites slip/oscillation; filtering it removes the chatter.
    corr_tau: float = 0.05
    # Capture-point velocity feedback [s] on swing-foot touchdown: swing
    # targets shift by vel_corr * low-passed (v_live - v_plan) in xy, landing
    # "ahead of the fall" to arrest drift RATE (Raibert/capture-point
    # heuristic, sqrt(h/g) ~ 0.156 s for a 0.24 m stand height).  The
    # low-pass (vel_tau) keeps the gait's own cyclic sway out of the
    # touchdown placement — only sustained drift feeds back.
    # 0 for trot (its cyclic sway couples badly into touchdown placement even
    # low-passed — measured err/s 29.7 -> 237 on exp_1); 0.15 for the slower
    # gaits, where it is a clear win (walk canary err/s 8.4 -> 7.6).
    vel_corr: float = 0.0
    vel_tau: float = 0.3
    # Heading feedback: fraction of the (wrapped) live-vs-plan yaw error fed
    # into the foot targets per tick — planted feet get their base-frame
    # targets rotated by +yawc about z (levering the base heading back onto
    # the plan), swing feet by -yawc (touching down at the absolute planned
    # bearings).  Without this the yaw direction is UNOBSERVED by the
    # controller: heading error integrates freely and the robot veers off
    # laterally over long stitched runs (measured: yaw +61 deg after 4
    # windows on flat ground).  Default 0: the primary heading loop is the
    # REPLAN-level yaw reset (each window starts from the measured heading
    # and the spine goal-yaw plans the turn-back — replan.py drift handling);
    # tick-level yaw feedback measurably degrades short-window tracking
    # (err/s 28.9 -> 45-80 at gains 0.5-1.0) because foot-placement yaw
    # torques interfere with the gait, so it is kept only as an option.
    yaw_corr: float = 0.0
    # Cap on the applied yaw correction [rad].
    max_yaw_corr: float = 0.2
    # Low-pass time constant [s] on the yaw error: the trot's own cyclic yaw
    # sway (~0.5 s period) must not feed back into foot placement — only
    # sustained heading drift does (same reasoning as vel_tau).
    yaw_tau: float = 0.4


@struct.dataclass
class TrackingMetrics:
    """Per-episode tracking series (reference: QTOS/tracking.py:90-200).

    Carries the realized CoM/feet trajectories so the host can render the
    reference's four tracking plots (CoM track, per-foot ref-vs-sim panels,
    error, error-vs-distance — QTOS/tracking.py:202-401) with real data."""

    com_err: jax.Array        # (T,) per-tick CoM L2 error vs plan
    ee_err: jax.Array         # (T,) mean foot L2 error vs plan
    cum_com_err: jax.Array    # () cumulative CoM error
    avg_com_err_per_s: jax.Array  # () the reference's headline metric (x1000 scale)
    pos: jax.Array            # (T, 3) realized CoM positions
    feet: jax.Array           # (T, 4, 3) realized world foot positions
    yaw: jax.Array            # (T,) realized base yaw (heading-drift estimation)


def gait_control_params(gait: str) -> ControlParams:
    """Per-gait controller tuning (reference analog: MotorModel.UPDATE_GAIT —
    QTOS/robot/robot_motor.py:111 also swaps gain sets by gait).

    Trot runs the light-damping set it was tuned with (exp_1 continuous:
    err/s 29.7 vs the reference's ~60).  The slower lateral-sequence gaits
    need heavier joint damping plus capture-point touchdown feedback: at the
    trot settings the walk gait pumps a growing bounce across stitched
    windows and falls (err/s 258); with this set it reaches its goal at
    err/s ~8."""
    if gait in ("walk", "pace", "bound", "stand"):
        return ControlParams(
            motor=MotorParams(kd=2.0),
            sim=SimParams(joint_damping=0.5),
            vel_corr=0.15,
        )
    # trot: heading feedback at the gains that carried exp_9 to its 11.5 m
    # goal (sweep: reset 0.3 + ctrl 0.3/tau 0.4 -> reached, err/s 76; ctrl
    # 0.7 or tau 0.2 -> aborted runs)
    return ControlParams(yaw_corr=0.3, yaw_tau=0.4)


def control_profile(name: str) -> ControlParams:
    """Named controller profiles selectable per experiment preset, on top of
    the per-gait defaults (gait_control_params).

    "stairs": the riser-crossing set — heavy joint damping kills the bounce
    the trot pumps against a step face, yaw feedback holds heading through
    the asymmetric-support phases.  Measured on the exp_6 staircase
    (rough_pace 12, three seeded starts): default trot set 1/3 runs reach
    the plateau; this set 3/3."""
    profiles = {
        "stairs": ControlParams(
            motor=MotorParams(kd=2.0),
            sim=SimParams(joint_damping=0.5),
            yaw_corr=0.3,
            yaw_tau=0.4,
        ),
    }
    try:
        return profiles[name]
    except KeyError as e:
        raise KeyError(f"unknown control profile {name!r}; known: {sorted(profiles)}") from e


def decode_row(row: jax.Array):
    """Decode one 37-col row (reference: QTOS/utils.py:107-148)."""
    return dict(
        t=row[0],
        r=row[1:4],
        eul=row[4:7],
        feet=row[7:19].reshape(4, 3),
        v=row[19:22],
        w=row[22:25],
        f=row[25:37].reshape(4, 3),
    )


def plan_joint_targets(row, params: ControlParams):
    """Planned joints for one row: towr_transform + IK (the hot per-tick math
    of the reference loop — utils.py:412-436 then robot.py:372-418)."""
    cmd = decode_row(row)
    R_plan = euler_to_rot(cmd["eul"])
    feet_b = (cmd["feet"] - cmd["r"]) @ R_plan    # R^T (p - r), rows
    feet_b = feet_b.at[:, 2].add(params.ee_shift)
    return Solo12.ik(feet_b), cmd


def _tick(carry, row, terrain: Terrain, params: ControlParams):
    state, q_des_prev, corr_filt, verr_filt, yerr_filt = carry
    q_des_plan, cmd = plan_joint_targets(row, params)
    qd_des = (q_des_plan - q_des_prev) / params.sim.dt

    if params.frame == "live":
        q_des = q_des_plan
    elif params.frame == "hybrid":
        # Clipped world-error steering, split by contact role: planted feet
        # get +err (their base-frame targets shift toward the drift, levering
        # the base back onto the plan), swing feet get -err in xy (so they
        # touch down at the ABSOLUTE planned spots instead of the drifted
        # ones).  The cap keeps corrected targets inside the leg workspace
        # under any drift; the per-foot low-pass removes the sign-flip step
        # at contact transitions.
        from qtos_tpu.ops.rotations import quat_to_rot

        R_plan = euler_to_rot(cmd["eul"])
        # The correction is a WORLD-frame intent applied through base-frame
        # IK targets, so it must be projected with the LIVE rotation: using
        # R_plan misdirects it under heading error (at 90 deg yaw error an
        # x-correction pushes y — a positive-feedback veer that blew up long
        # stitched runs).
        R_live = quat_to_rot(state.quat)
        err_w = state.pos - cmd["r"]
        corr_w = jnp.clip(params.base_corr * err_w, -params.max_corr, params.max_corr)
        corr_b = corr_w @ R_live                      # (3,)
        # capture-point velocity term: land swing feet AHEAD of the drift
        verr_w = (state.v - cmd["v"]) * jnp.array([1.0, 1.0, 0.0])
        beta = params.sim.dt / jnp.maximum(params.vel_tau, params.sim.dt)
        verr_filt = verr_filt + beta * (verr_w - verr_filt)
        cp_b = jnp.clip(params.vel_corr * verr_filt, -params.max_corr,
                        params.max_corr) @ R_live
        stance = (cmd["f"][:, 2] > 1.0)[:, None]      # planned contact
        # heading feedback: rotate base-frame targets about z by +-yawc
        yaw_diff = state.eul[2] - cmd["eul"][2]
        yaw_err = jnp.arctan2(jnp.sin(yaw_diff), jnp.cos(yaw_diff))
        gamma = params.sim.dt / jnp.maximum(params.yaw_tau, params.sim.dt)
        yerr_filt = yerr_filt + gamma * (yaw_err - yerr_filt)
        yawc = jnp.clip(params.yaw_corr * yerr_filt,
                        -params.max_yaw_corr, params.max_yaw_corr)
        feet_plan_b = (cmd["feet"] - cmd["r"]) @ R_plan

        def _rotz_delta(p, a):
            ca, sa = jnp.cos(a) - 1.0, jnp.sin(a)
            return jnp.stack(
                [ca * p[:, 0] - sa * p[:, 1],
                 sa * p[:, 0] + ca * p[:, 1],
                 jnp.zeros_like(p[:, 0])], axis=1)

        swing_delta = (-corr_b + cp_b)[None, :] * jnp.array([1.0, 1.0, 0.0])
        delta = jnp.where(
            stance,
            corr_b[None, :] + _rotz_delta(feet_plan_b, yawc),
            swing_delta + _rotz_delta(feet_plan_b, -yawc),
        )
        alpha = params.sim.dt / jnp.maximum(params.corr_tau, params.sim.dt)
        corr_filt = corr_filt + alpha * (delta - corr_filt)
        feet_b = (cmd["feet"] - cmd["r"]) @ R_plan + corr_filt
        feet_b = feet_b.at[:, 2].add(params.ee_shift)
        q_des = Solo12.ik(feet_b)
    else:
        # world-frame tracking: place feet at (lag-corrected) planned world
        # positions relative to the live base pose
        shift = (state.pos - cmd["r"]) * (1.0 - params.base_corr)
        feet_t = cmd["feet"] + shift
        from qtos_tpu.ops.rotations import quat_to_rot

        R_live = quat_to_rot(state.quat)
        feet_b = (feet_t - state.pos) @ R_live
        feet_b = feet_b.at[:, 2].add(params.ee_shift)
        q_des = Solo12.ik(feet_b)

    tau_ff = None
    if params.use_force_ff:
        # feedforward: tau = -J^T R^T f  (reaction to planned contact force)
        J = Solo12.jacobians(state.q)
        R = euler_to_rot(state.eul)
        f_b = cmd["f"] @ R
        tau_ff = -jnp.einsum("lji,lj->li", J, f_b).reshape(12)

    tau = pd_torque(params.motor, q_des, qd_des, state.q, state.qd, tau_ff)
    new_state = sim_step(state, tau, terrain, params.sim)

    com_err = jnp.linalg.norm(new_state.pos - cmd["r"])
    feet_w = Solo12.fk_world(new_state.q, new_state.pos, new_state.eul)
    ee_err = jnp.mean(jnp.linalg.norm(feet_w - cmd["feet"], axis=-1))
    out = dict(
        com_err=com_err,
        ee_err=ee_err,
        pos=new_state.pos,
        feet=feet_w,
        q=new_state.q,
        qd=new_state.qd,
        tau=tau,
        eul=new_state.eul,
    )
    return (new_state, q_des_plan, corr_filt, verr_filt, yerr_filt), out


def _scan_ticks(table, state0, terrain, params, n_valid=None):
    """Scan `_tick` over the table.  Ticks at index >= `n_valid` are no-ops
    (state carried through unchanged): the receding-horizon runner's exec
    chunk is a FIXED f_steps slice of the trajectory buffer, but in steady
    state only buffer_end - exec_idx < f_steps rows are final — without the
    mask the tail ticks would execute all-zero rows (CoM commanded to the
    origin -> IK clamped to the workspace boundary -> a max-torque kick at
    every stitch boundary, corrupting the carried sim state)."""
    q_des0, _ = plan_joint_targets(table[0], params)
    carry0 = (state0, q_des0, jnp.zeros((4, 3)), jnp.zeros(3), jnp.zeros(()))
    if n_valid is None:
        (final, *_), traces = jax.lax.scan(
            lambda c, r: _tick(c, r, terrain, params), carry0, table
        )
        return final, traces

    def step(c, xs):
        t, row = xs
        c_new, out = _tick(c, row, terrain, params)
        active = t < n_valid
        c_keep = jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, b, a), c, c_new
        )
        return c_keep, out

    ts = jnp.arange(table.shape[0])
    (final, *_), traces = jax.lax.scan(step, carry0, (ts, table))
    return final, traces


@functools.partial(jax.jit, static_argnames=())
def playback(
    table: jax.Array,
    state0: SimState,
    terrain: Terrain,
    params: ControlParams = ControlParams(),
    n_valid: jax.Array | None = None,
):
    """Run the control loop over a full (T, 37) table.

    `n_valid` (dynamic scalar, default all rows) freezes the sim for ticks at
    index >= n_valid — see `_scan_ticks`.  Returns (final_state,
    TrackingMetrics)."""
    final, tr = _scan_ticks(table, state0, terrain, params, n_valid)
    com_err, ee_err = tr["com_err"], tr["ee_err"]
    T = table.shape[0]
    n = T if n_valid is None else n_valid
    mask = jnp.arange(T) < n
    cum = jnp.sum(jnp.where(mask, com_err, 0.0))
    # reference metric: cumulative error / elapsed seconds, x1000
    avg_per_s = cum / jnp.maximum(n, 1) * 1000.0
    return final, TrackingMetrics(
        com_err=com_err, ee_err=ee_err, cum_com_err=cum, avg_com_err_per_s=avg_per_s,
        pos=tr["pos"], feet=tr["feet"], yaw=tr["eul"][:, 2],
    )


@functools.partial(jax.jit, static_argnames=("n_steps",))
def stance_warmup(
    state: SimState,
    terrain: Terrain,
    params: ControlParams = ControlParams(),
    n_steps: int = 500,
):
    """Hold the initial joint configuration under PD until contact settles
    (reference: scripts/run.py:151-163 stance phase, simulation.yml
    stance_period 500)."""
    q_hold = state.q

    def tick(s, _):
        tau = pd_torque(params.motor, q_hold, jnp.zeros(12), s.q, s.qd)
        return sim_step(s, tau, terrain, params.sim), None

    out, _ = jax.lax.scan(tick, state, None, length=n_steps)
    return out


@functools.partial(jax.jit, static_argnames=())
def playback_recorded(
    table: jax.Array,
    state0: SimState,
    terrain: Terrain,
    params: ControlParams = ControlParams(),
):
    """Like `playback` but also returns the realized joint traces — the
    hardware-replay capture of the reference's trajectory_record.py
    (csv_entry = 12 angles + 12 velocities + 12 torques, robot.py:118-125).
    Runs the SAME `_tick` controller as `playback`, so the recorded CSV is
    produced by exactly the controller whose tracking metrics are reported.

    Returns (final_state, TrackingMetrics, traces dict).
    """
    final, traces = _scan_ticks(table, state0, terrain, params)
    T = table.shape[0]
    cum = jnp.sum(traces["com_err"])
    metrics = TrackingMetrics(
        com_err=traces["com_err"],
        ee_err=traces["ee_err"],
        cum_com_err=cum,
        avg_com_err_per_s=cum / jnp.maximum(T, 1) * 1000.0,
        pos=traces["pos"],
        feet=traces["feet"],
        yaw=traces["eul"][:, 2],
    )
    return final, metrics, traces


def record_csv(traces: dict, path: str, copy_trajectory_pts: int = 1) -> None:
    """Write the hardware-replay CSV: rows of [q(12), qd(12), tau(12)], each
    duplicated `copy_trajectory_pts` times to bridge sim rate vs the 1 kHz
    hardware controller (reference: trajectory_record.py:235-239)."""
    import numpy as np

    q = np.asarray(traces["q"])
    qd = np.asarray(traces["qd"])
    tau = np.asarray(traces["tau"])
    rows = np.concatenate([q, qd, tau], axis=-1)
    if copy_trajectory_pts > 1:
        rows = np.repeat(rows, copy_trajectory_pts, axis=0)
    np.savetxt(path, rows, delimiter=",", fmt="%.6g")


def state_from_row(row, terrain: Terrain, params: ControlParams = ControlParams(), drop: float = 0.0) -> SimState:
    """Initialize the sim at a trajectory row (teleport-start, the analog of
    Simulation.start — reference QTOS/simulation.py:117-123).  Uses the same
    ee_shift as the loop so tick 0 starts with zero joint error."""
    cmd = decode_row(row)
    q, _ = plan_joint_targets(row, params)
    return init_state(cmd["r"] + jnp.array([0.0, 0.0, drop]), cmd["eul"], q)
