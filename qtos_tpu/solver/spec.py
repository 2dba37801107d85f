"""Problem specification for one gait-optimization window.

The reference serializes this over a CLI flag string into the Docker solver
(``-s -g -s_ang -s_vel -e1..-e4 -t -duration`` — reference: QTOS/utils.py:26,
scripts/main.py:111-121, QTOS/combiner.py:170-191).  Here it is a typed pytree
that batches: stack specs along a leading axis and vmap/pjit the solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.solver.gait import GaitSchedule, trot_schedule
from qtos_tpu.terrain.heightfield import Terrain, height_at


# State layout per knot: [r(3), eul(3), v(3), omega(3), feet(12), forces(12)]
NV = 36
IDX_R = slice(0, 3)
IDX_TH = slice(3, 6)
IDX_V = slice(6, 9)
IDX_W = slice(9, 12)
IDX_P = slice(12, 24)
IDX_F = slice(24, 36)
FORCE_SCALE = 5.0  # forces stored as f / FORCE_SCALE to condition the KKT blocks


@struct.dataclass
class RobotState:
    """Boundary state of the base + feet (world frame)."""

    r: jax.Array        # (3,) CoM position
    eul: jax.Array      # (3,) roll, pitch, yaw
    v: jax.Array        # (3,) CoM linear velocity
    omega: jax.Array    # (3,) world angular velocity
    feet: jax.Array     # (4, 3) foot positions

    @staticmethod
    def standing(xy=(0.0, 0.0), yaw: float = 0.0, terrain: Terrain | None = None,
                 height: float = Solo12.stand_height):
        """Canonical start (reference: scripts/main.py:111-117)."""
        x, y = xy
        feet = Solo12.nominal_feet.at[:, 2].set(0.0) + jnp.array([x, y, 0.0])
        if terrain is not None:
            hz = height_at(terrain, feet[:, 0], feet[:, 1])
            feet = feet.at[:, 2].set(hz)
            base_z = height_at(terrain, jnp.asarray(x), jnp.asarray(y)) + height
        else:
            base_z = jnp.asarray(height)
        return RobotState(
            r=jnp.array([x, y, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * base_z,
            eul=jnp.array([0.0, 0.0, yaw]),
            v=jnp.zeros(3),
            omega=jnp.zeros(3),
            feet=feet,
        )


@struct.dataclass
class Weights:
    """Residual weights (static hyperparameters)."""

    dyn_r: float = 20.0
    dyn_th: float = 20.0
    dyn_v: float = 4.0
    dyn_w: float = 2.0
    stat: float = 40.0          # stance feet do not move
    terr: float = 60.0          # stance feet on terrain surface
    fzero: float = 20.0         # swing feet carry no force (scaled force units)
    init: float = 60.0
    goal: float = 8.0
    fric: float = 10.0          # friction pyramid hinge
    rom: float = 25.0           # kinematic box hinge
    clear: float = 15.0         # swing apex shaping
    body: float = 30.0          # base clearance over terrain under the body
    acc_reg: float = 0.05
    f_reg: float = 0.03
    footvel_reg: float = 0.5
    post_reg: float = 0.15      # keep feet near nominal under base
    slope: float = 25.0         # stance feet off steep terrain (riser edges)


@struct.dataclass
class SolverConfig:
    max_iters: int = struct.field(pytree_node=False, default=30)
    # Rescue pass: after `max_iters` LM iterations, gather the unconverged
    # scenarios (at most batch/rescue_frac of them, at least one lane group),
    # warm-start them from their current iterate, and run `rescue_iters` more
    # iterations.  Adaptive iteration allocation with static shapes: the batch
    # pays for the common case, stragglers get a compacted second pass.
    rescue_iters: int = struct.field(pytree_node=False, default=0)
    rescue_frac: int = struct.field(pytree_node=False, default=8)
    tol: float = 2e-3           # max unweighted constraint violation for "converged"
    lm_init: float = 1e-4
    lm_min: float = 1e-7
    lm_max: float = 1e3
    # Accept/reject damping schedule.  IPOPT adapts its barrier parameter
    # per iteration (logs/towr_log.out:44-82); the LM analog is how fast the
    # damping relaxes on accepted steps (lm_down) and backs off on rejected
    # ones (lm_up).  Measured on the bench distribution (plane, duty-0.6
    # trot, K=41): the old 0.4/4.0 schedule collapses the damping so fast
    # that iterations 3-5 are spent in reject/back-off cycles (48/512
    # converged at 4 iters); 0.75/2.0 keeps steps accepted and converges
    # 512/512 at 3 iters with dynamics p90 ~8e-4, and stays converged
    # through 30 iters.
    lm_down: float = 0.75
    lm_up: float = 2.0
    swing_clearance: float = 0.06
    # Minimum base height above the terrain at the CoM footprint: the body
    # must not pass through obstacles (TOWR lacks this constraint too; its
    # Docker probe nevertheless rejects pillar crossings because IPOPT's
    # restoration fails there, while our LM happily plans feet straddling a
    # 1 m pillar with the belly inside it — observed on exp_8's probe).
    body_clearance: float = 0.12
    mu_friction: float = 0.7    # reference Dockerfile/TOWR default terrain friction
    # Foothold slope hinge: stance feet are pushed off terrain steeper than
    # slope_margin, probed with half-width slope_probe_d (see
    # terrain.heightfield.slope_at).  TOWR has no such term and IPOPT happily
    # plants feet mid-riser on a one-cell step face; in this stack those
    # footholds slip in the soft-contact sim and stall the climb (measured
    # on exp_6's 0.11 m riser).  Margin calibration against the probed
    # corridor slopes of the experiment tile set: exp_2's walkable bands
    # read up to 1.53 and exp_4's rough bumps 0.89 (a 0.7 margin pushed
    # feet off BOTH and regressed exp_2 from green to aborted); exp_6's
    # riser faces read 1.7-1.8 and exp_7's bridge center 2.5-2.9 (the
    # unwalkable faces).  1.6 splits the families; the weight is sized so
    # the riser's (1.8 - 1.6) overshoot still pushes as hard as the old
    # (1.8 - 0.7) * 6.
    slope_margin: float = 1.6
    slope_probe_d: float = 0.06
    f_max: float = 30.0         # N, per-leg normal force cap
    rom_box: tuple = struct.field(pytree_node=False, default=(0.14, 0.08, 0.10))
    weights: Weights = struct.field(default_factory=Weights)


@struct.dataclass
class ProblemSpec:
    """One window of the receding-horizon problem. Batch by stacking leaves."""

    start: RobotState
    goal_r: jax.Array            # (3,) target CoM position
    goal_yaw: jax.Array          # () target yaw
    duration: jax.Array          # () window length in seconds (static grid via K)
    schedule: GaitSchedule       # (K, 4) masks
    dt: float = struct.field(pytree_node=False, default=0.0625)

    @property
    def num_knots(self):
        return self.schedule.contact.shape[-2]


def default_spec(
    terrain: Terrain | None = None,
    start_xy=(0.0, 0.0),
    goal_xy=(0.6, 0.0),
    duration: float = 2.5,
    K: int = 41,
    yaw: float = 0.0,
    goal_yaw: float = 0.0,
    schedule: GaitSchedule | None = None,
) -> ProblemSpec:
    dt = duration / (K - 1)
    sched = schedule if schedule is not None else trot_schedule(K, dt)
    start = RobotState.standing(start_xy, yaw=yaw, terrain=terrain)
    gx, gy = goal_xy
    if terrain is not None:
        gz = height_at(terrain, jnp.asarray(gx), jnp.asarray(gy)) + Solo12.stand_height
    else:
        gz = jnp.asarray(Solo12.stand_height)
    return ProblemSpec(
        start=start,
        goal_r=jnp.array([gx, gy, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * gz,
        goal_yaw=jnp.asarray(goal_yaw),
        duration=jnp.asarray(duration),
        schedule=sched,
        dt=dt,
    )


def pack_state(r, th, v, w, p, f):
    """Assemble a (K, NV) decision trajectory from components (forces in N)."""
    return jnp.concatenate(
        [r, th, v, w, p.reshape(p.shape[:-2] + (12,)), f.reshape(f.shape[:-2] + (12,)) / FORCE_SCALE],
        axis=-1,
    )


def unpack_state(x):
    """(..., NV) -> dict of physical components (forces in N)."""
    return dict(
        r=x[..., IDX_R],
        th=x[..., IDX_TH],
        v=x[..., IDX_V],
        w=x[..., IDX_W],
        p=x[..., IDX_P].reshape(x.shape[:-1] + (4, 3)),
        f=x[..., IDX_F].reshape(x.shape[:-1] + (4, 3)) * FORCE_SCALE,
    )
