"""Residual transcription of the gait NLP on a uniform knot grid.

Covers the reference solver's six constraint families (logs/towr_log.out:111-129)
in collocation form:

  terrain-ee-motion  -> stance-foot-on-surface + swing no-penetration residuals
  dynamic            -> single-rigid-body trapezoidal defects (r, eul, v, omega)
  splineacc          -> implied by the shared knot states (C1 by construction)
                        + acceleration regularizers
  rangeofmotion      -> hinge residuals on the foot box in base frame
  force              -> friction pyramid + unilateral + cap hinges
  swing              -> apex clearance shaping + stationarity of stance feet

Every residual couples at most knots (k, k+1), so the Gauss-Newton normal
equations assemble into the block-tridiagonal system solved by
`qtos_tpu.ops.tridiag`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.ops.rotations import euler_to_rot, omega_to_euler_rate
from qtos_tpu.solver.spec import (
    FORCE_SCALE,
    NV,
    ProblemSpec,
    SolverConfig,
    unpack_state,
)
from qtos_tpu.terrain.heightfield import Terrain, height_at, slope_at

GRAVITY = jnp.array([0.0, 0.0, -9.81])


class KnotAux(NamedTuple):
    contact: jax.Array        # (4,)
    swing_prog: jax.Array     # (4,)
    is_first: jax.Array       # ()
    is_last: jax.Array        # ()
    # (4,) per-foot TERRAIN slack applied while the foot is still in its
    # first stance phase: the start state's measured hover above the bilinear
    # surface (a foot resting on a bump/ledge edge measures above the surface
    # at its own xy).  The stance-on-surface target becomes h + slack there,
    # so init/stationarity and the terrain constraint stop fighting over the
    # start hover (measured: init 0.07 / terrain 0.052 replan deadlocks on
    # exp_4's rough terrain); the target snaps back to h after the foot's
    # first swing.
    terr_slack: jax.Array
    # (4, 3) per-foot RoM-box widening applied while the foot is still in its
    # FIRST stance phase (contact unbroken since knot 0): exactly the amount
    # by which the START state's feet sit outside the box, zero otherwise.
    # The start is a boundary condition, not a choice — a diverged robot may
    # begin with feet outside the box, and enforcing the box against the
    # init/stationarity constraints makes the recovery window infeasible
    # (measured: init violation 0.06 from a 0.25 m offset start).  Widening
    # by the measured overshoot admits the start while still constraining
    # everything beyond it (a plain weight-zeroing relaxation let the solver
    # park the base anywhere during the walk gait's long first stance and
    # broke its tracking).  Recovery lands at each foot's first touchdown,
    # where the box snaps back to nominal.
    box_widen: jax.Array
    # (4,) 1.0 while the foot is still in its FIRST stance phase (contact
    # unbroken since knot 0).  The slope hinge is gated off during it: the
    # start state's footholds are boundary conditions, and pushing a foot
    # that BEGINS on an edge cell off the edge fights the init constraint
    # (measured: descent windows starting 0.2 m before exp_6's drop-off
    # plateau at viol 0.005-0.011, status 1).
    first_stance: jax.Array


def _components(xk):
    s = unpack_state(xk)
    return s["r"], s["th"], s["v"], s["w"], s["p"], s["f"]


def srb_accels(r, th, w, f_feet, p_feet):
    """Single-rigid-body accelerations (world frame).

    reference analog: TOWR's ``dynamic`` constraint set (towr_log.out:115) —
    centroidal dynamics of base mass/inertia under the four contact forces.
    """
    a_lin = jnp.sum(f_feet, axis=-2) / Solo12.mass + GRAVITY
    R = euler_to_rot(th)
    I_w = R @ Solo12.inertia @ jnp.swapaxes(R, -1, -2)
    tau = jnp.sum(jnp.cross(p_feet - r[None, :], f_feet), axis=-2)
    # I_w^-1 = R I^-1 R^T exactly (diagonal body inertia) — avoids XLA's slow
    # small-matrix LU on TPU.
    I_w_inv = R @ Solo12.inertia_inv @ jnp.swapaxes(R, -1, -2)
    Iw_w = jnp.einsum("...ij,...j->...i", I_w, w)
    w_dot = jnp.einsum("...ij,...j->...i", I_w_inv, tau - jnp.cross(w, Iw_w))
    return a_lin, w_dot


def knot_residuals(xk, aux: KnotAux, spec: ProblemSpec, terrain: Terrain, cfg: SolverConfig):
    """Residuals involving a single knot. Returns (m1,)."""
    W = cfg.weights
    r, th, v, w, p, f = _components(xk)
    c = aux.contact
    swing = 1.0 - c
    fs = f / FORCE_SCALE

    h = height_at(terrain, p[:, 0], p[:, 1])

    # stance feet on the surface (terrain-ee-motion analog); the target is
    # h + terr_slack during each foot's first stance (see KnotAux.terr_slack)
    res_terr = (p[:, 2] - h - aux.terr_slack) * c * W.terr

    # swing feet: shape toward a clearance bell, never below the surface
    bell = jnp.sin(jnp.pi * aux.swing_prog)
    res_clear = (p[:, 2] - (h + cfg.swing_clearance * bell)) * swing * W.clear
    res_nopen = jnp.maximum(h - 0.005 - p[:, 2], 0.0) * swing * W.terr

    # swing feet carry no force
    res_fzero = (fs * swing[:, None]).reshape(12) * W.fzero

    # friction pyramid + unilateral + cap (force-ee-force analog), stance only
    mu_t = cfg.mu_friction / jnp.sqrt(2.0)
    fx, fy, fz = fs[:, 0], fs[:, 1], fs[:, 2]
    fzN = fz * FORCE_SCALE
    res_fric = jnp.stack(
        [
            jnp.maximum(fx - mu_t * fz, 0.0),
            jnp.maximum(-fx - mu_t * fz, 0.0),
            jnp.maximum(fy - mu_t * fz, 0.0),
            jnp.maximum(-fy - mu_t * fz, 0.0),
            jnp.maximum(-fz, 0.0) * 2.0,
            jnp.maximum((fzN - cfg.f_max) / FORCE_SCALE, 0.0),
        ],
        axis=-1,
    ) * c[:, None] * W.fric

    # kinematic range-of-motion box in base frame (rangeofmotion analog);
    # widened during each foot's first stance phase by the start state's own
    # overshoot (see KnotAux.box_widen)
    R = euler_to_rot(th)
    p_base = jnp.einsum("ji,kj->ki", R, p - r[None, :])
    d = p_base - Solo12.nominal_feet
    box = jnp.asarray(cfg.rom_box)[None, :] + aux.box_widen
    res_rom = jnp.concatenate(
        [jnp.maximum(d - box, 0.0), jnp.maximum(-d - box, 0.0)],
        axis=-1,
    ).reshape(24) * W.rom

    # soft posture centering
    res_post = d.reshape(12) * W.post_reg

    # foothold slope hinge: stance feet off terrain steeper than the
    # friction cone supports (see SolverConfig.slope_margin); gated off
    # during each foot's first stance (start feet are boundary conditions)
    sl = slope_at(terrain, p[:, 0], p[:, 1], cfg.slope_probe_d)
    res_slope = (jnp.maximum(sl - cfg.slope_margin, 0.0)
                 * c * (1.0 - aux.first_stance) * W.slope)

    # base clearance: the body must stay above the terrain under the CoM —
    # without this the NLP threads the belly through obstacles the feet can
    # straddle (exp_8's 1 m pillars probed "feasible"), because no other
    # constraint couples base height to terrain between the footholds
    h_body = height_at(terrain, r[0], r[1])
    res_body = jnp.maximum(h_body + cfg.body_clearance - r[2], 0.0)[None] * W.body

    # boundary conditions
    st = spec.start
    res_init = (
        jnp.concatenate(
            [r - st.r, th - st.eul, v - st.v, w - st.omega, (p - st.feet).reshape(12)]
        )
        * aux.is_first
        * W.init
    )
    res_goal = (
        jnp.concatenate(
            [
                (r - spec.goal_r),
                (th[2:] - spec.goal_yaw[None]),
                v * 0.5,
                w * 0.5,
            ]
        )
        * aux.is_last
        * W.goal
    )

    return jnp.concatenate(
        [
            res_terr,
            res_clear,
            res_nopen,
            res_fzero,
            res_fric.reshape(24),
            res_rom,
            res_post,
            res_slope,
            res_body,
            res_init,
            res_goal,
        ]
    )


def interval_residuals(xa, xb, ca, cb, spec: ProblemSpec, cfg: SolverConfig):
    """Residuals coupling knots (k, k+1). Returns (m2,)."""
    W = cfg.weights
    dt = spec.dt
    r0, th0, v0, w0, p0, f0 = _components(xa)
    r1, th1, v1, w1, p1, f1 = _components(xb)

    a0, wd0 = srb_accels(r0, th0, w0, f0, p0)
    a1, wd1 = srb_accels(r1, th1, w1, f1, p1)
    rate0 = omega_to_euler_rate(th0, w0)
    rate1 = omega_to_euler_rate(th1, w1)

    res_dyn = jnp.concatenate(
        [
            (r1 - r0 - 0.5 * dt * (v0 + v1)) * W.dyn_r,
            (th1 - th0 - 0.5 * dt * (rate0 + rate1)) * W.dyn_th,
            (v1 - v0 - 0.5 * dt * (a0 + a1)) * W.dyn_v,
            (w1 - w0 - 0.5 * dt * (wd0 + wd1)) * W.dyn_w,
        ]
    )

    both = ca * cb
    res_stat = ((p1 - p0) * both[:, None]).reshape(12) * W.stat
    res_footvel = ((p1 - p0) * (1.0 - both[:, None])).reshape(12) * W.footvel_reg

    res_acc = jnp.concatenate([(v1 - v0) * W.acc_reg, (w1 - w0) * W.acc_reg])
    res_frate = ((f1 - f0) / FORCE_SCALE).reshape(12) * W.f_reg

    return jnp.concatenate([res_dyn, res_stat, res_footvel, res_acc, res_frate])


# ---------------------------------------------------------------------------
# Physical-violation metrics (unweighted, for convergence status)
# ---------------------------------------------------------------------------

def violations(x, spec: ProblemSpec, terrain: Terrain, cfg: SolverConfig):
    """Max physical constraint violations of a candidate trajectory (K, NV).

    The batched analog of IPOPT's ``Constraint violation`` line
    (logs/towr_log.out:58).  Returns a dict of scalars.
    """
    s = unpack_state(x)
    r, th, v, w, p, f = s["r"], s["th"], s["v"], s["w"], s["p"], s["f"]
    dt = spec.dt
    c = spec.schedule.contact

    a, wd = jax.vmap(srb_accels)(r, th, w, f, p)
    rate = omega_to_euler_rate(th, w)
    d_r = r[1:] - r[:-1] - 0.5 * dt * (v[1:] + v[:-1])
    d_th = th[1:] - th[:-1] - 0.5 * dt * (rate[1:] + rate[:-1])
    d_v = v[1:] - v[:-1] - 0.5 * dt * (a[1:] + a[:-1])
    d_w = w[1:] - w[:-1] - 0.5 * dt * (wd[1:] + wd[:-1])

    both = c[1:] * c[:-1]
    stat = jnp.abs(p[1:] - p[:-1]) * both[..., None]

    h = height_at(terrain, p[..., 0], p[..., 1])
    # first-stance terrain slack mirrors the residuals (KnotAux.terr_slack):
    # a start-state hover held through the first stance is not a violation
    h0 = height_at(terrain, spec.start.feet[:, 0], spec.start.feet[:, 1])
    hover0 = jnp.maximum(spec.start.feet[:, 2] - h0, 0.0)
    slack = jnp.cumprod(c, axis=0) * hover0[None, :]
    terr = jnp.abs(p[..., 2] - h - slack) * c

    mu_t = cfg.mu_friction / jnp.sqrt(2.0)
    fric = jnp.maximum(
        jnp.maximum(jnp.abs(f[..., 0]), jnp.abs(f[..., 1])) - mu_t * f[..., 2], 0.0
    ) * c
    funi = jnp.maximum(-f[..., 2], 0.0) * c
    fswing = jnp.abs(f) * (1.0 - c[..., None])

    h_body = height_at(terrain, r[:, 0], r[:, 1])
    body = jnp.maximum(h_body + cfg.body_clearance - r[:, 2], 0.0)

    st = spec.start
    init = jnp.max(
        jnp.concatenate(
            [
                jnp.abs(r[0] - st.r),
                jnp.abs(th[0] - st.eul),
                jnp.abs(v[0] - st.v),
                jnp.abs(w[0] - st.omega),
                jnp.abs(p[0] - st.feet).reshape(12),
            ]
        )
    )
    goal = jnp.max(jnp.abs(r[-1] - spec.goal_r))

    return dict(
        dynamics=jnp.max(jnp.concatenate([jnp.abs(d_r), jnp.abs(d_th), jnp.abs(d_v) * 0.1, jnp.abs(d_w) * 0.1], axis=-1)),
        stationarity=jnp.max(stat),
        terrain=jnp.max(terr),
        friction=jnp.max(fric) + jnp.max(funi),
        swing_force=jnp.max(fswing),
        body=jnp.max(body),
        init=init,
        goal=goal,
    )


# ---------------------------------------------------------------------------
# Initial guess
# ---------------------------------------------------------------------------

def initial_guess(spec: ProblemSpec, terrain: Terrain, cfg: SolverConfig) -> jax.Array:
    """Schedule-aware warm start: linear base interpolation, nominal feet under
    the base held during stance, gravity-balancing vertical forces.

    reference analog: TOWR initializes splines between the CLI start/goal
    states; IPOPT then runs 7-8 iterations (towr_log.out:64).
    """
    K = spec.num_knots
    c = spec.schedule.contact
    swing = spec.schedule.swing_progress
    st = spec.start

    tau = jnp.linspace(0.0, 1.0, K)[:, None]
    # Keep the base still during head/tail full-stance, move in between.
    motion_phase = jnp.clip((tau - 0.08) / 0.84, 0.0, 1.0)
    r = st.r[None, :] + (spec.goal_r - st.r)[None, :] * motion_phase
    hz = height_at(terrain, r[:, 0], r[:, 1])
    r = r.at[:, 2].set(jnp.maximum(r[:, 2], hz + Solo12.stand_height - 0.02))
    yaw = st.eul[2] + (spec.goal_yaw - st.eul[2]) * motion_phase[:, 0]
    th = jnp.stack([jnp.zeros(K), jnp.zeros(K), yaw], axis=-1)
    v = jnp.gradient(r, axis=0) / spec.dt
    w = jnp.zeros((K, 3))

    # Feet: nominal xy under the base (yaw-rotated), z on terrain + swing bell.
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    nom = Solo12.nominal_feet[:, :2]
    nx = cy[:, None] * nom[None, :, 0] - sy[:, None] * nom[None, :, 1]
    ny = sy[:, None] * nom[None, :, 0] + cy[:, None] * nom[None, :, 1]
    px = r[:, None, 0] + nx
    py = r[:, None, 1] + ny
    ph = height_at(terrain, px, py)
    pz = ph + cfg.swing_clearance * jnp.sin(jnp.pi * swing) * (1.0 - c)
    p = jnp.stack([px, py, pz], axis=-1)
    p = p.at[0].set(st.feet)

    n_contact = jnp.maximum(jnp.sum(c, axis=-1, keepdims=True), 1.0)
    fz = Solo12.mass * 9.81 / n_contact * c
    f = jnp.concatenate([jnp.zeros((K, 4, 2)), fz[..., None]], axis=-1)

    from qtos_tpu.solver.spec import pack_state

    return pack_state(r, th, v, w, p, f)
