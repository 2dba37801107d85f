"""Analytic residual Jacobians for the gait NLP.

`jax.jacfwd` pays one primal evaluation per input tangent (36 per knot, 72
per interval); almost every residual row here is linear or has a closed-form
derivative, so analytic assembly is ~an order of magnitude cheaper.  The only
autodiff remnants are two 3-tangent jacfwds for the euler-rate and inertia
terms' theta-dependence.

Construction is concatenation-based, NOT scatter-based: every Jacobian is a
`concatenate` of small dense blocks.  Under `vmap(B x K)` a `.at[...].set`
into a zeros-(m, NV) matrix becomes a full pass over a ~700 MB array per
update — dozens of such updates made assembly the solver bottleneck on TPU
(HBM-bound).  Block concatenation writes each element exactly once.

Validated row-for-row against the jacfwd of `transcription.knot_residuals` /
`interval_residuals` in tests/test_jacobians.py — the two transcriptions must
stay in lockstep.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.ops.rotations import euler_rate_matrix_inv, euler_to_rot, omega_to_euler_rate, rx, ry, rz, skew
from qtos_tpu.solver.spec import FORCE_SCALE, NV, ProblemSpec, SolverConfig, unpack_state
from qtos_tpu.solver.transcription import GRAVITY, KnotAux
from qtos_tpu.terrain.heightfield import Terrain, grad_at, height_at, slope_grad_at

# column offsets in the per-knot state vector
C_R, C_TH, C_V, C_W, C_P, C_F = 0, 3, 6, 9, 12, 24

# goal rows have a fixed sparsity pattern: rows = [r(3), yaw, 0.5*v(3), 0.5*w(3)]
_P_GOAL = np.zeros((10, NV), np.float32)
_P_GOAL[np.arange(3), np.arange(3)] = 1.0
_P_GOAL[3, C_TH + 2] = 1.0
_P_GOAL[np.arange(4, 7), C_V + np.arange(3)] = 0.5
_P_GOAL[np.arange(7, 10), C_W + np.arange(3)] = 0.5
_P_GOAL = jnp.asarray(_P_GOAL)


def _rot_derivs(th):
    """R and dR/d(roll, pitch, yaw), each (3, 3)."""
    roll, pitch, yaw = th[0], th[1], th[2]
    Rz_, Ry_, Rx_ = rz(yaw), ry(pitch), rx(roll)
    c, s = jnp.cos, jnp.sin
    dRx = jnp.array(
        [[0.0, 0.0, 0.0], [0.0, -s(roll), -c(roll)], [0.0, c(roll), -s(roll)]]
    )
    dRy = jnp.array(
        [[-s(pitch), 0.0, c(pitch)], [0.0, 0.0, 0.0], [-c(pitch), 0.0, -s(pitch)]]
    )
    dRz = jnp.array(
        [[-s(yaw), -c(yaw), 0.0], [c(yaw), -s(yaw), 0.0], [0.0, 0.0, 0.0]]
    )
    R = Rz_ @ Ry_ @ Rx_
    dR = jnp.stack([Rz_ @ Ry_ @ dRx, Rz_ @ dRy @ Rx_, dRz @ Ry_ @ Rx_])  # (3,3,3)
    return R, dR


def _embed_feet(vals):
    """Per-foot row values (4, c) -> (4, 4c) block-diagonal rows.

    out[i, i*c:(i+1)*c] = vals[i]; feet decouple, so each foot's row only
    touches its own column block.
    """
    eye4 = jnp.eye(4, dtype=vals.dtype)
    return (vals[:, None, :] * eye4[:, :, None]).reshape(4, -1)


def _lift_p(vals):
    """Foot-local p-column rows (4, 3) -> (4, NV)."""
    z = jnp.zeros((4, 12), vals.dtype)
    return jnp.concatenate([z, _embed_feet(vals), z], axis=1)


def knot_system(xk, aux: KnotAux, spec: ProblemSpec, terrain: Terrain, cfg: SolverConfig):
    """Residuals + analytic Jacobian for one knot: ((m1,), (m1, NV))."""
    W = cfg.weights
    s = unpack_state(xk)
    r, th, v, w, p, f = s["r"], s["th"], s["v"], s["w"], s["p"], s["f"]
    c = aux.contact
    swing = 1.0 - c
    fs = xk[C_F : C_F + 12].reshape(4, 3)
    dt_ = xk.dtype

    h = height_at(terrain, p[:, 0], p[:, 1])
    hx, hy = grad_at(terrain, p[:, 0], p[:, 1])
    # foot-height gradient direction d(pz - h)/dp_i = [-hx, -hy, 1]
    a_dir = jnp.stack([-hx, -hy, jnp.ones_like(hx)], axis=-1)  # (4, 3)

    # 1. terrain contact (target h + first-stance slack, KnotAux.terr_slack)
    res_terr = (p[:, 2] - h - aux.terr_slack) * c * W.terr
    J_terr = _lift_p(a_dir * (c * W.terr)[:, None])

    # 2. swing clearance shaping
    bell = jnp.sin(jnp.pi * aux.swing_prog)
    res_clear = (p[:, 2] - (h + cfg.swing_clearance * bell)) * swing * W.clear
    J_clear = _lift_p(a_dir * (swing * W.clear)[:, None])

    # 3. no-penetration hinge: max(h - 0.005 - pz, 0) * swing * W.terr
    gpen = h - 0.005 - p[:, 2]
    act = (gpen > 0.0).astype(dt_)
    res_nopen = jnp.maximum(gpen, 0.0) * swing * W.terr
    J_nopen = _lift_p(-a_dir * (act * swing * W.terr)[:, None])

    # 4. swing force zero (stored-scale forces)
    res_fzero = (fs * swing[:, None]).reshape(12) * W.fzero
    J_fzero = jnp.concatenate(
        [jnp.zeros((12, 24), dt_), jnp.diag(jnp.repeat(swing, 3) * W.fzero)], axis=1
    )

    # 5. friction pyramid (6 rows per foot, stored-scale forces)
    mu_t = cfg.mu_friction / math.sqrt(2.0)
    fx, fy, fz = fs[:, 0], fs[:, 1], fs[:, 2]
    fr = jnp.stack(
        [
            jnp.maximum(fx - mu_t * fz, 0.0),
            jnp.maximum(-fx - mu_t * fz, 0.0),
            jnp.maximum(fy - mu_t * fz, 0.0),
            jnp.maximum(-fy - mu_t * fz, 0.0),
            jnp.maximum(-fz, 0.0) * 2.0,
            jnp.maximum(fz - cfg.f_max / FORCE_SCALE, 0.0),
        ],
        axis=-1,
    )
    res_fric = (fr * c[:, None] * W.fric).reshape(24)
    factive = (fr > 0.0).astype(dt_)                               # (4, 6)
    base_rows = jnp.asarray(
        [
            [1.0, 0.0, -mu_t],
            [-1.0, 0.0, -mu_t],
            [0.0, 1.0, -mu_t],
            [0.0, -1.0, -mu_t],
            [0.0, 0.0, -2.0],
            [0.0, 0.0, 1.0],
        ],
        dt_,
    )                                                              # (6, 3)
    fvals = (factive * (c * W.fric)[:, None])[:, :, None] * base_rows[None]  # (4,6,3)
    eye4 = jnp.eye(4, dtype=dt_)
    J_fric_f = (fvals[:, :, None, :] * eye4[:, None, :, None]).reshape(24, 12)
    J_fric = jnp.concatenate([jnp.zeros((24, 24), dt_), J_fric_f], axis=1)

    # 6/7. RoM hinges + posture: d = R^T (p - r) - nominal.
    # Row direction for (foot i, comp m): u = [-R[:,m] on r, dd_dth[i,m] on th,
    # R[:,m] on p_i]; hi/lo/posture rows share u up to a gate.
    R, dR = _rot_derivs(th)
    d = jnp.einsum("ji,kj->ki", R, p - r[None, :]) - Solo12.nominal_feet
    # box widened by the start state's overshoot during each foot's first
    # stance (see KnotAux.box_widen)
    box = jnp.asarray(cfg.rom_box)[None, :] + aux.box_widen
    hi = jnp.maximum(d - box, 0.0)
    lo = jnp.maximum(-d - box, 0.0)
    res_rom = jnp.concatenate([hi, lo], axis=-1).reshape(24) * W.rom
    res_post = d.reshape(12) * W.post_reg

    # dd/dth: for foot k, component m: sum_a dR[j][a, m] * (p-r)[k, a]
    dd_dth = jnp.einsum("jam,ka->kmj", dR, p - r[None, :])         # (4, 3, 3)
    Rcols = R.T                                                    # row m = R[:, m]
    u_r = jnp.broadcast_to(-Rcols[None], (4, 3, 3))
    u_p = (Rcols[None, :, None, :] * eye4[:, None, :, None]).reshape(4, 3, 12)
    u = jnp.concatenate(
        [u_r, dd_dth, jnp.zeros((4, 3, 6), dt_), u_p, jnp.zeros((4, 3, 12), dt_)],
        axis=-1,
    )                                                              # (4, 3, NV)
    act_hi = (d - box > 0).astype(dt_)
    act_lo = (-d - box > 0).astype(dt_)
    J_hi = (act_hi * W.rom)[..., None] * u
    J_lo = -(act_lo * W.rom)[..., None] * u
    J_rom = jnp.concatenate([J_hi, J_lo], axis=1).reshape(24, NV)  # [hi(3), lo(3)]/foot
    J_post = (W.post_reg * u).reshape(12, NV)

    # foothold slope hinge (1 row/foot, p_i xy columns only; first-stance
    # feet exempt — they are boundary conditions, see KnotAux.first_stance)
    sl, slx, sly = slope_grad_at(terrain, p[:, 0], p[:, 1], cfg.slope_probe_d)
    act_sl = (sl - cfg.slope_margin > 0.0).astype(dt_)
    m_slope = c * (1.0 - aux.first_stance) * W.slope
    res_slope = jnp.maximum(sl - cfg.slope_margin, 0.0) * m_slope
    u_sl = jnp.stack([slx, sly, jnp.zeros_like(slx)], axis=-1)     # (4, 3)
    J_slope = _lift_p(u_sl * (act_sl * m_slope)[:, None])

    # 7b. base clearance hinge: max(h(r_xy) + clearance - r_z, 0) * W.body
    hb = height_at(terrain, r[0], r[1])
    hbx, hby = grad_at(terrain, r[0], r[1])
    gb = hb + cfg.body_clearance - r[2]
    act_b = (gb > 0.0).astype(dt_)
    res_body = jnp.maximum(gb, 0.0)[None] * W.body
    u_body = jnp.concatenate(
        [jnp.stack([hbx, hby, -jnp.ones_like(hbx)]), jnp.zeros(NV - 3, dt_)]
    )
    J_body = (act_b * W.body) * u_body[None, :]

    # 8. init
    st = spec.start
    res_init = (
        jnp.concatenate(
            [r - st.r, th - st.eul, v - st.v, w - st.omega, (p - st.feet).reshape(12)]
        )
        * aux.is_first
        * W.init
    )
    J_init = (aux.is_first * W.init) * jnp.eye(24, NV, dtype=dt_)

    # 9. goal
    res_goal = (
        jnp.concatenate([r - spec.goal_r, th[2:] - spec.goal_yaw[None], v * 0.5, w * 0.5])
        * aux.is_last
        * W.goal
    )
    J_goal = (aux.is_last * W.goal) * _P_GOAL

    res = jnp.concatenate(
        [res_terr, res_clear, res_nopen, res_fzero, res_fric, res_rom, res_post, res_slope, res_body, res_init, res_goal]
    )
    J = jnp.concatenate(
        [J_terr, J_clear, J_nopen, J_fzero, J_fric, J_rom, J_post, J_slope, J_body, J_init, J_goal], axis=0
    )
    return res, J


def _wdot_and_derivs(r, th, w, p, f):
    """omega_dot and derivatives wrt (r, p, f, w); theta part via 3-tangent AD."""
    R, dR = _rot_derivs(th)
    I_b = Solo12.inertia
    I_binv = Solo12.inertia_inv
    I_w = R @ I_b @ R.T
    I_winv = R @ I_binv @ R.T
    tau = jnp.sum(jnp.cross(p - r[None, :], f), axis=0)
    gyro = jnp.cross(w, I_w @ w)
    wd = I_winv @ (tau - gyro)

    dwd_dr = I_winv @ skew(jnp.sum(f, axis=0))
    dwd_dp = -jnp.einsum("ab,kbc->kac", I_winv, skew(f))            # (4,3,3)
    dwd_df = jnp.einsum("ab,kbc->kac", I_winv, skew(p - r[None, :]))  # (4,3,3)
    dwd_dw = -I_winv @ (skew(w) @ I_w - skew(I_w @ w))

    def theta_part(tt):
        Rt = euler_to_rot(tt)
        Iwv = Rt @ I_binv @ Rt.T
        Iw = Rt @ I_b @ Rt.T
        return Iwv @ (tau - jnp.cross(w, Iw @ w))

    dwd_dth = jax.jacfwd(theta_part)(th)                              # (3,3)
    return wd, dwd_dr, dwd_dth, dwd_dp, dwd_df, dwd_dw


def _hcat(*blocks):
    return jnp.concatenate(blocks, axis=1)


def interval_system(xa, xb, ca, cb, spec: ProblemSpec, cfg: SolverConfig):
    """Residuals + analytic Jacobians for one interval:
    ((m2,), (m2, NV), (m2, NV))  [Ja wrt x_k, Jb wrt x_{k+1}]."""
    W = cfg.weights
    dt = spec.dt
    sa, sb = unpack_state(xa), unpack_state(xb)
    r0, th0, v0, w0, p0, f0 = sa["r"], sa["th"], sa["v"], sa["w"], sa["p"], sa["f"]
    r1, th1, v1, w1, p1, f1 = sb["r"], sb["th"], sb["v"], sb["w"], sb["p"], sb["f"]
    dt_ = xa.dtype

    I3 = jnp.eye(3, dtype=dt_)
    Z3 = jnp.zeros((3, 3), dt_)
    Z312 = jnp.zeros((3, 12), dt_)
    Z1212 = jnp.zeros((12, 12), dt_)

    # rows 0:3 dyn_r
    a_lin0 = jnp.sum(f0, axis=0) / Solo12.mass + GRAVITY
    a_lin1 = jnp.sum(f1, axis=0) / Solo12.mass + GRAVITY
    res_r = (r1 - r0 - 0.5 * dt * (v0 + v1)) * W.dyn_r
    vcoef = -0.5 * dt * W.dyn_r * I3
    Ja_r = _hcat(-I3 * W.dyn_r, Z3, vcoef, Z3, Z312, Z312)
    Jb_r = _hcat(I3 * W.dyn_r, Z3, vcoef, Z3, Z312, Z312)

    # rows 3:6 dyn_th; rate = C^-1(th) w
    rate0 = omega_to_euler_rate(th0, w0)
    rate1 = omega_to_euler_rate(th1, w1)
    res_th = (th1 - th0 - 0.5 * dt * (rate0 + rate1)) * W.dyn_th
    Cinv0 = euler_rate_matrix_inv(th0)
    Cinv1 = euler_rate_matrix_inv(th1)
    drate0_dth = jax.jacfwd(lambda t: omega_to_euler_rate(t, w0))(th0)
    drate1_dth = jax.jacfwd(lambda t: omega_to_euler_rate(t, w1))(th1)
    Ja_th = _hcat(Z3, (-I3 - 0.5 * dt * drate0_dth) * W.dyn_th, Z3, -0.5 * dt * Cinv0 * W.dyn_th, Z312, Z312)
    Jb_th = _hcat(Z3, (I3 - 0.5 * dt * drate1_dth) * W.dyn_th, Z3, -0.5 * dt * Cinv1 * W.dyn_th, Z312, Z312)

    # rows 6:9 dyn_v
    res_v = (v1 - v0 - 0.5 * dt * (a_lin0 + a_lin1)) * W.dyn_v
    fcoef = -0.5 * dt * FORCE_SCALE / Solo12.mass * W.dyn_v
    fblk = jnp.tile(fcoef * I3, (1, 4))
    Ja_v = _hcat(Z3, Z3, -I3 * W.dyn_v, Z3, Z312, fblk)
    Jb_v = _hcat(Z3, Z3, I3 * W.dyn_v, Z3, Z312, fblk)

    # rows 9:12 dyn_w
    wd0, dwr0, dwth0, dwp0, dwf0, dww0 = _wdot_and_derivs(r0, th0, w0, p0, f0)
    wd1, dwr1, dwth1, dwp1, dwf1, dww1 = _wdot_and_derivs(r1, th1, w1, p1, f1)
    res_w = (w1 - w0 - 0.5 * dt * (wd0 + wd1)) * W.dyn_w
    k = -0.5 * dt * W.dyn_w

    def _feet_cols(blocks):  # (4,3,3) foot blocks -> (3,12)
        return jnp.moveaxis(blocks, 0, 1).reshape(3, 12)

    Ja_w = _hcat(k * dwr0, k * dwth0, Z3, -I3 * W.dyn_w + k * dww0,
                 k * _feet_cols(dwp0), k * FORCE_SCALE * _feet_cols(dwf0))
    Jb_w = _hcat(k * dwr1, k * dwth1, Z3, I3 * W.dyn_w + k * dww1,
                 k * _feet_cols(dwp1), k * FORCE_SCALE * _feet_cols(dwf1))

    # rows 12:24 stationarity, 24:36 footvel
    both = ca * cb
    res_stat = ((p1 - p0) * both[:, None]).reshape(12) * W.stat
    res_fv = ((p1 - p0) * (1.0 - both[:, None])).reshape(12) * W.footvel_reg
    bmask = jnp.repeat(both, 3)
    Ja_stat = _hcat(Z1212, jnp.diag(-bmask * W.stat), Z1212)
    Jb_stat = _hcat(Z1212, jnp.diag(bmask * W.stat), Z1212)
    Ja_fv = _hcat(Z1212, jnp.diag(-(1.0 - bmask) * W.footvel_reg), Z1212)
    Jb_fv = _hcat(Z1212, jnp.diag((1.0 - bmask) * W.footvel_reg), Z1212)

    # rows 36:42 acc reg, 42:54 force rate
    res_acc = jnp.concatenate([(v1 - v0) * W.acc_reg, (w1 - w0) * W.acc_reg])
    res_fr = ((f1 - f0) / FORCE_SCALE).reshape(12) * W.f_reg
    eye6 = jnp.eye(6, dtype=dt_)
    Ja_acc = _hcat(jnp.zeros((6, 6), dt_), -W.acc_reg * eye6, jnp.zeros((6, 24), dt_))
    Jb_acc = _hcat(jnp.zeros((6, 6), dt_), W.acc_reg * eye6, jnp.zeros((6, 24), dt_))
    eye12 = jnp.eye(12, dtype=dt_)
    Ja_fr = _hcat(jnp.zeros((12, 24), dt_), -W.f_reg * eye12)
    Jb_fr = _hcat(jnp.zeros((12, 24), dt_), W.f_reg * eye12)

    res = jnp.concatenate([res_r, res_th, res_v, res_w, res_stat, res_fv, res_acc, res_fr])
    Ja = jnp.concatenate([Ja_r, Ja_th, Ja_v, Ja_w, Ja_stat, Ja_fv, Ja_acc, Ja_fr], axis=0)
    Jb = jnp.concatenate([Jb_r, Jb_th, Jb_v, Jb_w, Jb_stat, Jb_fv, Jb_acc, Jb_fr], axis=0)
    return res, Ja, Jb
