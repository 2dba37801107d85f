"""Analytic residual Jacobians for the gait NLP.

`jax.jacfwd` pays one primal evaluation per input tangent (36 per knot, 72
per interval); almost every residual row here is linear or has a closed-form
derivative, so analytic assembly is ~an order of magnitude cheaper.  The only
autodiff remnants are two 3-tangent jacfwds for the euler-rate and inertia
terms' theta-dependence.

Validated row-for-row against the jacfwd of `transcription.knot_residuals` /
`interval_residuals` in tests/test_jacobians.py — the two transcriptions must
stay in lockstep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.ops.rotations import euler_to_rot, omega_to_euler_rate, rx, ry, rz, skew
from qtos_tpu.solver.spec import FORCE_SCALE, NV, ProblemSpec, SolverConfig, unpack_state
from qtos_tpu.solver.transcription import GRAVITY, KnotAux
from qtos_tpu.terrain.heightfield import Terrain, grad_at, height_at

# column offsets in the per-knot state vector
C_R, C_TH, C_V, C_W, C_P, C_F = 0, 3, 6, 9, 12, 24


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


def knot_system(xk, aux: KnotAux, spec: ProblemSpec, terrain: Terrain, cfg: SolverConfig):
    """Residuals + analytic Jacobian for one knot: ((m1,), (m1, NV))."""
    W = cfg.weights
    s = unpack_state(xk)
    r, th, v, w, p, f = s["r"], s["th"], s["v"], s["w"], s["p"], s["f"]
    c = aux.contact
    swing = 1.0 - c
    fs = xk[C_F : C_F + 12].reshape(4, 3)

    h = height_at(terrain, p[:, 0], p[:, 1])
    hx, hy = grad_at(terrain, p[:, 0], p[:, 1])

    rows = []
    jacs = []

    def add(res_vec, jac):
        rows.append(res_vec)
        jacs.append(jac)

    def foot_rows_z(coef, zoff, mask):
        """rows (4,): mask*(p_z - zoff - ...); jac on p cols."""
        J = jnp.zeros((4, NV))
        for i in range(4):
            J = J.at[i, C_P + 3 * i + 0].set(-hx[i] * mask[i] * coef)
            J = J.at[i, C_P + 3 * i + 1].set(-hy[i] * mask[i] * coef)
            J = J.at[i, C_P + 3 * i + 2].set(mask[i] * coef)
        return J

    # 1. terrain contact
    res_terr = (p[:, 2] - h) * c * W.terr
    add(res_terr, foot_rows_z(W.terr, 0.0, c))

    # 2. swing clearance shaping
    bell = jnp.sin(jnp.pi * aux.swing_prog)
    res_clear = (p[:, 2] - (h + cfg.swing_clearance * bell)) * swing * W.clear
    add(res_clear, foot_rows_z(W.clear, 0.0, swing))

    # 3. no-penetration hinge: max(h - 0.005 - pz, 0) * swing * W.terr
    gpen = h - 0.005 - p[:, 2]
    act = (gpen > 0.0).astype(xk.dtype)
    res_nopen = jnp.maximum(gpen, 0.0) * swing * W.terr
    Jn = jnp.zeros((4, NV))
    m3 = act * swing * W.terr
    for i in range(4):
        Jn = Jn.at[i, C_P + 3 * i + 0].set(hx[i] * m3[i])
        Jn = Jn.at[i, C_P + 3 * i + 1].set(hy[i] * m3[i])
        Jn = Jn.at[i, C_P + 3 * i + 2].set(-m3[i])
    add(res_nopen, Jn)

    # 4. swing force zero (stored-scale forces)
    res_fzero = (fs * swing[:, None]).reshape(12) * W.fzero
    Jf = jnp.zeros((12, NV))
    Jf = Jf.at[jnp.arange(12), C_F + jnp.arange(12)].set(
        jnp.repeat(swing, 3) * W.fzero
    )
    add(res_fzero, Jf)

    # 5. friction pyramid (6 rows per foot, stored-scale forces)
    import math

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
    factive = (fr > 0.0).astype(xk.dtype)  # (4, 6)
    Jfr = jnp.zeros((24, NV))
    coefs = [  # (col offset within foot, dcol coeff, fz coeff)
        (0, 1.0, -mu_t),
        (0, -1.0, -mu_t),
        (1, 1.0, -mu_t),
        (1, -1.0, -mu_t),
        (2, -2.0, 0.0),
        (2, 1.0, 0.0),
    ]
    for i in range(4):
        for j, (cc, a_c, a_z) in enumerate(coefs):
            row = i * 6 + j
            m = factive[i, j] * c[i] * W.fric
            Jfr = Jfr.at[row, C_F + 3 * i + cc].add(a_c * m)
            if a_z != 0.0:
                Jfr = Jfr.at[row, C_F + 3 * i + 2].add(a_z * m)
    add(res_fric, Jfr)

    # 6/7. RoM hinges + posture: d = R^T (p - r) - nominal
    R, dR = _rot_derivs(th)
    d = jnp.einsum("ji,kj->ki", R, p - r[None, :]) - Solo12.nominal_feet
    box = jnp.asarray(cfg.rom_box)
    hi = jnp.maximum(d - box[None, :], 0.0)
    lo = jnp.maximum(-d - box[None, :], 0.0)
    res_rom = jnp.concatenate([hi, lo], axis=-1).reshape(24) * W.rom
    # dd/dp_i = R^T ; dd/dr = -R^T ; dd/dth_j = dR_j^T (p - r)
    dd_dth = jnp.einsum("jab,ka->kjb", dR, p - r[None, :])  # wait: (3,3,3),(4,3)
    # dd/dth: for foot k, component m: sum_a dR[j][a, m] * (p-r)[k, a]
    dd_dth = jnp.einsum("jam,ka->kmj", dR, p - r[None, :])  # (4, 3, 3): [foot, comp, theta_j]
    act_hi = (d - box[None, :] > 0).astype(xk.dtype)
    act_lo = (-d - box[None, :] > 0).astype(xk.dtype)

    def d_jac_rows(sign_act, sgn):
        """(12, NV) rows for sgn*d components gated by sign_act (4,3)."""
        J = jnp.zeros((12, NV))
        for i in range(4):
            for mcomp in range(3):
                row = i * 3 + mcomp
                gate = sign_act[i, mcomp] * W.rom * sgn
                J = J.at[row, C_P + 3 * i : C_P + 3 * i + 3].add(gate * R[:, mcomp])
                J = J.at[row, C_R : C_R + 3].add(-gate * R[:, mcomp])
                J = J.at[row, C_TH : C_TH + 3].add(gate * dd_dth[i, mcomp])
        return J

    Jhi = d_jac_rows(act_hi, 1.0)
    Jlo = d_jac_rows(act_lo, -1.0)
    # interleave hi/lo per foot to match [hi(3), lo(3)] concat layout:
    res_rows_rom = jnp.zeros((24, NV))
    for i in range(4):
        res_rows_rom = res_rows_rom.at[i * 6 : i * 6 + 3].set(Jhi[i * 3 : i * 3 + 3])
        res_rows_rom = res_rows_rom.at[i * 6 + 3 : i * 6 + 6].set(Jlo[i * 3 : i * 3 + 3])
    add(res_rom, res_rows_rom)

    res_post = d.reshape(12) * W.post_reg
    Jpost = jnp.zeros((12, NV))
    for i in range(4):
        for mcomp in range(3):
            row = i * 3 + mcomp
            Jpost = Jpost.at[row, C_P + 3 * i : C_P + 3 * i + 3].add(W.post_reg * R[:, mcomp])
            Jpost = Jpost.at[row, C_R : C_R + 3].add(-W.post_reg * R[:, mcomp])
            Jpost = Jpost.at[row, C_TH : C_TH + 3].add(W.post_reg * dd_dth[i, mcomp])
    add(res_post, Jpost)

    # 8. init
    st = spec.start
    res_init = (
        jnp.concatenate(
            [r - st.r, th - st.eul, v - st.v, w - st.omega, (p - st.feet).reshape(12)]
        )
        * aux.is_first
        * W.init
    )
    Jinit = jnp.zeros((24, NV))
    Jinit = Jinit.at[jnp.arange(24), jnp.arange(24)].set(aux.is_first * W.init)
    add(res_init, Jinit)

    # 9. goal
    res_goal = (
        jnp.concatenate([r - spec.goal_r, th[2:] - spec.goal_yaw[None], v * 0.5, w * 0.5])
        * aux.is_last
        * W.goal
    )
    Jgoal = jnp.zeros((10, NV))
    gw = aux.is_last * W.goal
    Jgoal = Jgoal.at[jnp.arange(3), jnp.arange(3)].set(gw)
    Jgoal = Jgoal.at[3, C_TH + 2].set(gw)
    Jgoal = Jgoal.at[jnp.arange(4, 7), C_V + jnp.arange(3)].set(0.5 * gw)
    Jgoal = Jgoal.at[jnp.arange(7, 10), C_W + jnp.arange(3)].set(0.5 * gw)
    add(res_goal, Jgoal)

    return jnp.concatenate(rows), jnp.concatenate(jacs, axis=0)


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


def interval_system(xa, xb, ca, cb, spec: ProblemSpec, cfg: SolverConfig):
    """Residuals + analytic Jacobians for one interval:
    ((m2,), (m2, NV), (m2, NV))  [Ja wrt x_k, Jb wrt x_{k+1}]."""
    W = cfg.weights
    dt = spec.dt
    sa, sb = unpack_state(xa), unpack_state(xb)
    r0, th0, v0, w0, p0, f0 = sa["r"], sa["th"], sa["v"], sa["w"], sa["p"], sa["f"]
    r1, th1, v1, w1, p1, f1 = sb["r"], sb["th"], sb["v"], sb["w"], sb["p"], sb["f"]

    I3 = jnp.eye(3)
    m2 = 54
    Ja = jnp.zeros((m2, NV))
    Jb = jnp.zeros((m2, NV))
    res = jnp.zeros(m2)

    # rows 0:3 dyn_r
    a_lin0 = jnp.sum(f0, axis=0) / Solo12.mass + GRAVITY
    a_lin1 = jnp.sum(f1, axis=0) / Solo12.mass + GRAVITY
    res = res.at[0:3].set((r1 - r0 - 0.5 * dt * (v0 + v1)) * W.dyn_r)
    Ja = Ja.at[0:3, C_R : C_R + 3].set(-I3 * W.dyn_r)
    Jb = Jb.at[0:3, C_R : C_R + 3].set(I3 * W.dyn_r)
    Ja = Ja.at[0:3, C_V : C_V + 3].set(-0.5 * dt * I3 * W.dyn_r)
    Jb = Jb.at[0:3, C_V : C_V + 3].set(-0.5 * dt * I3 * W.dyn_r)

    # rows 3:6 dyn_th; rate = C^-1(th) w
    rate0 = omega_to_euler_rate(th0, w0)
    rate1 = omega_to_euler_rate(th1, w1)
    res = res.at[3:6].set((th1 - th0 - 0.5 * dt * (rate0 + rate1)) * W.dyn_th)
    from qtos_tpu.ops.rotations import euler_rate_matrix_inv

    Cinv0 = euler_rate_matrix_inv(th0)
    Cinv1 = euler_rate_matrix_inv(th1)
    drate0_dth = jax.jacfwd(lambda t: omega_to_euler_rate(t, w0))(th0)
    drate1_dth = jax.jacfwd(lambda t: omega_to_euler_rate(t, w1))(th1)
    Ja = Ja.at[3:6, C_TH : C_TH + 3].set((-I3 - 0.5 * dt * drate0_dth) * W.dyn_th)
    Jb = Jb.at[3:6, C_TH : C_TH + 3].set((I3 - 0.5 * dt * drate1_dth) * W.dyn_th)
    Ja = Ja.at[3:6, C_W : C_W + 3].set(-0.5 * dt * Cinv0 * W.dyn_th)
    Jb = Jb.at[3:6, C_W : C_W + 3].set(-0.5 * dt * Cinv1 * W.dyn_th)

    # rows 6:9 dyn_v
    res = res.at[6:9].set((v1 - v0 - 0.5 * dt * (a_lin0 + a_lin1)) * W.dyn_v)
    Ja = Ja.at[6:9, C_V : C_V + 3].set(-I3 * W.dyn_v)
    Jb = Jb.at[6:9, C_V : C_V + 3].set(I3 * W.dyn_v)
    fcoef = -0.5 * dt * FORCE_SCALE / Solo12.mass * W.dyn_v
    for i in range(4):
        Ja = Ja.at[6:9, C_F + 3 * i : C_F + 3 * i + 3].set(fcoef * I3)
        Jb = Jb.at[6:9, C_F + 3 * i : C_F + 3 * i + 3].set(fcoef * I3)

    # rows 9:12 dyn_w
    wd0, dwr0, dwth0, dwp0, dwf0, dww0 = _wdot_and_derivs(r0, th0, w0, p0, f0)
    wd1, dwr1, dwth1, dwp1, dwf1, dww1 = _wdot_and_derivs(r1, th1, w1, p1, f1)
    res = res.at[9:12].set((w1 - w0 - 0.5 * dt * (wd0 + wd1)) * W.dyn_w)
    k = -0.5 * dt * W.dyn_w
    Ja = Ja.at[9:12, C_W : C_W + 3].set((-I3 * W.dyn_w) + k * dww0)
    Jb = Jb.at[9:12, C_W : C_W + 3].set((I3 * W.dyn_w) + k * dww1)
    Ja = Ja.at[9:12, C_R : C_R + 3].set(k * dwr0)
    Jb = Jb.at[9:12, C_R : C_R + 3].set(k * dwr1)
    Ja = Ja.at[9:12, C_TH : C_TH + 3].set(k * dwth0)
    Jb = Jb.at[9:12, C_TH : C_TH + 3].set(k * dwth1)
    for i in range(4):
        Ja = Ja.at[9:12, C_P + 3 * i : C_P + 3 * i + 3].set(k * dwp0[i])
        Jb = Jb.at[9:12, C_P + 3 * i : C_P + 3 * i + 3].set(k * dwp1[i])
        Ja = Ja.at[9:12, C_F + 3 * i : C_F + 3 * i + 3].set(k * dwf0[i] * FORCE_SCALE)
        Jb = Jb.at[9:12, C_F + 3 * i : C_F + 3 * i + 3].set(k * dwf1[i] * FORCE_SCALE)

    # rows 12:24 stationarity, 24:36 footvel
    both = ca * cb
    res = res.at[12:24].set(((p1 - p0) * both[:, None]).reshape(12) * W.stat)
    res = res.at[24:36].set(((p1 - p0) * (1.0 - both[:, None])).reshape(12) * W.footvel_reg)
    idx = jnp.arange(12)
    bmask = jnp.repeat(both, 3)
    Ja = Ja.at[12 + idx, C_P + idx].set(-bmask * W.stat)
    Jb = Jb.at[12 + idx, C_P + idx].set(bmask * W.stat)
    Ja = Ja.at[24 + idx, C_P + idx].set(-(1.0 - bmask) * W.footvel_reg)
    Jb = Jb.at[24 + idx, C_P + idx].set((1.0 - bmask) * W.footvel_reg)

    # rows 36:42 acc reg, 42:54 force rate
    res = res.at[36:39].set((v1 - v0) * W.acc_reg)
    res = res.at[39:42].set((w1 - w0) * W.acc_reg)
    res = res.at[42:54].set(((f1 - f0) / FORCE_SCALE).reshape(12) * W.f_reg)
    i3 = jnp.arange(3)
    Ja = Ja.at[36 + i3, C_V + i3].set(-W.acc_reg)
    Jb = Jb.at[36 + i3, C_V + i3].set(W.acc_reg)
    Ja = Ja.at[39 + i3, C_W + i3].set(-W.acc_reg)
    Jb = Jb.at[39 + i3, C_W + i3].set(W.acc_reg)
    Ja = Ja.at[42 + idx, C_F + idx].set(-W.f_reg)
    Jb = Jb.at[42 + idx, C_F + idx].set(W.f_reg)

    return res, Ja, Jb
