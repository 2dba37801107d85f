"""Batch-on-lanes Gauss-Newton assembly — the TPU-layout twin of `normal_eq`.

A vmapped per-scenario assembly puts the batch on the LEADING axes, so every
small intermediate — a rotation matrix (B, K, 3, 3), a per-foot block — pads
its trailing (3, 3) dims to the (8, 128) vector tile: a ~100x memory blowup
that makes assembly HBM-bound (~120 ms per iteration at B=1024, K=41).

Here the scenario batch N rides the LAST (lane) axis everywhere: vectors are
(3, K, N), matrices (3, 3, K, N), per-foot stacks (4, 3, K, N).  Every
operation is a full-width elementwise op over (K, N) tiles; structural dims
are unrolled in Python.  This mirrors the layout of the Pallas BTD kernel
(`qtos_tpu.ops.pallas.btd`), so the whole solver iteration stays lanes-major.

Semantics are pinned to `qtos_tpu.solver.normal_eq` (itself pinned through
the dense Jacobians to autodiff) by tests/test_assemble_lanes.py.

reference analog: ifopt's Jacobian assembly feeding MUMPS inside IPOPT
(reference: Dockerfile:23-29, logs/towr_log.out:37), re-laid-out for the TPU
vector unit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.solver.spec import FORCE_SCALE, NV, SolverConfig
from qtos_tpu.terrain.heightfield import Terrain, grad_at, height_at, slope_grad_at

_GRAV_Z = -9.81
_G_R, _G_TH, _G_V, _G_W = 0, 1, 2, 3  # block-group ids; p_i = 4+i, f_i = 8+i


# ---------------------------------------------------------------------------
# Small-matrix helpers in lanes layout: matrices (3, 3, ...), vectors (3, ...)
# ---------------------------------------------------------------------------

def _mm(A, B):
    """3x3 matmul, unrolled (einsum on lanes layouts lowers to base-dilated
    convolutions on TPU — catastrophic; see module docstring)."""
    return jnp.stack([
        jnp.stack([sum(A[a, c] * B[c, b] for c in range(3)) for b in range(3)])
        for a in range(3)
    ])


def _mv(A, v):
    return jnp.stack([sum(A[a, c] * v[c] for c in range(3)) for a in range(3)])


def _mT(A):
    return jnp.swapaxes(A, 0, 1)


def _cross(u, v):
    return jnp.stack(
        [
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        ]
    )


def _skew(v):
    z = jnp.zeros_like(v[0])
    return jnp.stack(
        [
            jnp.stack([z, -v[2], v[1]]),
            jnp.stack([v[2], z, -v[0]]),
            jnp.stack([-v[1], v[0], z]),
        ]
    )


def _rot_lanes(th):
    """R = Rz(yaw) Ry(pitch) Rx(roll) for th (3, ...) -> (3, 3, ...)."""
    roll, pitch, yaw = th[0], th[1], th[2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr]),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr]),
            jnp.stack([-sp, cp * sr, cp * cr]),
        ]
    )


def _rot_derivs_lanes(th):
    """R and dR/d(roll, pitch, yaw): (3, 3, ...), (3(j), 3, 3, ...)."""
    roll, pitch, yaw = th[0], th[1], th[2]
    z = jnp.zeros_like(roll)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    o = jnp.ones_like(roll)

    Rx = jnp.stack([jnp.stack([o, z, z]), jnp.stack([z, cr, -sr]), jnp.stack([z, sr, cr])])
    Ry = jnp.stack([jnp.stack([cp, z, sp]), jnp.stack([z, o, z]), jnp.stack([-sp, z, cp])])
    Rz = jnp.stack([jnp.stack([cy, -sy, z]), jnp.stack([sy, cy, z]), jnp.stack([z, z, o])])
    dRx = jnp.stack([jnp.stack([z, z, z]), jnp.stack([z, -sr, -cr]), jnp.stack([z, cr, -sr])])
    dRy = jnp.stack([jnp.stack([-sp, z, cp]), jnp.stack([z, z, z]), jnp.stack([-cp, z, -sp])])
    dRz = jnp.stack([jnp.stack([-sy, -cy, z]), jnp.stack([cy, -sy, z]), jnp.stack([z, z, z])])

    ZyRy = _mm(Rz, Ry)
    R = _mm(ZyRy, Rx)
    dR = jnp.stack([_mm(ZyRy, dRx), _mm(_mm(Rz, dRy), Rx), _mm(_mm(dRz, Ry), Rx)])
    return R, dR


def _euler_rate_inv_lanes(th):
    """Closed-form C(th)^-1, lanes layout (matches ops.rotations semantics)."""
    pitch, yaw = th[1], th[2]
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(cp)
    inv_cp = 1.0 / jnp.where(jnp.abs(cp) < 1e-6, jnp.sign(cp) * 1e-6 + (cp == 0) * 1e-6, cp)
    return jnp.stack(
        [
            jnp.stack([cy * inv_cp, sy * inv_cp, z]),
            jnp.stack([-sy, cy, z]),
            jnp.stack([cy * sp * inv_cp, sy * sp * inv_cp, jnp.ones_like(cp)]),
        ]
    )


def _jac3(fn, th):
    """Columns d fn / d th_j via one linearize + 3 basis tangents.

    fn: (3, ...) -> (3, ...); returns (value, jac (3, 3(j), ...))."""
    primal, f_jvp = jax.linearize(fn, th)
    eye = jnp.eye(3, dtype=th.dtype)
    cols = [f_jvp(jnp.zeros_like(th) + eye[j].reshape((3,) + (1,) * (th.ndim - 1))) for j in range(3)]
    return primal, jnp.stack(cols, axis=1)


# ---------------------------------------------------------------------------
# Block-grid accumulators (python dicts; one concatenate at the end)
# ---------------------------------------------------------------------------

class _Grid:
    def __init__(self, shape_tail, dtype):
        self.blocks = {}
        self.tail = shape_tail
        self.dtype = dtype

    def add(self, gi, gj, blk):
        key = (gi, gj)
        self.blocks[key] = blk if key not in self.blocks else self.blocks[key] + blk

    def add_sym(self, gi, gj, blk):
        self.add(gi, gj, blk)
        self.add(gj, gi, _mT(blk))

    def to_mat(self):
        """-> (K, 36, 36, N)."""
        z = jnp.zeros((3, 3) + self.tail, self.dtype)

        def get(gi, gj):
            blk = self.blocks.get((gi, gj), z)
            return jnp.broadcast_to(blk, (3, 3) + self.tail)

        rows = [
            jnp.concatenate([get(gi, gj) for gj in range(12)], axis=1) for gi in range(12)
        ]
        M = jnp.concatenate(rows, axis=0)                           # (36, 36, K, N)
        return jnp.transpose(M, (2, 0, 1, 3))


class _GVec:
    def __init__(self, shape_tail, dtype):
        self.blocks = {}
        self.tail = shape_tail
        self.dtype = dtype

    def add(self, gi, blk):
        self.blocks[gi] = blk if gi not in self.blocks else self.blocks[gi] + blk

    def to_vec(self):
        """-> (K, 36, N)."""
        z = jnp.zeros((3,) + self.tail, self.dtype)
        out = jnp.concatenate(
            [jnp.broadcast_to(self.blocks.get(gi, z), (3,) + self.tail) for gi in range(12)]
        )
        return jnp.transpose(out, (1, 0, 2))


def _unpack_lanes(xT):
    """xT (NV, K, N) -> components in lanes layout (forces physical)."""
    r = xT[0:3]
    th = xT[3:6]
    v = xT[6:9]
    w = xT[9:12]
    p = xT[12:24].reshape((4, 3) + xT.shape[1:])
    fs = xT[24:36].reshape((4, 3) + xT.shape[1:])
    return r, th, v, w, p, fs


def lanes_spec(specs):
    """Batched ProblemSpec (leading B) -> dict of lanes-layout fields."""
    st = specs.start
    return dict(
        contact=jnp.transpose(specs.schedule.contact, (1, 2, 0)),      # (K, 4, N)
        swing_prog=jnp.transpose(specs.schedule.swing_progress, (1, 2, 0)),
        st_r=jnp.transpose(st.r, (1, 0)),                              # (3, N)
        st_eul=jnp.transpose(st.eul, (1, 0)),
        st_v=jnp.transpose(st.v, (1, 0)),
        st_w=jnp.transpose(st.omega, (1, 0)),
        st_feet=jnp.transpose(st.feet, (1, 2, 0)),                     # (4, 3, N)
        goal_r=jnp.transpose(specs.goal_r, (1, 0)),                    # (3, N)
        goal_yaw=specs.goal_yaw,                                       # (N,)
    )


def knot_normal_lanes(xT, ls, terrain: Terrain, cfg: SolverConfig):
    """Knot-family normal equations, lanes layout.

    xT: (NV, K, N).  Returns (D (K, 36, 36, N), g (K, 36, N), sq (N,)).
    """
    W = cfg.weights
    NVdim, K, N = xT.shape
    dt_ = xT.dtype
    tail = (K, N)
    I3 = jnp.eye(3, dtype=dt_)[:, :, None, None]                   # broadcastable

    r, th, v, w, p, fs = _unpack_lanes(xT)
    c = jnp.transpose(ls["contact"], (1, 0, 2))                    # (4, K, N)
    swing = 1.0 - c
    prog = jnp.transpose(ls["swing_prog"], (1, 0, 2))

    G = _Grid(tail, dt_)
    gv = _GVec(tail, dt_)

    def _sq(x, axes=None):
        return jnp.sum(x * x, axis=axes if axes is not None else tuple(range(x.ndim - 1)))

    h = height_at(terrain, p[:, 0], p[:, 1])                       # (4, K, N)
    hx, hy = grad_at(terrain, p[:, 0], p[:, 1])
    a_dir = jnp.stack([-hx, -hy, jnp.ones_like(hx)], axis=1)       # (4, 3, K, N)

    # --- terrain / clearance / no-penetration -------------------------------
    # first-stance terrain slack (KnotAux.terr_slack semantics): the target
    # is h + the start state's measured hover while contact is unbroken
    h0 = height_at(terrain, ls["st_feet"][:, 0], ls["st_feet"][:, 1])  # (4, N)
    hover0 = jnp.maximum(ls["st_feet"][:, 2] - h0, 0.0)
    slack = jnp.cumprod(c, axis=1) * hover0[:, None, :]            # (4, K, N)
    mT = c * W.terr
    res_terr = (p[:, 2] - h - slack) * mT
    bell = jnp.sin(jnp.pi * prog)
    mC = swing * W.clear
    res_clear = (p[:, 2] - (h + cfg.swing_clearance * bell)) * mC
    gpen = h - 0.005 - p[:, 2]
    mN = (gpen > 0.0).astype(dt_) * swing * W.terr
    res_nopen = jnp.maximum(gpen, 0.0) * swing * W.terr

    coef_p = mT**2 + mC**2 + mN**2                                 # (4, K, N)
    gcoef_p = mT * res_terr + mC * res_clear - mN * res_nopen
    sq = _sq(res_terr) + _sq(res_clear) + _sq(res_nopen)

    # --- swing force zero + friction pyramid --------------------------------
    mF = swing * W.fzero
    res_fzero = fs * mF[:, None]                                   # (4, 3, K, N)
    sq += _sq(res_fzero)

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
        axis=1,
    )                                                              # (4, 6, K, N)
    res_fric = fr * (c * W.fric)[:, None]
    sq += _sq(res_fric)
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
    )[None, :, :, None, None]                                      # (1, 6, 3, 1, 1)
    fvals = ((fr > 0.0).astype(dt_) * (c * W.fric)[:, None])[:, :, None] * base_rows
    # mul-reduce over the 6 pyramid rows (einsum on lanes layouts lowers to
    # base-dilated convolutions on TPU — avoid everywhere in this module)
    FtF = jnp.sum(fvals[:, :, :, None] * fvals[:, :, None, :], axis=1)  # (4,3,3,K,N)
    gfr = jnp.sum(fvals * res_fric[:, :, None], axis=1)            # (4, 3, K, N)

    # --- RoM hinges + posture ------------------------------------------------
    R, dR = _rot_derivs_lanes(th)                                  # (3,3,K,N), (3,3,3,K,N)
    pr = p - r[None]                                               # (4, 3, K, N)
    nominal = Solo12.nominal_feet[:, :, None, None]
    d = jnp.sum(R[None] * pr[:, :, None], axis=1) - nominal        # R^T (p - r)
    # box widened by the start state's out-of-box overshoot during each
    # foot's first stance (KnotAux.box_widen semantics — see transcription)
    R0 = _rot_lanes(ls["st_eul"])                                  # (3, 3, N)
    pr0 = ls["st_feet"] - ls["st_r"][None]                         # (4, 3, N)
    d0 = jnp.sum(R0[None] * pr0[:, :, None], axis=1) - Solo12.nominal_feet[:, :, None]
    box3 = jnp.asarray(cfg.rom_box)[None, :, None]
    over = jnp.maximum(jnp.abs(d0) - box3, 0.0)                    # (4, 3, N)
    first_stance = jnp.cumprod(c, axis=1)                          # (4, K, N)
    box = (jnp.asarray(cfg.rom_box)[None, :, None, None]
           + over[:, :, None, :] * first_stance[:, None, :, :])    # (4, 3, K, N)
    hi = jnp.maximum(d - box, 0.0) * W.rom
    lo = jnp.maximum(-d - box, 0.0) * W.rom
    res_post = d * W.post_reg
    sq += _sq(hi) + _sq(lo) + _sq(res_post)

    # dd[f, m, j] = sum_a dR[j, a, m] pr[f, a]
    dd = jnp.sum(dR[None] * pr[:, None, :, None], axis=2)          # (4, j, m, K, N)
    dd = jnp.swapaxes(dd, 1, 2)                                    # (4, m, j, K, N)
    act_hi = (d - box > 0).astype(dt_) * W.rom
    act_lo = (-d - box > 0).astype(dt_) * W.rom
    coef_rom = act_hi**2 + act_lo**2 + W.post_reg**2               # (4, 3, K, N)
    gc = act_hi * hi - act_lo * lo + W.post_reg * res_post

    # sums over the component index m (3), unrolled as mul-reduce
    Rm = jnp.moveaxis(R, 1, 0)                                     # (m, 3, K, N): Rm[m] = R[:, m]
    RR = sum(coef_rom[:, m, None, None] * (Rm[m][:, None] * Rm[m][None, :])[None]
             for m in range(3))                                    # (4, 3, 3, K, N)
    RT = sum(coef_rom[:, m, None, None] * Rm[m][None, :, None] * dd[:, m, None, :]
             for m in range(3))
    TT = sum(jnp.sum(coef_rom[:, m, None, None] * dd[:, m, :, None] * dd[:, m, None, :], axis=0)
             for m in range(3))                                    # (3, 3, K, N)
    TP = sum(coef_rom[:, m, None, None] * dd[:, m, :, None] * Rm[m][None, None, :]
             for m in range(3))

    G.add(_G_R, _G_R, RR.sum(0))
    G.add_sym(_G_R, _G_TH, -RT.sum(0))
    G.add(_G_TH, _G_TH, TT)
    gv.add(_G_R, -sum(jnp.sum(gc[:, m], axis=0) * Rm[m] for m in range(3)))
    gv.add(_G_TH, jnp.sum(jnp.sum(gc[:, :, None] * dd, axis=1), axis=0))
    g_p_rom = sum(gc[:, m, None] * Rm[m][None] for m in range(3))  # (4, 3, K, N)

    # --- foothold slope hinge: rank-1 on each p_i (xy only) ----------------
    sl, slx, sly = slope_grad_at(terrain, p[:, 0], p[:, 1], cfg.slope_probe_d)
    w_sl = c * (1.0 - first_stance) * W.slope                       # (4, K, N)
    m_sl = (sl - cfg.slope_margin > 0.0).astype(dt_) * w_sl
    res_sl = jnp.maximum(sl - cfg.slope_margin, 0.0) * w_sl
    u_sl = jnp.stack([slx, sly, jnp.zeros_like(slx)], axis=1)       # (4, 3, K, N)
    S_blk = (m_sl**2)[:, None, None] * (u_sl[:, :, None] * u_sl[:, None, :])
    g_sl = (m_sl * res_sl)[:, None] * u_sl                          # (4, 3, K, N)
    sq += _sq(res_sl)

    A = a_dir[:, :, None] * a_dir[:, None, :]                      # (4, 3, 3, K, N)
    for i in range(4):
        G.add(4 + i, 4 + i, coef_p[i][None, None] * A[i] + RR[i] + S_blk[i])
        G.add_sym(_G_R, 4 + i, -RR[i])
        G.add_sym(_G_TH, 4 + i, TP[i])
        gv.add(4 + i, gcoef_p[i][None] * a_dir[i] + g_p_rom[i] + g_sl[i])
        G.add(8 + i, 8 + i, (mF[i] ** 2)[None, None] * I3 + FtF[i])
        gv.add(8 + i, mF[i][None] * res_fzero[i] + gfr[i])

    # --- base clearance hinge: rank-1 on the r group ------------------------
    hb = height_at(terrain, r[0], r[1])                            # (K, N)
    hbx, hby = grad_at(terrain, r[0], r[1])
    gb = hb + cfg.body_clearance - r[2]
    act_b = (gb > 0.0).astype(dt_) * W.body
    res_b = jnp.maximum(gb, 0.0) * W.body
    u_b = jnp.stack([hbx, hby, -jnp.ones_like(hbx)], axis=0)       # (3, K, N)
    G.add(_G_R, _G_R, (act_b**2)[None, None] * (u_b[:, None] * u_b[None, :]))
    gv.add(_G_R, (act_b * res_b)[None] * u_b)
    sq += _sq(res_b)

    # --- init (first knot) ---------------------------------------------------
    ifirst = (jnp.arange(K) == 0).astype(dt_)[:, None]             # (K, 1)
    m0 = ifirst * W.init
    m0sq = (m0**2)[None, None]
    init_blocks = [
        r - ls["st_r"][:, None],
        th - ls["st_eul"][:, None],
        v - ls["st_v"][:, None],
        w - ls["st_w"][:, None],
    ] + [p[i] - ls["st_feet"][i][:, None] for i in range(4)]
    for gi, blk in enumerate(init_blocks):
        G.add(gi, gi, m0sq * I3)
        gv.add(gi, m0**2 * blk)
        sq += _sq(m0 * blk)

    # --- goal (last knot) ----------------------------------------------------
    ilast = (jnp.arange(K) == K - 1).astype(dt_)[:, None]
    mG = ilast * W.goal
    mGsq = (mG**2)[None, None]
    Ezz = jnp.zeros((3, 3), dt_).at[2, 2].set(1.0)[:, :, None, None]
    G.add(_G_R, _G_R, mGsq * I3)
    G.add(_G_TH, _G_TH, mGsq * Ezz)
    G.add(_G_V, _G_V, 0.25 * mGsq * I3)
    G.add(_G_W, _G_W, 0.25 * mGsq * I3)
    dgr = r - ls["goal_r"][:, None]
    dyaw = th[2] - ls["goal_yaw"][None, :]
    ez = jnp.zeros(3, dt_).at[2].set(1.0)[:, None, None]
    gv.add(_G_R, mG**2 * dgr)
    gv.add(_G_TH, mG**2 * dyaw[None] * ez)
    gv.add(_G_V, 0.25 * mG**2 * v)
    gv.add(_G_W, 0.25 * mG**2 * w)
    sq += _sq(mG * dgr) + _sq(mG * dyaw) + _sq(0.5 * mG * v) + _sq(0.5 * mG * w)

    return G.to_mat(), gv.to_vec(), sq


def _wdot_derivs_lanes(r, th, w, p, f):
    """Lanes version of jacobians._wdot_and_derivs (theta part via linearize)."""
    R, _ = _rot_derivs_lanes(th)
    Ib = jnp.diagonal(Solo12.inertia)
    Ibinv = jnp.diagonal(Solo12.inertia_inv)
    sh = (3,) + (1,) * (th.ndim - 1)
    Ibv, Ibinvv = Ib.reshape(sh), Ibinv.reshape(sh)

    def _sandwich(Rm, diag):
        Rd = Rm * diag[None]                                       # scale columns
        return jnp.sum(Rd[:, None] * Rm[None, :], axis=2)

    I_w = _sandwich(R, Ibv)
    I_winv = _sandwich(R, Ibinvv)
    pr = p - r[None]
    tau = jnp.sum(_cross(jnp.moveaxis(pr, 0, 1), jnp.moveaxis(f, 0, 1)), axis=1)
    gyro = _cross(w, _mv(I_w, w))
    wd = _mv(I_winv, tau - gyro)

    fsum = jnp.sum(f, axis=0)
    dwd_dr = _mm(I_winv, _skew(fsum))
    skf = jnp.stack([_skew(f[i]) for i in range(4)])               # (4, 3, 3, ...)
    dwd_dp = -jnp.sum(I_winv[None, :, :, None] * skf[:, None], axis=2)
    skpr = jnp.stack([_skew(pr[i]) for i in range(4)])
    dwd_df = jnp.sum(I_winv[None, :, :, None] * skpr[:, None], axis=2)
    dwd_dw = -_mm(I_winv, _mm(_skew(w), I_w) - _skew(_mv(I_w, w)))

    def theta_part(tt):
        Rt = _rot_lanes(tt)
        Iwv = _sandwich(Rt, Ibinvv)
        Iw = _sandwich(Rt, Ibv)
        return _mv(Iwv, tau - _cross(w, _mv(Iw, w)))

    _, dwd_dth = _jac3(theta_part, th)                             # (3, 3(j), ...)
    return wd, dwd_dr, dwd_dth, dwd_dp, dwd_df, dwd_dw


def interval_normal_lanes(xT, contact, cfg: SolverConfig, dt: float):
    """Interval-family normal equations, lanes layout.

    xT: (NV, K, N), contact: (4, K, N).
    Returns (Daa, Dbb, Lba (Km, 36, 36, N), ga, gb (Km, 36, N), sq (N,)),
    where Km = K - 1; Daa adds to D_k, Dbb to D_{k+1}, Lba is the (k+1, k)
    off-diagonal block of the Gauss-Newton system.
    """
    W = cfg.weights
    dt_ = xT.dtype
    r, th, v, w, p, fs = _unpack_lanes(xT)
    f = fs * FORCE_SCALE

    def A_(q):  # first K-1 knots
        return q[..., :-1, :]

    def B_(q):  # last K-1 knots
        return q[..., 1:, :]

    Km = xT.shape[1] - 1
    N = xT.shape[2]
    tail = (Km, N)
    I3 = jnp.eye(3, dtype=dt_)[:, :, None, None]
    Z3 = jnp.zeros((3, 3) + tail, dt_)

    r0, th0, v0, w0, p0, f0 = A_(r), A_(th), A_(v), A_(w), A_(p), A_(f)
    r1, th1, v1, w1, p1, f1 = B_(r), B_(th), B_(v), B_(w), B_(p), B_(f)

    def _rowmat(blocks):
        """dict {group: (3, 3, Km, N)} -> (3, 36, Km, N)."""
        return jnp.concatenate(
            [jnp.broadcast_to(blocks.get(gi, Z3), (3, 3) + tail) for gi in range(12)],
            axis=1,
        )

    # dyn_r
    res_dr = (r1 - r0 - 0.5 * dt * (v0 + v1)) * W.dyn_r
    vblk = -0.5 * dt * W.dyn_r * I3
    Wa_r = _rowmat({_G_R: -W.dyn_r * I3, _G_V: vblk})
    Wb_r = _rowmat({_G_R: W.dyn_r * I3, _G_V: vblk})

    # dyn_th
    def _rate(tt, ww):
        return _mv(_euler_rate_inv_lanes(tt), ww)

    rate0, drate0 = _jac3(lambda t: _rate(t, w0), th0)
    rate1, drate1 = _jac3(lambda t: _rate(t, w1), th1)
    res_dth = (th1 - th0 - 0.5 * dt * (rate0 + rate1)) * W.dyn_th
    Wa_th = _rowmat(
        {
            _G_TH: (-I3 - 0.5 * dt * drate0) * W.dyn_th,
            _G_W: -0.5 * dt * _euler_rate_inv_lanes(th0) * W.dyn_th,
        }
    )
    Wb_th = _rowmat(
        {
            _G_TH: (I3 - 0.5 * dt * drate1) * W.dyn_th,
            _G_W: -0.5 * dt * _euler_rate_inv_lanes(th1) * W.dyn_th,
        }
    )

    # dyn_v
    grav = jnp.zeros(3, dt_).at[2].set(_GRAV_Z)[:, None, None]
    a0 = jnp.sum(f0, axis=0) / Solo12.mass + grav
    a1 = jnp.sum(f1, axis=0) / Solo12.mass + grav
    res_dv = (v1 - v0 - 0.5 * dt * (a0 + a1)) * W.dyn_v
    fcoef = -0.5 * dt * FORCE_SCALE / Solo12.mass * W.dyn_v
    fblocks = {8 + i: fcoef * I3 for i in range(4)}
    Wa_v = _rowmat({_G_V: -W.dyn_v * I3, **fblocks})
    Wb_v = _rowmat({_G_V: W.dyn_v * I3, **fblocks})

    # dyn_w
    wd0, dwr0, dwth0, dwp0, dwf0, dww0 = _wdot_derivs_lanes(r0, th0, w0, p0, f0)
    wd1, dwr1, dwth1, dwp1, dwf1, dww1 = _wdot_derivs_lanes(r1, th1, w1, p1, f1)
    res_dw = (w1 - w0 - 0.5 * dt * (wd0 + wd1)) * W.dyn_w
    k = -0.5 * dt * W.dyn_w

    def _w_rowmat(dwr, dwth, dww, dwp, dwf, sgn):
        blocks = {
            _G_R: k * dwr,
            _G_TH: k * dwth,
            _G_W: sgn * W.dyn_w * I3 + k * dww,
        }
        for i in range(4):
            blocks[4 + i] = k * dwp[i]
            blocks[8 + i] = k * FORCE_SCALE * dwf[i]
        return _rowmat(blocks)

    Wa_w = _w_rowmat(dwr0, dwth0, dww0, dwp0, dwf0, -1.0)
    Wb_w = _w_rowmat(dwr1, dwth1, dww1, dwp1, dwf1, 1.0)

    Wa = jnp.stack([Wa_r, Wa_th, Wa_v, Wa_w])                      # (4, 3, 36, Km, N)
    Wb = jnp.stack([Wb_r, Wb_th, Wb_v, Wb_w])
    res_dyn = jnp.stack([res_dr, res_dth, res_dv, res_dw])         # (4, 3, Km, N)
    sq = jnp.sum(res_dyn * res_dyn, axis=(0, 1, 2))

    # ---- diagonal families --------------------------------------------------
    ca, cb = contact[:, :-1], contact[:, 1:]                       # (4, Km, N)
    both = ca * cb
    ms = both * W.stat
    mv_ = (1.0 - both) * W.footvel_reg
    dp = p1 - p0
    res_stat = dp * ms[:, None]
    res_fv = dp * mv_[:, None]
    sq += jnp.sum(res_stat**2, axis=(0, 1, 2)) + jnp.sum(res_fv**2, axis=(0, 1, 2))
    cpp = ms**2 + mv_**2                                           # (4, Km, N)
    gp = ms[:, None] * res_stat + mv_[:, None] * res_fv            # (4, 3, Km, N)

    res_av = (v1 - v0) * W.acc_reg
    res_aw = (w1 - w0) * W.acc_reg
    sq += jnp.sum(res_av**2, axis=(0, 1)) + jnp.sum(res_aw**2, axis=(0, 1))
    w2 = W.acc_reg**2

    df = (f1 - f0) / FORCE_SCALE * W.f_reg
    sq += jnp.sum(df**2, axis=(0, 1, 2))

    ones3 = jnp.ones((3,) + tail, dt_)
    diag_coef = jnp.concatenate(
        [
            jnp.zeros((6,) + tail, dt_),
            w2 * ones3,
            w2 * ones3,
            jnp.repeat(cpp, 3, axis=0),
            jnp.broadcast_to(W.f_reg**2, (12,) + tail).astype(dt_),
        ]
    )                                                              # (36, Km, N)
    gdiag = jnp.concatenate(
        [
            jnp.zeros((6,) + tail, dt_),
            W.acc_reg * res_av,
            W.acc_reg * res_aw,
            gp.reshape((12,) + tail),
            (W.f_reg * df).reshape((12,) + tail),
        ]
    )

    eye36 = jnp.eye(NV, dtype=dt_)[None, :, :, None]
    dmat = eye36 * jnp.transpose(diag_coef, (1, 0, 2))[:, :, None, :]

    # contract the 12 (group x comp) rows by explicit unroll; outputs are
    # built in (36, 36, Km, N) then shifted to knot-major with one transpose
    Wa_f = Wa.reshape((12, 36) + tail)
    Wb_f = Wb.reshape((12, 36) + tail)

    def _gram(X, Y):
        M = sum(X[i][:, None] * Y[i][None, :] for i in range(12))  # (36, 36, Km, N)
        return jnp.transpose(M, (2, 0, 1, 3))

    Daa = _gram(Wa_f, Wa_f) + dmat
    Dbb = _gram(Wb_f, Wb_f) + dmat
    Lba = _gram(Wb_f, Wa_f) - dmat
    gT = jnp.transpose(gdiag, (1, 0, 2))                           # (Km, 36, N)
    res_f = res_dyn.reshape((12,) + tail)
    ga = jnp.transpose(sum(Wa_f[i] * res_f[i][None] for i in range(12)), (1, 0, 2)) - gT
    gb = jnp.transpose(sum(Wb_f[i] * res_f[i][None] for i in range(12)), (1, 0, 2)) + gT

    return Daa, Dbb, Lba, ga, gb, sq


def assemble_lanes(xT, ls, terrain: Terrain, cfg: SolverConfig, dt: float):
    """Full Gauss-Newton system in lanes layout.

    xT (NV, K, N) -> (D (K, 36, 36, N), L (K-1, 36, 36, N), g (K, 36, N),
    merit (N,)).
    """
    Dk, gk, sq_k = knot_normal_lanes(xT, ls, terrain, cfg)
    contact = jnp.transpose(ls["contact"], (1, 0, 2))              # (4, K, N)
    Daa, Dbb, L, ga, gb, sq_i = interval_normal_lanes(xT, contact, cfg, dt)
    D = Dk.at[:-1].add(Daa).at[1:].add(Dbb)
    g = gk.at[:-1].add(ga).at[1:].add(gb)
    merit = 0.5 * (sq_k + sq_i)
    return D, L, g, merit
