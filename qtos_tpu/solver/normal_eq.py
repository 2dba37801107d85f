"""Direct Gauss-Newton normal-equation assembly in block space.

The dense per-knot Jacobian is (118, 36) — materializing it for a
(B=1024, K=41) batch costs ~700 MB of HBM per array, and J^T J einsums with
36-wide output tiles run the MXU at <10% utilization.  But every residual
family touches only a handful of the twelve 3-wide column groups
[r, th, v, w, p0..p3, f0..f3], so D = J^T J, L, and g assemble directly from
closed-form 3x3 block contributions.

TPU layout note: blocks are accumulated in a host-side dict of (3, 3) values
and written into the (36, 36) output with ONE two-level concatenate — a
(..., 12, 12, 3, 3) device accumulator would pad its trailing (3, 3) dims to
(8, 128) vector tiles (a ~100x memory blowup under vmap), and repeated
`.at[].add` chains rewrite the whole array per update.  Concatenation keeps
every intermediate a fusable element-wise value.

Equivalence with the dense-Jacobian path (`qtos_tpu.solver.jacobians`, itself
pinned to autodiff) is enforced by tests/test_normal_eq.py.

reference analog: this plays the role of ifopt's Jacobian assembly feeding
MUMPS inside IPOPT (reference: Dockerfile:23-29, logs/towr_log.out:37) — but
produces the block-tridiagonal normal equations consumed by the Pallas BTD
kernel instead of a general sparse triplet matrix.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.ops.rotations import euler_rate_matrix_inv, omega_to_euler_rate
from qtos_tpu.solver.jacobians import _rot_derivs, _wdot_and_derivs
from qtos_tpu.solver.spec import FORCE_SCALE, NV, ProblemSpec, SolverConfig, unpack_state
from qtos_tpu.solver.transcription import GRAVITY, KnotAux
from qtos_tpu.terrain.heightfield import Terrain, grad_at, height_at, slope_grad_at

C_F = 24
_G_R, _G_TH, _G_V, _G_W = 0, 1, 2, 3  # block-group ids; p_i = 4+i, f_i = 8+i


class _BlockGrid:
    """12x12 grid of (3, 3) blocks, accumulated in Python, emitted as one
    two-level concatenate (never a big on-device accumulator)."""

    def __init__(self, dtype):
        self.blocks = {}
        self.dtype = dtype

    def add(self, gi, gj, blk):
        key = (gi, gj)
        if key in self.blocks:
            self.blocks[key] = self.blocks[key] + blk
        else:
            self.blocks[key] = blk

    def add_sym(self, gi, gj, blk):
        """Add blk at (gi, gj) and blk^T at (gj, gi)."""
        self.add(gi, gj, blk)
        self.add(gj, gi, jnp.swapaxes(blk, -1, -2))

    def to_mat(self, base=None):
        z = jnp.zeros((3, 3), self.dtype)
        rows = [
            jnp.concatenate([self.blocks.get((gi, gj), z) for gj in range(12)], axis=-1)
            for gi in range(12)
        ]
        out = jnp.concatenate(rows, axis=-2)
        return out if base is None else base + out


class _BlockVec:
    """12-entry vector of (3,) blocks, emitted as one concatenate."""

    def __init__(self, dtype):
        self.blocks = {}
        self.dtype = dtype

    def add(self, gi, blk):
        if gi in self.blocks:
            self.blocks[gi] = self.blocks[gi] + blk
        else:
            self.blocks[gi] = blk

    def to_vec(self, base=None):
        z = jnp.zeros(3, self.dtype)
        out = jnp.concatenate([self.blocks.get(gi, z) for gi in range(12)])
        return out if base is None else base + out


def _sq(x):
    return jnp.sum(x * x)


def knot_normal(xk, aux: KnotAux, spec: ProblemSpec, terrain: Terrain, cfg: SolverConfig):
    """Per-knot normal-equation contribution.

    Returns (D (NV, NV), g (NV,), sq ()) with D = Jk^T Jk, g = Jk^T rho_k,
    sq = sum(rho_k^2) for the knot residual family of `transcription`.
    """
    W = cfg.weights
    s = unpack_state(xk)
    r, th, v, w, p, f = s["r"], s["th"], s["v"], s["w"], s["p"], s["f"]
    c = aux.contact
    swing = 1.0 - c
    fs = xk[C_F : C_F + 12].reshape(4, 3)
    dt_ = xk.dtype
    I3 = jnp.eye(3, dtype=dt_)

    G = _BlockGrid(dt_)
    gv = _BlockVec(dt_)
    sq = jnp.zeros((), dt_)

    h = height_at(terrain, p[:, 0], p[:, 1])
    hx, hy = grad_at(terrain, p[:, 0], p[:, 1])
    a_dir = jnp.stack([-hx, -hy, jnp.ones_like(hx)], axis=-1)      # (4, 3)

    # --- terrain / clearance / no-penetration: share direction a_dir on p_i --
    mT = c * W.terr
    res_terr = (p[:, 2] - h - aux.terr_slack) * mT
    bell = jnp.sin(jnp.pi * aux.swing_prog)
    mC = swing * W.clear
    res_clear = (p[:, 2] - (h + cfg.swing_clearance * bell)) * mC
    gpen = h - 0.005 - p[:, 2]
    mN = (gpen > 0.0).astype(dt_) * swing * W.terr
    res_nopen = jnp.maximum(gpen, 0.0) * swing * W.terr

    A = a_dir[:, :, None] * a_dir[:, None, :]                      # (4, 3, 3)
    coef_p = mT**2 + mC**2 + mN**2
    gcoef_p = mT * res_terr + mC * res_clear - mN * res_nopen
    sq += _sq(res_terr) + _sq(res_clear) + _sq(res_nopen)

    # --- swing force zero + friction pyramid: f_i diagonal blocks ----------
    mF = swing * W.fzero
    res_fzero = fs * mF[:, None]                                   # (4, 3)
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
        axis=-1,
    )
    res_fric = fr * (c * W.fric)[:, None]                          # (4, 6)
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
    )
    fvals = ((fr > 0.0).astype(dt_) * (c * W.fric)[:, None])[:, :, None] * base_rows[None]
    FtF = jnp.einsum("ijc,ijd->icd", fvals, fvals)                 # (4, 3, 3)
    gfr = jnp.einsum("ijc,ij->ic", fvals, res_fric)                # (4, 3)

    # --- RoM hinges + posture: rank-1 directions u over (r, th, p_i) -------
    R, dR = _rot_derivs(th)
    d = jnp.einsum("ji,kj->ki", R, p - r[None, :]) - Solo12.nominal_feet
    # box widened by the start state's overshoot during each foot's first
    # stance (see KnotAux.box_widen)
    box = jnp.asarray(cfg.rom_box)[None, :] + aux.box_widen
    hi = jnp.maximum(d - box, 0.0) * W.rom
    lo = jnp.maximum(-d - box, 0.0) * W.rom
    res_post = d * W.post_reg
    sq += _sq(hi) + _sq(lo) + _sq(res_post)

    dd_dth = jnp.einsum("jam,ka->kmj", dR, p - r[None, :])         # (4, m, 3)
    act_hi = (d - box > 0).astype(dt_) * W.rom
    act_lo = (-d - box > 0).astype(dt_) * W.rom
    coef_rom = act_hi**2 + act_lo**2 + W.post_reg**2               # (4, m)
    gc = act_hi * hi - act_lo * lo + W.post_reg * res_post         # (4, m)

    RR = jnp.einsum("im,am,bm->iab", coef_rom, R, R)               # (4, 3, 3)
    RT = jnp.einsum("im,am,imb->iab", coef_rom, R, dd_dth)
    TT = jnp.einsum("im,ima,imb->ab", coef_rom, dd_dth, dd_dth)
    TP = jnp.einsum("im,ima,bm->iab", coef_rom, dd_dth, R)

    G.add(_G_R, _G_R, RR.sum(0))
    G.add_sym(_G_R, _G_TH, -RT.sum(0))
    G.add(_G_TH, _G_TH, TT)
    gv.add(_G_R, -jnp.einsum("im,am->a", gc, R))
    gv.add(_G_TH, jnp.einsum("im,ima->a", gc, dd_dth))
    g_p_rom = jnp.einsum("im,am->ia", gc, R)                       # (4, 3)

    # --- foothold slope hinge: rank-1 on each p_i (xy only) ----------------
    sl, slx, sly = slope_grad_at(terrain, p[:, 0], p[:, 1], cfg.slope_probe_d)
    w_sl = c * (1.0 - aux.first_stance) * W.slope
    m_sl = (sl - cfg.slope_margin > 0.0).astype(dt_) * w_sl
    res_sl = jnp.maximum(sl - cfg.slope_margin, 0.0) * w_sl
    u_sl = jnp.stack([slx, sly, jnp.zeros_like(slx)], axis=-1)     # (4, 3)
    S_blk = (m_sl**2)[:, None, None] * (u_sl[:, :, None] * u_sl[:, None, :])
    g_sl = (m_sl * res_sl)[:, None] * u_sl
    sq += _sq(res_sl)

    for i in range(4):
        G.add(4 + i, 4 + i, coef_p[i] * A[i] + RR[i] + S_blk[i])
        G.add_sym(_G_R, 4 + i, -RR[i])
        G.add_sym(_G_TH, 4 + i, TP[i])
        gv.add(4 + i, gcoef_p[i] * a_dir[i] + g_p_rom[i] + g_sl[i])
        G.add(8 + i, 8 + i, mF[i] ** 2 * I3 + FtF[i])
        gv.add(8 + i, mF[i] * res_fzero[i] + gfr[i])

    # --- base clearance hinge: rank-1 on the r group -----------------------
    hb = height_at(terrain, r[0], r[1])
    hbx, hby = grad_at(terrain, r[0], r[1])
    gb = hb + cfg.body_clearance - r[2]
    act_b = (gb > 0.0).astype(dt_) * W.body
    res_b = jnp.maximum(gb, 0.0) * W.body
    u_b = jnp.stack([hbx, hby, -jnp.ones_like(hbx)])               # (3,)
    G.add(_G_R, _G_R, (act_b**2) * (u_b[:, None] * u_b[None, :]))
    gv.add(_G_R, act_b * res_b * u_b)
    sq += _sq(res_b[None])

    # --- init (first knot): diagonal on first 8 groups ---------------------
    st = spec.start
    m0 = aux.is_first * W.init
    init_blocks = [r - st.r, th - st.eul, v - st.v, w - st.omega] + [
        p[i] - st.feet[i] for i in range(4)
    ]
    for gi, blk in enumerate(init_blocks):
        G.add(gi, gi, m0**2 * I3)
        gv.add(gi, m0**2 * blk)
        sq += _sq(m0 * blk)

    # --- goal (last knot) ---------------------------------------------------
    mG = aux.is_last * W.goal
    ez = jnp.zeros(3, dt_).at[2].set(1.0)
    G.add(_G_R, _G_R, mG**2 * I3)
    G.add(_G_TH, _G_TH, mG**2 * ez[:, None] * ez[None, :])
    G.add(_G_V, _G_V, 0.25 * mG**2 * I3)
    G.add(_G_W, _G_W, 0.25 * mG**2 * I3)
    gv.add(_G_R, mG**2 * (r - spec.goal_r))
    gv.add(_G_TH, mG**2 * (th[2] - spec.goal_yaw) * ez)
    gv.add(_G_V, 0.25 * mG**2 * v)
    gv.add(_G_W, 0.25 * mG**2 * w)
    sq += _sq(mG * (r - spec.goal_r)) + _sq(mG * (th[2] - spec.goal_yaw))
    sq += _sq(0.5 * mG * v) + _sq(0.5 * mG * w)

    return G.to_mat(), gv.to_vec(), sq


def interval_normal(xa, xb, ca, cb, spec: ProblemSpec, cfg: SolverConfig):
    """Per-interval normal-equation contributions.

    Returns (Daa, Dbb, Lba, ga, gb, sq): Daa = Ja^T Ja (adds to D_k),
    Dbb = Jb^T Jb (adds to D_{k+1}), Lba = Jb^T Ja (the (k+1, k) block),
    ga = Ja^T rho, gb = Jb^T rho, sq = sum(rho^2).

    The four dynamics row-groups are dense across column groups, so they are
    stacked as (4, 3, 36) row matrices (trailing dim 36 — lane-friendly) and
    contracted with one einsum; the diagonal regularizer families fold into a
    single diag() add.
    """
    W = cfg.weights
    dt = spec.dt
    sa, sb = unpack_state(xa), unpack_state(xb)
    r0, th0, v0, w0, p0, f0 = sa["r"], sa["th"], sa["v"], sa["w"], sa["p"], sa["f"]
    r1, th1, v1, w1, p1, f1 = sb["r"], sb["th"], sb["v"], sb["w"], sb["p"], sb["f"]
    dt_ = xa.dtype
    I3 = jnp.eye(3, dtype=dt_)
    Z3 = jnp.zeros((3, 3), dt_)

    def _rowmat(blocks):
        """dict {group: (3, 3)} -> (3, 36) block-row."""
        return jnp.concatenate([blocks.get(gi, Z3) for gi in range(12)], axis=-1)

    # dyn_r
    res_dr = (r1 - r0 - 0.5 * dt * (v0 + v1)) * W.dyn_r
    vblk = -0.5 * dt * W.dyn_r * I3
    Wa_r = _rowmat({_G_R: -W.dyn_r * I3, _G_V: vblk})
    Wb_r = _rowmat({_G_R: W.dyn_r * I3, _G_V: vblk})

    # dyn_th
    rate0 = omega_to_euler_rate(th0, w0)
    rate1 = omega_to_euler_rate(th1, w1)
    res_dth = (th1 - th0 - 0.5 * dt * (rate0 + rate1)) * W.dyn_th
    drate0 = jax.jacfwd(lambda t: omega_to_euler_rate(t, w0))(th0)
    drate1 = jax.jacfwd(lambda t: omega_to_euler_rate(t, w1))(th1)
    Wa_th = _rowmat(
        {
            _G_TH: (-I3 - 0.5 * dt * drate0) * W.dyn_th,
            _G_W: -0.5 * dt * euler_rate_matrix_inv(th0) * W.dyn_th,
        }
    )
    Wb_th = _rowmat(
        {
            _G_TH: (I3 - 0.5 * dt * drate1) * W.dyn_th,
            _G_W: -0.5 * dt * euler_rate_matrix_inv(th1) * W.dyn_th,
        }
    )

    # dyn_v
    a0 = jnp.sum(f0, axis=0) / Solo12.mass + GRAVITY
    a1 = jnp.sum(f1, axis=0) / Solo12.mass + GRAVITY
    res_dv = (v1 - v0 - 0.5 * dt * (a0 + a1)) * W.dyn_v
    fcoef = -0.5 * dt * FORCE_SCALE / Solo12.mass * W.dyn_v
    fblocks = {8 + i: fcoef * I3 for i in range(4)}
    Wa_v = _rowmat({_G_V: -W.dyn_v * I3, **fblocks})
    Wb_v = _rowmat({_G_V: W.dyn_v * I3, **fblocks})

    # dyn_w
    wd0, dwr0, dwth0, dwp0, dwf0, dww0 = _wdot_and_derivs(r0, th0, w0, p0, f0)
    wd1, dwr1, dwth1, dwp1, dwf1, dww1 = _wdot_and_derivs(r1, th1, w1, p1, f1)
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

    Wa = jnp.stack([Wa_r, Wa_th, Wa_v, Wa_w])                      # (4, 3, 36)
    Wb = jnp.stack([Wb_r, Wb_th, Wb_v, Wb_w])
    res_dyn = jnp.stack([res_dr, res_dth, res_dv, res_dw])         # (4, 3)

    Daa = jnp.einsum("gcu,gcv->uv", Wa, Wa)
    Dbb = jnp.einsum("gcu,gcv->uv", Wb, Wb)
    Lba = jnp.einsum("gcu,gcv->uv", Wb, Wa)
    ga = jnp.einsum("gcu,gc->u", Wa, res_dyn)
    gb = jnp.einsum("gcu,gc->u", Wb, res_dyn)
    sq = _sq(res_dyn)

    # ---- diagonal families: stationarity/footvel (p), acc reg, force rate --
    both = ca * cb
    ms = both * W.stat
    mv = (1.0 - both) * W.footvel_reg
    dp = p1 - p0
    res_stat = dp * ms[:, None]
    res_fv = dp * mv[:, None]
    sq += _sq(res_stat) + _sq(res_fv)
    cpp = ms**2 + mv**2                                            # (4,)
    gp = ms[:, None] * res_stat + mv[:, None] * res_fv             # (4, 3)

    res_av = (v1 - v0) * W.acc_reg
    res_aw = (w1 - w0) * W.acc_reg
    sq += _sq(res_av) + _sq(res_aw)
    w2 = W.acc_reg**2

    df = (f1 - f0) / FORCE_SCALE * W.f_reg
    sq += _sq(df)

    # diag layout: [r(3), th(3), v(3), w(3), p(12), f(12)]
    z3 = jnp.zeros(3, dt_)
    diag_coef = jnp.concatenate(
        [
            z3,
            z3,
            jnp.full(3, w2, dt_),
            jnp.full(3, w2, dt_),
            jnp.repeat(cpp, 3),
            jnp.full(12, W.f_reg**2, dt_),
        ]
    )
    gdiag = jnp.concatenate(
        [
            z3,
            z3,
            W.acc_reg * res_av,
            W.acc_reg * res_aw,
            gp.reshape(12),
            (W.f_reg * df).reshape(12),
        ]
    )
    dmat = jnp.diag(diag_coef)
    Daa = Daa + dmat
    Dbb = Dbb + dmat
    Lba = Lba - dmat
    ga = ga - gdiag
    gb = gb + gdiag

    return Daa, Dbb, Lba, ga, gb, sq
