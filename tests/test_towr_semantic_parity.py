"""Constraint-semantics parity against TOWR's own golden trajectory.

BASELINE.md's deviation gate requires "replicating constraint semantics"
(SURVEY.md §7 hard parts).  Rather than comparing trajectories pointwise —
two different transcriptions of the same feasibility NLP legitimately pick
different feasible gaits — we check the stronger structural claim: the
reference's checked-in TOWR/IPOPT solution (data/traj/towr.csv, 6255 rows
@ 1 kHz, flat ground) must satisfy OUR constraint families to within IPOPT's
own converged tolerance (NLP error 3.3e-4, logs/towr_log.out:57-62) plus
finite-differencing noise.  If TOWR's output were infeasible under our
residual definitions, our solver would be solving a different problem.
"""

import os

import numpy as np
import pytest

GOLDEN = "/root/reference/data/traj/towr.csv"

G = 9.81
MU = 0.7  # our SolverConfig.mu_friction (TOWR default terrain friction)


@pytest.fixture(scope="module")
def tab():
    if not os.path.exists(GOLDEN):
        pytest.skip("reference fixture not present")
    return np.loadtxt(GOLDEN, delimiter=",")


def _cols(tab):
    t = tab[:, 0]
    r = tab[:, 1:4]
    eul = tab[:, 4:7]
    feet = tab[:, 7:19].reshape(-1, 4, 3)
    v = tab[:, 19:22]
    f = tab[:, 25:37].reshape(-1, 4, 3)
    return t, r, eul, feet, v, f


def test_srb_linear_dynamics(tab):
    """m (dv/dt - g) == sum of foot forces: the `dynamic` constraint family
    (reference: logs/towr_log.out:115, 312 eq constraints).

    The SRB mass is inferred from the data (mean total fz / g ≈ 3.0 kg):
    TOWR's solo12 fork models a heavier SRB than the 1.16 kg `mass:` entry in
    the reference's solo12.yml, which is only the URDF's commented-out dummy
    base-link mass (real links total 3.84 kg).  Solo12.mass adopts this
    identified 3.0 kg (see tests/test_towr_deviation.py::test_srb_mass_matches_towr),
    making solver, sim, and the deviation gate all consistent with TOWR."""
    t, r, eul, feet, v, f = _cols(tab)
    fz_sum = f[..., 2].sum(axis=1)
    m = fz_sum.mean() / G
    assert 2.0 < m < 4.0, m                     # sane SRB mass
    k = 50                                      # 50 ms FD window kills sampling noise
    a = (v[k:] - v[:-k]) / (t[k:] - t[:-k])[:, None]
    ftot = f.sum(axis=1)
    fmid = 0.5 * (ftot[: len(a)] + ftot[k : k + len(a)])
    resid = m * a - (fmid + m * np.array([0.0, 0.0, -G]))
    med = np.median(np.abs(resid), axis=0)
    assert (med < 0.01 * m * G).all(), med      # ≤1% of weight per axis
    assert np.quantile(np.abs(resid), 0.95) < 0.05 * m * G


def test_unilateral_and_friction_cone(tab):
    """`force` family: fz >= 0 and |f_xy| <= mu fz (towr_log.out:122-125)."""
    *_, f = _cols(tab)
    fz = f[..., 2]
    assert fz.min() > -1e-6                      # unilateral
    fxy = np.linalg.norm(f[..., :2], axis=-1)
    in_contact = fz > 1.0                        # N
    slack = fxy[in_contact] - MU * fz[in_contact]
    assert np.quantile(slack, 0.999) < 1e-3      # cone satisfied (pyramid<=cone)


def test_stance_feet_on_terrain_and_stationary(tab):
    """`terrain-ee-motion` family: stance feet pinned to the height map
    (flat ground here: z == 0) and not sliding."""
    t, r, eul, feet, v, f = _cols(tab)
    in_contact = f[..., 2] > 1.0
    pz = feet[..., 2]
    assert np.abs(pz[in_contact]).max() < 1e-3   # on terrain (IPOPT tol scale)
    dp = np.linalg.norm(np.diff(feet, axis=0), axis=-1)  # per-ms foot motion
    both = in_contact[:-1] & in_contact[1:]
    assert np.quantile(dp[both], 0.999) < 5e-4   # < 0.5 mm/ms slip


def test_kinematic_range_of_motion(tab):
    """`rom` family: feet stay inside a base-frame box around the nominal
    stance (towr_log.out:118-121; our SolverConfig.rom_box (0.14,0.08,0.10))."""
    import jax
    import jax.numpy as jnp

    from qtos_tpu.models.solo12 import Solo12
    from qtos_tpu.ops.rotations import euler_to_rot

    t, r, eul, feet, v, f = _cols(tab)
    Rm = np.asarray(jax.vmap(euler_to_rot)(jnp.asarray(eul, jnp.float32)))
    rel = np.einsum("tij,tkj->tki", Rm.transpose(0, 2, 1), feet - r[:, None, :])
    nominal = np.asarray(Solo12.nominal_feet)
    dev = np.abs(rel - nominal[None])
    box = np.array([0.14, 0.08, 0.10])
    frac_outside = (dev > box[None, None, :] + 5e-3).mean()
    assert frac_outside < 0.01, frac_outside     # TOWR's box differs slightly;
    #                                              ours must contain its motion


def test_swing_clearance_consistent(tab):
    """Swing feet lift off the terrain (the `swing` shape family) — mid-swing
    apex must reach centimeters of clearance, as our swing constraint also
    demands (SolverConfig.swing_clearance = 0.06 at apex)."""
    t, r, eul, feet_, v_, f_ = _cols(tab)
    swing = f_[..., 2] <= 1.0
    pz = feet_[..., 2]
    # every foot that swings reaches >= 2 cm somewhere during the run
    for leg in range(4):
        if swing[:, leg].any():
            assert pz[swing[:, leg], leg].max() > 0.02
