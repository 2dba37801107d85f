"""Simulator + control loop tests (the reference had only the `-T` smoke
replay — SURVEY.md §4; we assert quantitatively)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtos_tpu.control import ControlParams, playback, stance_warmup
from qtos_tpu.control.loop import decode_row, state_from_row
from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.sim import SimParams, init_state, sim_step
from qtos_tpu.sim.engine import foot_kinematics
from qtos_tpu.sim.motor import MotorParams, pd_torque
from qtos_tpu.solver import SolverConfig, default_spec, sample_trajectory, solve
from qtos_tpu.terrain import make_terrain

TERR = make_terrain(["plane", "plane"])


@pytest.fixture(scope="module")
def trot_table():
    spec = default_spec(TERR, goal_xy=(0.5, 0.0), K=33)
    res = solve(spec, TERR, SolverConfig(max_iters=30))
    assert int(res.status) == 0
    table, contact = sample_trajectory(res.x, spec)
    return table, contact, spec


def test_stance_settles():
    q = Solo12.ik(Solo12.nominal_feet)
    s = init_state(jnp.array([0.0, 0.0, 0.24]), jnp.zeros(3), q)
    s = stance_warmup(s, TERR, ControlParams(), 800)
    assert abs(float(s.pos[2]) - 0.24) < 0.01
    assert float(jnp.linalg.norm(s.v)) < 0.02
    assert float(jnp.linalg.norm(s.w)) < 0.05
    np.testing.assert_allclose(np.asarray(s.pos[:2]), 0.0, atol=5e-3)


def test_freefall_without_torque():
    q = Solo12.ik(Solo12.nominal_feet)
    s = init_state(jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), q)
    for _ in range(100):
        s = sim_step(s, jnp.zeros(12), TERR, SimParams())
    # ~0.049 m fall in 0.1 s
    assert abs(float(s.pos[2]) - (1.0 - 0.5 * 9.81 * 0.01)) < 2e-3
    assert abs(float(s.v[2]) + 9.81 * 0.1) < 1e-2


def test_ground_reaction_supports_weight():
    q = Solo12.ik(Solo12.nominal_feet)
    s = init_state(jnp.array([0.0, 0.0, 0.24]), jnp.zeros(3), q)
    s = stance_warmup(s, TERR, ControlParams(), 600)
    from qtos_tpu.sim.engine import contact_forces

    fw, fv, _, _, _ = foot_kinematics(s)
    fc, _ = contact_forces(SimParams(), TERR, fw, fv, s.anchor)
    total_fz = float(jnp.sum(fc[:, 2]))
    assert abs(total_fz - Solo12.mass * 9.81) < 1.5


def test_motor_clips_at_t_max():
    p = MotorParams()
    tau = pd_torque(p, jnp.full(12, 10.0), jnp.zeros(12), jnp.zeros(12), jnp.zeros(12))
    np.testing.assert_allclose(np.asarray(tau), p.t_max)


def test_playback_tracks_trot(trot_table):
    """Full pipeline: solve -> sample -> sim playback. CoM tracking must beat
    the reference's logged metric (~60, logs/experiment_data.out)."""
    table, contact, spec = trot_table
    params = ControlParams()
    s0 = state_from_row(table[0], TERR, params)
    s0 = stance_warmup(s0, TERR, params, 500)
    final, m = playback(table, s0, TERR, params)
    plan_end = np.asarray(table[-1, 1:4])
    assert float(m.avg_com_err_per_s) < 60.0
    assert abs(float(final.pos[0]) - plan_end[0]) < 0.12
    assert abs(float(final.pos[2]) - plan_end[2]) < 0.03


def test_playback_is_jittable_end_to_end(trot_table):
    table, _, _ = trot_table
    params = ControlParams()
    s0 = state_from_row(table[0], TERR, params)

    @jax.jit
    def episode(tab, s):
        s = stance_warmup(s, TERR, params, 100)
        return playback(tab, s, TERR, params)

    final, m = episode(table[:500], s0)
    assert np.isfinite(float(m.cum_com_err))


def test_decode_row_matches_reference_schema():
    row = jnp.arange(37.0)
    cmd = decode_row(row)
    assert float(cmd["t"]) == 0.0
    np.testing.assert_allclose(np.asarray(cmd["r"]), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(cmd["feet"])[0], [7, 8, 9])    # FL
    np.testing.assert_allclose(np.asarray(cmd["feet"])[3], [16, 17, 18])  # HR
    np.testing.assert_allclose(np.asarray(cmd["v"]), [19, 20, 21])
    np.testing.assert_allclose(np.asarray(cmd["f"])[0], [25, 26, 27])


def test_replay_reference_golden_gait():
    """The reference's `-T` test replays test/data/traj/gait.csv through the
    full control stack (scripts/main.py:181-199). Same here, through ours."""
    import os

    path = "/root/reference/test/data/traj/gait.csv"
    if not os.path.exists(path):
        pytest.skip("reference fixture not present")
    from qtos_tpu.solver.sampler import csv_to_table

    tab = jnp.asarray(csv_to_table(path)[:1500])
    params = ControlParams()
    s0 = state_from_row(tab[0], TERR, params)
    s0 = stance_warmup(s0, TERR, params, 300)
    final, m = playback(tab, s0, TERR, params)
    assert np.isfinite(float(m.cum_com_err))
    # robot should roughly follow the fixture's CoM path
    assert float(m.com_err.mean()) < 0.15
