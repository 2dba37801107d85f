"""Solver correctness tests (small K to keep CPU runtime reasonable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.solver import (
    SolverConfig,
    default_spec,
    sample_trajectory,
    solve,
    solve_batch,
)
from qtos_tpu.solver.gait import stand_schedule, trot_schedule
from qtos_tpu.solver.spec import unpack_state
from qtos_tpu.solver.transcription import initial_guess, srb_accels, violations
from qtos_tpu.terrain import make_terrain

TERR = make_terrain(["plane", "plane"])
CFG = SolverConfig(max_iters=30)


def test_srb_statics_balance():
    """Static stance with gravity-balancing forces has zero accelerations."""
    r = jnp.array([0.0, 0.0, 0.24])
    th = jnp.zeros(3)
    w = jnp.zeros(3)
    p = Solo12.nominal_feet + r
    p = p.at[:, 2].set(0.0)
    f = jnp.zeros((4, 3)).at[:, 2].set(Solo12.mass * 9.81 / 4)
    a, wd = srb_accels(r, th, w, f, p)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wd), 0.0, atol=1e-5)


def test_schedule_shapes_and_stance_ends():
    sched = trot_schedule(33, 2.5 / 32)
    assert sched.contact.shape == (33, 4)
    # full stance at both window ends (stitch points exist)
    np.testing.assert_allclose(np.asarray(sched.contact[0]), 1.0)
    np.testing.assert_allclose(np.asarray(sched.contact[-1]), 1.0)
    # trot alternates diagonal pairs somewhere in the middle
    mid = np.asarray(sched.contact[10:22])
    assert mid.min() == 0.0


def test_stand_solve_converges_tight():
    spec = default_spec(TERR, goal_xy=(0.0, 0.0), K=25, schedule=stand_schedule(25))
    res = solve(spec, TERR, CFG)
    assert int(res.status) == 0
    assert float(res.max_violation) < 1e-5


def test_trot_solve_converges_and_reaches_goal():
    spec = default_spec(TERR, goal_xy=(0.5, 0.0), K=33)
    res = solve(spec, TERR, CFG)
    assert int(res.status) == 0
    s = unpack_state(res.x)
    np.testing.assert_allclose(np.asarray(s["r"][-1][:2]), [0.5, 0.0], atol=5e-3)
    # feet end on the ground, forces stay unilateral in stance
    c = np.asarray(spec.schedule.contact)
    fz = np.asarray(s["f"][..., 2])
    assert (fz[c > 0.5] > -0.5).all()
    assert float(np.abs(np.asarray(s["p"][..., 2]))[c > 0.5].max()) < 5e-3


def test_swing_feet_clear_ground():
    spec = default_spec(TERR, goal_xy=(0.5, 0.0), K=33)
    res = solve(spec, TERR, CFG)
    s = unpack_state(res.x)
    sw = np.asarray(spec.schedule.swing_progress)
    pz = np.asarray(s["p"][..., 2])
    mid_swing = (sw > 0.35) & (sw < 0.65)
    if mid_swing.any():
        assert pz[mid_swing].min() > 0.015  # clears ground at mid-swing


@pytest.mark.slow  # compile-bound (extra solver program variants); nightly
def test_batch_matches_single():
    """vmapped batch solve is semantically equivalent to individual solves.

    The NLP is a feasibility problem (zero objective, like TOWR —
    logs/towr_log.out:55), so float reassociation under vmap may land on a
    nearby point of the solution manifold; we assert both converge and agree
    on the CoM path."""
    goals = jnp.array([0.3, 0.5])
    specs = jax.vmap(lambda g: default_spec(TERR, goal_xy=(g, 0.0), K=25))(goals)
    res_b = solve_batch(specs, TERR, CFG)
    res_0 = solve(jax.tree.map(lambda l: l[0], specs), TERR, CFG)
    assert int(res_b.status[0]) == 0 and int(res_0.status) == 0
    assert float(res_b.max_violation[0]) < CFG.tol
    np.testing.assert_allclose(
        np.asarray(res_b.x[0][:, :3]), np.asarray(res_0.x[:, :3]), atol=0.08
    )


def test_solve_on_step_terrain():
    terr = make_terrain(["plane", "step_2"])
    spec = default_spec(terr, start_xy=(0.4, 0.0), goal_xy=(1.0, 0.0), K=33)
    res = solve(spec, terr, CFG)
    assert float(res.max_violation) < 5e-3
    s = unpack_state(res.x)
    # terrain step_2 raises ground ahead; stance feet must follow the surface
    assert float(np.asarray(s["p"][..., 2]).max()) > 0.02


def test_violations_of_initial_guess_nonzero():
    spec = default_spec(TERR, goal_xy=(0.5, 0.0), K=33)
    x0 = initial_guess(spec, TERR, CFG)
    v = violations(x0, spec, TERR, CFG)
    assert float(v["dynamics"]) > 1e-3  # guess is infeasible; solver must work


def test_sampler_schema_and_continuity():
    spec = default_spec(TERR, goal_xy=(0.4, 0.0), K=25)
    res = solve(spec, TERR, CFG)
    table, contact = sample_trajectory(res.x, spec, hz=1000)
    duration = spec.dt * (spec.num_knots - 1)
    assert table.shape == (int(round(duration * 1000)) + 1, 37)
    assert contact.shape == (table.shape[0], 4)
    t = np.asarray(table)
    # time column is 1 kHz
    np.testing.assert_allclose(np.diff(t[:, 0]), 1e-3, atol=1e-6)
    # position columns continuous (< 1.5 mm per ms)
    assert np.abs(np.diff(t[:, 1:4], axis=0)).max() < 1.5e-3
    # starts at the canonical start state
    np.testing.assert_allclose(t[0, 1:4], np.asarray(spec.start.r), atol=2e-3)
    np.testing.assert_allclose(
        t[0, 7:19].reshape(4, 3), np.asarray(spec.start.feet), atol=2e-3
    )


def test_sampler_csv_roundtrip(tmp_path):
    from qtos_tpu.solver.sampler import csv_to_table, table_to_csv

    spec = default_spec(TERR, goal_xy=(0.3, 0.0), K=25)
    res = solve(spec, TERR, CFG)
    table, _ = sample_trajectory(res.x, spec)
    p = str(tmp_path / "traj.csv")
    table_to_csv(p, table)
    back = csv_to_table(p)
    np.testing.assert_allclose(back, np.asarray(table), rtol=1e-4, atol=1e-5)


def test_reference_golden_csv_parses():
    """Golden fixture interop: the reference's checked-in TOWR output parses
    into our schema (reference: data/traj/towr.csv, 37 cols)."""
    import os

    path = "/root/reference/data/traj/towr.csv"
    if not os.path.exists(path):
        pytest.skip("reference fixture not present")
    from qtos_tpu.solver.sampler import csv_to_table

    t = csv_to_table(path)
    assert t.shape[1] == 37
    # decode: CoM z stays near stand height
    assert 0.1 < t[:, 3].mean() < 0.4


@pytest.mark.slow  # compile-bound (extra solver program variants); nightly
def test_rescue_pass_improves_unconverged():
    """Two-pass rescue: a starved first pass (2 iters) leaves stragglers; the
    compacted warm-started rescue pass must converge them and only ever
    improve per-scenario violations."""
    B, K = 8, 13
    goals = jnp.linspace(0.1, 0.45, B)
    specs = jax.vmap(lambda g: default_spec(TERR, goal_xy=(g, 0.0), K=K, duration=1.5))(goals)

    starved = solve_batch(specs, TERR, SolverConfig(max_iters=2))
    rescued = solve_batch(specs, TERR, SolverConfig(max_iters=2, rescue_iters=20, rescue_frac=1))

    v0 = np.asarray(starved.max_violation)
    v1 = np.asarray(rescued.max_violation)
    assert (v1 <= v0 + 1e-9).all()
    assert (np.asarray(rescued.status) == 0).all()
    # converged lanes from pass 1 must be untouched
    ok = np.asarray(starved.status) == 0
    np.testing.assert_array_equal(np.asarray(rescued.x)[ok], np.asarray(starved.x)[ok])


@pytest.mark.slow  # compile-bound (extra solver program variants); nightly
def test_rescue_noop_when_all_converged():
    B, K = 4, 13
    goals = jnp.linspace(0.1, 0.3, B)
    specs = jax.vmap(lambda g: default_spec(TERR, goal_xy=(g, 0.0), K=K, duration=1.5))(goals)
    full = solve_batch(specs, TERR, SolverConfig(max_iters=25))
    with_rescue = solve_batch(specs, TERR, SolverConfig(max_iters=25, rescue_iters=5))
    assert (np.asarray(full.status) == 0).all()
    np.testing.assert_array_equal(np.asarray(with_rescue.x), np.asarray(full.x))
