"""Gait registry + profiling/telemetry tests (round 2 additions)."""

import numpy as np
import jax.numpy as jnp

from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.gait import (
    GAIT_REGISTRY,
    bound_schedule,
    make_schedule,
    pace_schedule,
    trot_schedule,
)
from qtos_tpu.solver.solve import solve
from qtos_tpu.terrain import make_terrain

import pytest

pytestmark = pytest.mark.slow  # multi-gait end-to-end playbacks



def test_registry_names_and_shapes():
    for name in GAIT_REGISTRY:
        s = make_schedule(name, 25, 0.1)
        assert s.contact.shape == (25, 4), name
        assert s.swing_progress.shape == (25, 4), name
        c = np.asarray(s.contact)
        assert set(np.unique(c)).issubset({0.0, 1.0}), name
        # every schedule opens and closes in full stance (stitch points)
        np.testing.assert_allclose(c[0], 1.0)
        np.testing.assert_allclose(c[-1], 1.0)


def test_pace_lateral_pairs_and_bound_axial_pairs():
    K = 41
    pace = np.asarray(pace_schedule(K, 2.5 / (K - 1)).contact)
    mid = pace[8:-8]
    # FL==HL and FR==HR throughout (lateral pairs move together)
    np.testing.assert_allclose(mid[:, 0], mid[:, 2])
    np.testing.assert_allclose(mid[:, 1], mid[:, 3])
    assert mid.min() == 0.0

    bound = np.asarray(bound_schedule(K, 2.5 / (K - 1)).contact)
    mid = bound[8:-8]
    # FL==FR and HL==HR (front/hind pairs move together)
    np.testing.assert_allclose(mid[:, 0], mid[:, 1])
    np.testing.assert_allclose(mid[:, 2], mid[:, 3])
    assert mid.min() == 0.0


def test_unknown_gait_raises():
    import pytest

    with pytest.raises(KeyError):
        make_schedule("gallop-nope", 25, 0.1)


def test_pace_solve_converges():
    terrain = make_terrain(["plane"])
    K = 33
    sched = pace_schedule(K, 2.5 / (K - 1))
    spec = default_spec(terrain, goal_xy=(0.35, 0.0), K=K, schedule=sched)
    res = solve(spec, terrain, SolverConfig(max_iters=60))
    assert int(res.status) == 0


def test_solve_telemetry_fields():
    from qtos_tpu.utils.profiling import Timer, solve_telemetry

    terrain = make_terrain(["plane"])
    spec = default_spec(terrain, goal_xy=(0.2, 0.0), K=13, duration=1.5)
    with Timer() as t:
        res = solve(spec, terrain, SolverConfig(max_iters=20))
        t.block(res.x)
    tel = solve_telemetry(res, t.elapsed)
    assert tel["batch"] == 1
    assert 0.0 <= tel["convergence_rate"] <= 1.0
    assert tel["solves_per_s"] > 0
    assert tel["max_violation_max"] >= tel["max_violation_p50"]


def test_trace_annotate_smoke(tmp_path):
    from qtos_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path / "trace")):
        with annotate("tiny"):
            x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
            x.block_until_ready()


def test_mixed_schedule_batch_single_solve():
    """Heterogeneous gaits in ONE compiled batched solve: schedules are data
    (dense (K,4) masks), so trot/walk/pace/bound scenarios stack into a
    single solve_batch call — impossible in TOWR, whose gait is baked into
    the NLP's variable-set structure (reference: logs/towr_log.out:101-108)."""
    import jax

    from qtos_tpu.solver.solve import solve_batch

    terrain = make_terrain(["plane"])
    K = 33
    dt = 2.5 / (K - 1)
    names = ["trot", "walk", "pace", "bound"]
    scheds = [make_schedule(n, K, dt) for n in names]
    contact = jnp.stack([s.contact for s in scheds])
    prog = jnp.stack([s.swing_progress for s in scheds])

    def mk(c, p, goal):
        from qtos_tpu.solver.gait import GaitSchedule

        return default_spec(
            terrain, goal_xy=(goal, 0.0), K=K,
            schedule=GaitSchedule(contact=c, swing_progress=p),
        )

    specs = jax.vmap(mk)(contact, prog, jnp.array([0.4, 0.3, 0.3, 0.3]))
    res = solve_batch(specs, terrain, SolverConfig(max_iters=60, tol=4e-3))
    status = np.asarray(res.status)
    # all four gaits converge side by side in the same program
    assert (status == 0).all(), (names, status, np.asarray(res.max_violation))


def test_walk_gait_continuous_run_reaches_goal():
    """End-to-end gait plumbing: ExperimentConfig-style gait selection drives
    the runner (RunnerConfig.gait -> make_schedule -> every window), and a
    lateral-sequence walk actually walks to its goal."""
    from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig

    terrain = make_terrain(["plane", "plane"])
    cfg = RunnerConfig(
        gait="walk",
        avg_speed=0.15,                      # walk is slower than trot
        max_windows=8,
        solver=SolverConfig(max_iters=40, tol=4e-3),
        stance_warmup_steps=300,
        n_candidates=2,
    )
    runner = RecedingHorizonRunner(terrain, goal_xy=(1.0, 0.0), cfg=cfg)
    rep = runner.run(verbose=False)
    assert rep.reached_goal, (rep.final_pos, rep.statuses)
    assert all(s == 0 for s in rep.statuses)
