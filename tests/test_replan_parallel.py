"""Receding-horizon runner + mesh-sharding tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtos_tpu.config import EXPERIMENTS, get_experiment
from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.parallel import make_mesh, shard_batch, solve_batch_sharded
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.terrain import make_terrain

pytestmark = pytest.mark.slow  # full receding-horizon runs



def test_experiment_presets_complete():
    """All ten reference experiments + the -T test preset exist."""
    for i in range(1, 11):
        exp = get_experiment(f"exp_{i}")
        assert exp.maps and exp.goal_xy
    assert "test" in EXPERIMENTS
    with pytest.raises(KeyError):
        get_experiment("exp_999")


def test_experiment_tiles_resolve():
    from qtos_tpu.terrain import tile

    for exp in EXPERIMENTS.values():
        for name in exp.maps:
            assert tile(name).shape[0] >= 20


def test_receding_horizon_short_run():
    """Mini flagship run: 1.2 m goal, a couple of stitched windows."""
    terr = make_terrain(["plane", "plane"])
    cfg = RunnerConfig(
        max_windows=6,
        solver=SolverConfig(max_iters=40, tol=4e-3),
        stance_warmup_steps=300,
    )
    runner = RecedingHorizonRunner(terr, goal_xy=(1.2, 0.0), cfg=cfg)
    rep = runner.run(verbose=False)
    assert rep.reached_goal
    assert rep.windows >= 2               # actually replanned/stitched
    assert rep.final_pos[0] > 1.0
    assert rep.avg_com_err_per_s < 120.0
    assert all(s == 0 for s in rep.statuses)


def test_mesh_sharded_solve_matches_unsharded():
    terr = make_terrain(["plane"])
    cfg = SolverConfig(max_iters=10)
    B = 8
    goals = jnp.linspace(0.2, 0.5, B)
    specs = jax.vmap(lambda g: default_spec(terr, goal_xy=(g, 0.0), K=13, duration=1.5))(goals)
    mesh = make_mesh(8)
    from qtos_tpu.solver.solve import solve_batch

    res_plain = solve_batch(specs, terr, cfg)
    res_shard = solve_batch_sharded(specs, terr, cfg, mesh)
    # Partitioned execution reorders float ops, so LM paths may diverge on the
    # feasibility manifold; assert semantic equivalence.
    np.testing.assert_array_equal(np.asarray(res_plain.status), np.asarray(res_shard.status))
    np.testing.assert_allclose(
        np.asarray(res_plain.x[:, :, :3]), np.asarray(res_shard.x[:, :, :3]), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(res_plain.max_violation),
        np.asarray(res_shard.max_violation),
        atol=5e-3,
    )


def test_shard_batch_places_on_all_devices():
    terr = make_terrain(["plane"])
    B = 8
    goals = jnp.linspace(0.2, 0.5, B)
    specs = jax.vmap(lambda g: default_spec(terr, goal_xy=(g, 0.0), K=13, duration=1.5))(goals)
    mesh = make_mesh(8)
    sharded = shard_batch(specs, mesh)
    leaf = sharded.goal_r
    assert len(leaf.sharding.device_set) == 8


def test_graft_entry_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out[0].shape[0] == 4
    g.dryrun_multichip(4)


def test_checkpoint_resume_roundtrip(tmp_path):
    """Interrupt a run mid-way, restore into a fresh runner, finish the walk
    (SURVEY.md §5.4: trajectory buffer + sim state + warm start as the
    resume unit)."""
    terr = make_terrain(["plane", "plane"])
    ckpt = str(tmp_path / "ck.npz")

    def mk_cfg(max_windows):
        return RunnerConfig(
            max_windows=max_windows,
            solver=SolverConfig(max_iters=40, tol=4e-3),
            stance_warmup_steps=300,
            checkpoint_every=1,
            checkpoint_path=ckpt,
        )

    r1 = RecedingHorizonRunner(terr, goal_xy=(2.0, 0.0), cfg=mk_cfg(2))
    rep1 = r1.run(verbose=False)
    assert not rep1.reached_goal  # interrupted early

    # state round-trips exactly
    r2 = RecedingHorizonRunner(terr, goal_xy=(2.0, 0.0), cfg=mk_cfg(10))
    r2.restore(ckpt)
    np.testing.assert_array_equal(np.asarray(r2.buffer), np.asarray(r1.buffer))
    assert r2.buffer_end == r1.buffer_end
    assert r2._st["exec_idx"] == r1._st["exec_idx"]
    np.testing.assert_array_equal(
        np.asarray(r2._st["sim"].pos), np.asarray(r1._st["sim"].pos)
    )

    rep2 = r2.run(verbose=False, resume_from=ckpt)
    assert rep2.reached_goal
    assert rep2.final_pos[0] > 1.7
    assert rep2.windows > rep1.windows    # history carried across the resume
