"""PyBullet cross-engine verification (BASELINE north-star: "keeping
PyBullet as host-side verifier").

The TPU image ships no pybullet wheel, so these tests skip there — but the
adapter, the vendored SOLO12 URDF (data/urdf/solo12.urdf, the reference's
own robot description), and this test are the executable recipe: any host
with `pip install pybullet` cross-checks the JAX engine against Bullet by
replaying the same solved trajectory through both.
"""

import os

import numpy as np
import pytest

pybullet = pytest.importorskip("pybullet")

URDF = os.path.join(os.path.dirname(__file__), "..", "data", "urdf", "solo12.urdf")


@pytest.fixture(scope="module")
def solved_table():
    from qtos_tpu.solver import SolverConfig, default_spec, sample_trajectory, solve
    from qtos_tpu.terrain import make_terrain

    terrain = make_terrain(["plane", "plane"])
    spec = default_spec(terrain, goal_xy=(0.5, 0.0), K=33)
    res = solve(spec, terrain, SolverConfig(max_iters=40))
    assert int(res.status) == 0
    table, _ = sample_trajectory(res.x, spec)
    return terrain, np.asarray(table)


def test_urdf_vendored():
    assert os.path.exists(URDF)


def test_bullet_replay_tracks_plan(solved_table):
    from qtos_tpu.sim.pybullet_adapter import BulletVerifier

    terrain, table = solved_table
    verifier = BulletVerifier(terrain, URDF)
    com = verifier.replay(table)
    # Bullet-tracked CoM follows the planned CoM to within coarse agreement
    # (different contact models); the JAX engine is pinned much tighter by
    # tests/test_sim_control.py
    plan = table[:, 1:4]
    err = np.linalg.norm(com[: len(plan)] - plan[: len(com)], axis=-1)
    assert np.isfinite(err).all()
    assert err.mean() < 0.25


def test_cross_engine_final_positions_agree(solved_table):
    from qtos_tpu.control import ControlParams, playback, stance_warmup
    from qtos_tpu.control.loop import state_from_row
    from qtos_tpu.sim.pybullet_adapter import BulletVerifier

    terrain, table = solved_table
    params = ControlParams()
    s0 = stance_warmup(state_from_row(table[0], terrain, params), terrain, params, 300)
    fin, _ = playback(table, s0, terrain, params)
    jax_final = np.asarray(fin.pos)

    com = BulletVerifier(terrain, URDF).replay(table)
    assert np.linalg.norm(com[-1][:2] - jax_final[:2]) < 0.3
