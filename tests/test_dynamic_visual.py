"""Dynamic terrain, speculative multi-window planning, visual artifacts,
pybullet gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtos_tpu.control.replan import RunnerConfig, plan_windows_batch
from qtos_tpu.sim.pybullet_adapter import BulletVerifier, pybullet_available
from qtos_tpu.solver import SolverConfig, default_spec, sample_trajectory, solve
from qtos_tpu.terrain import Terrain, height_at, make_terrain
from qtos_tpu.terrain.heightfield import shift_terrain
from qtos_tpu.utils.visual import VisualPlanner

pytestmark = pytest.mark.slow  # renders + dynamic-terrain playbacks



def test_shift_terrain_scrolls_and_fills():
    # reference step.txt: band at rows 13..19 (y in [0.3, 1.0]), all x
    terr = make_terrain(["step"])
    h0 = float(height_at(terr, jnp.array(0.2), jnp.array(0.65)))
    assert h0 == pytest.approx(0.13)
    shifted = shift_terrain(terr, rows=-3)
    # band moved -3 cells (-0.3 m) in y; vacated top rows filled with 0
    assert float(height_at(shifted, jnp.array(0.2), jnp.array(0.35))) == pytest.approx(0.13)
    assert float(height_at(shifted, jnp.array(0.2), jnp.array(0.95))) == 0.0
    assert shifted.height.shape == terr.height.shape


def test_shift_terrain_jittable():
    terr = make_terrain(["plane"])
    f = jax.jit(lambda t: shift_terrain(t, rows=1, cols=-2, fill=0.5))
    out = f(terr)
    assert out.height.shape == terr.height.shape


def test_plan_windows_batch_speculative():
    terr = make_terrain(["plane"])
    cfg = RunnerConfig(K=17, window_duration=1.5, solver=SolverConfig(max_iters=25))
    k = 3
    rows = []
    for x in [0.0, 0.2, 0.4]:
        spec = default_spec(terr, start_xy=(x, 0.0), goal_xy=(x, 0.0), K=17, duration=1.5)
        st = spec.start
        rows.append(
            jnp.concatenate(
                [jnp.zeros(1), st.r, st.eul, st.feet.reshape(12), st.v, st.omega, jnp.zeros(12)]
            )
        )
    rows = jnp.stack(rows)
    goals = jnp.stack([jnp.array([0.3, 0.0, 0.24]), jnp.array([0.5, 0.0, 0.24]), jnp.array([0.7, 0.0, 0.24])])
    yaws = jnp.zeros(3)
    res, tables, contacts = plan_windows_batch(rows, goals, yaws, terr, cfg)
    assert tables.shape == (k, 1501, 37)
    assert int(np.sum(np.asarray(res.status) == 0)) >= 2


def test_visual_planner_artifact(tmp_path):
    terr = make_terrain(["plane"])
    spec = default_spec(terr, goal_xy=(0.3, 0.0), K=17, duration=1.5)
    res = solve(spec, terr, SolverConfig(max_iters=20))
    table, _ = sample_trajectory(res.x, spec)
    vp = VisualPlanner(np.asarray(table), out_dir=str(tmp_path))
    path = vp.render(0)
    import os

    assert os.path.getsize(path) > 5000


def test_pybullet_adapter_gated():
    assert not pybullet_available()  # not in the TPU image
    terr = make_terrain(["plane"])
    with pytest.raises(ImportError):
        BulletVerifier(terr, "does_not_matter.urdf")
