"""exp_8 dynamic terrain, demonstrated end to end: an obstacle spawns ON the
global path mid-run, the runner globally replans from the robot's live
position, routes around it, and still reaches the goal.

Reference: QTOS/simulation.py:102-115 `update` spawns GEOM_BOX obstacles at
(1.0 + idx, 0, 0.24) mid-run; experiment_8_dynamic_terrain.yml.  The
reference has no mid-run global replan (its bool map is probed once at
startup) — routing around a spawn is enabled here by the in-process planner
(`RecedingHorizonRunner._global_replan`).
"""

import numpy as np

from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.solver import SolverConfig
from qtos_tpu.terrain import make_terrain
from qtos_tpu.terrain.heightfield import add_box_obstacle

import pytest

pytestmark = pytest.mark.slow  # end-to-end dynamic-terrain replan runs



def _cfg(**kw):
    base = dict(
        solver=SolverConfig(max_iters=40, tol=4e-3),
        stance_warmup_steps=300,
        n_candidates=2,
    )
    base.update(kw)
    return RunnerConfig(**base)


def test_obstacle_spawn_routes_around_and_reaches_goal():
    terr = make_terrain(["plane", "plane"])
    spawned = {"v": False}

    # 0.34 m box straddling the spine ahead of the robot (too tall to step
    # over: traversability height_bound is 0.2), spawned once it is walking
    def spawn(window, t):
        if window == 1 and not spawned["v"]:
            spawned["v"] = True
            return add_box_obstacle(t, 1.3, 0.0, half=0.15)
        return t

    # routing is the capability under test, not speed: the bypass is two
    # S-turns, so pace it gently (the controller's heading loop is tuned on
    # straight-line spines)
    cfg = _cfg(max_windows=20, terrain_update=spawn, avg_speed=0.15)
    r = RecedingHorizonRunner(terr, goal_xy=(2.4, 0.0), cfg=cfg)
    spine_y_before = [r.planner._point_np(t)[1] for t in (4.0, 5.0)]
    rep = r.run(verbose=False)

    assert spawned["v"]
    assert rep.reached_goal
    assert not rep.aborted
    # the replanned spine diverts laterally where the straight one did not
    t_obs = r.planner.time_at_position((1.3, 0.0))
    y_at_obs = r.planner._point_np(t_obs)[1]
    assert abs(y_at_obs) > 0.2, (
        f"replanned spine still passes over the obstacle (y={y_at_obs:.2f})"
    )
    assert max(abs(y) for y in spine_y_before) < 0.15
    # the realized path actually skirted the box: at the obstacle's x band
    # the robot was displaced laterally
    pos = rep.sim_pos_series
    band = pos[(pos[:, 0] > 1.1) & (pos[:, 0] < 1.5)]
    assert band.size and np.abs(band[:, 1]).max() > 0.15


def test_spawn_behind_robot_keeps_straight_spine():
    """An obstacle appearing BEHIND the robot must not divert the path."""
    terr = make_terrain(["plane", "plane"])

    def spawn(window, t):
        if window == 2:
            return add_box_obstacle(t, 0.1, 0.0, half=0.1)
        return t

    cfg = _cfg(max_windows=12, terrain_update=spawn)
    r = RecedingHorizonRunner(terr, goal_xy=(1.8, 0.0), cfg=cfg)
    rep = r.run(verbose=False)
    assert rep.reached_goal
    assert not rep.aborted
    assert abs(rep.final_pos[1]) < 0.15
