"""Runner failure policy: stance-hold fallback + watchdog + recovery.

Reference behaviors being matched: initial-solve returncode abort
(scripts/main.py:93-103), the horizon-behind watchdog (QTOS/combiner.py:
223-225), and stance as the safe state (QTOS/robot/robot.py:527-561).

The unsolvable window is induced physically: a 1 m wall tile blocks the
path, and the runner is given an all-clear obstacle map (as if the
feasibility probe had missed it), so the global spline drives window goals
straight into the wall.  Window solves then fail with large violations
(CoM must climb 1 m in 2.5 s -> range-of-motion/dynamics blowup), which must
trigger the stance-hold fallback instead of executing a garbage segment.
"""

import numpy as np
import pytest

from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.solver import SolverConfig
from qtos_tpu.terrain import make_terrain

pytestmark = pytest.mark.slow  # end-to-end failure-injection replan runs



def _wall_world():
    terr = make_terrain(["plane", "wall", "plane"])
    H, W = np.asarray(terr.height).shape
    return terr, np.zeros((H, W))


def _cfg(**kw):
    base = dict(
        solver=SolverConfig(max_iters=25, tol=4e-3),
        escalate_iters=25,
        stance_warmup_steps=300,
        n_candidates=2,
    )
    base.update(kw)
    return RunnerConfig(**base)


def test_watchdog_aborts_after_consecutive_failures():
    """Wall never clears: stance holds accumulate, watchdog fires, and the
    robot is left standing safely short of the wall — no garbage execution."""
    terr, blocked = _wall_world()
    runner = RecedingHorizonRunner(
        terr, goal_xy=(3.6, 0.0), cfg=_cfg(max_windows=8, max_consec_failures=2),
        blocked=blocked,
    )
    rep = runner.run(verbose=False)
    assert rep.aborted
    assert rep.stance_holds >= 2
    assert not rep.reached_goal
    # failed windows were NOT stitched as garbage: the robot held near the
    # wall, upright, at stand height
    assert rep.final_pos[0] < 1.9            # wall band starts at x~1.9
    assert 0.15 < rep.final_pos[2] < 0.35
    assert any(s != 0 for s in rep.statuses)


def test_stance_hold_then_recovery():
    """Wall clears mid-run (dynamic terrain): after holding stance, planning
    recovers (statuses return to 0) and the robot advances again."""
    terr, blocked = _wall_world()
    flat = make_terrain(["plane", "plane", "plane"])

    def clear_wall(window, t):
        return flat if window >= 3 else t

    runner = RecedingHorizonRunner(
        terr, goal_xy=(3.6, 0.0),
        cfg=_cfg(max_windows=12, max_consec_failures=5, terrain_update=clear_wall),
        blocked=blocked,
    )
    rep = runner.run(verbose=False)
    assert rep.stance_holds >= 1             # fallback engaged at the wall
    assert not rep.aborted                   # ...but recovered before watchdog
    # a successful plan followed a failure
    s = rep.statuses
    first_bad = next(i for i, v in enumerate(s) if v != 0)
    assert any(v == 0 for v in s[first_bad + 1:])
    # the robot kept executing (no garbage segment knocked it over) and is
    # still upright at stand height.  (Post-recovery the CPU-precision sim
    # tracks the resumed plan loosely — the policy guarantees safety +
    # replanning recovery, not CPU-backend tracking quality.)
    assert rep.sim_ticks > 15000
    assert 0.15 < rep.final_pos[2] < 0.35


def test_initial_failure_aborts():
    """A hopeless initial window aborts the run like the reference's
    returncode check (scripts/main.py:93-103)."""
    terr = make_terrain(["wall"])            # wall right on the start tile
    H, W = np.asarray(terr.height).shape
    with pytest.raises(RuntimeError, match="initial window"):
        RecedingHorizonRunner(
            terr, goal_xy=(0.9, 0.0),
            cfg=_cfg(max_windows=2, max_consec_failures=1),
            blocked=np.zeros((H, W)),
        ).run(verbose=False)
