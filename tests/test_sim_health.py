"""Sim-health watchdog: fall / tracking-divergence detection in the runner.

The solver-side failure policy (test_failure_policy.py) watches solver
status; these tests cover its tracking-side twin — the reference has no
true analog (its goal-progress watchdog, QTOS/combiner.py:223-225, kills a
run whose horizon stalls, but a fallen robot with a happy solver would walk
through it).  Faults are injected by wrapping the runner's exec dispatch:
the plan/solve path is untouched (solver status stays 0 throughout), so the
tests prove detection is keyed to the SIM state, not the solver.

Also covers the exec-slice mask (ticks past buffer_end must never reach the
sim) and long-run buffer compaction.
"""

import jax.numpy as jnp
import numpy as np

from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.solver import SolverConfig
from qtos_tpu.terrain import make_terrain

import pytest

pytestmark = pytest.mark.slow  # end-to-end watchdog/fall runs



def _cfg(**kw):
    base = dict(
        solver=SolverConfig(max_iters=40, tol=4e-3),
        stance_warmup_steps=300,
        n_candidates=2,
    )
    base.update(kw)
    return RunnerConfig(**base)


def _inject(runner, mutate_after, mutate):
    """Wrap the exec dispatch: windows >= mutate_after return a mutated
    (sim_next, metrics)."""
    orig = runner._exec_jit
    count = {"n": 0}

    def wrapped(buf, start, n_valid, s0, terr):
        s1, m = orig(buf, start, n_valid, s0, terr)
        i = count["n"]
        count["n"] += 1
        if i >= mutate_after:
            s1, m = mutate(s1, m)
        return s1, m

    runner._exec_jit = wrapped
    return count


def test_fall_detection_aborts():
    """A fallen robot (z on the ground) with all-status-0 solves must abort
    within a couple of windows — not stitch dozens of garbage windows (the
    round-3 exp_9 failure mode: 22 windows executed onto a fallen robot)."""
    terr = make_terrain(["plane", "plane", "plane"])
    r = RecedingHorizonRunner(terr, goal_xy=(2.5, 0.0), cfg=_cfg(max_windows=12))

    def fall(s1, m):
        return s1.replace(pos=s1.pos.at[2].set(0.05)), m

    _inject(r, mutate_after=2, mutate=fall)
    rep = r.run(verbose=False)
    assert rep.aborted
    assert not rep.reached_goal
    assert rep.windows <= 5           # detected at the first fallen window
    assert all(s == 0 for s in rep.statuses)  # solver never complained


def test_divergence_triggers_reality_reset_then_abort():
    """Persistent tracking divergence (upright but far off plan) triggers
    stance-hold reality resets, then the watchdog abort."""
    terr = make_terrain(["plane", "plane", "plane"])
    r = RecedingHorizonRunner(terr, goal_xy=(2.5, 0.0), cfg=_cfg(max_windows=12))

    def veer(s1, m):
        # upright, but the whole window tracked ~0.5 m off the plan
        s1 = s1.replace(pos=s1.pos.at[1].add(0.5))
        m = m.replace(com_err=m.com_err + 0.5)
        return s1, m

    _inject(r, mutate_after=1, mutate=veer)
    rep = r.run(verbose=False)
    assert rep.aborted
    assert not rep.reached_goal
    assert rep.stance_holds >= 1      # reality reset happened before the abort


def test_transient_divergence_recovers():
    """A ONE-window disturbance (lateral shove) triggers at most a reset and
    the run still reaches its goal — detection must not be a hair trigger."""
    terr = make_terrain(["plane", "plane"])
    r = RecedingHorizonRunner(terr, goal_xy=(1.6, 0.0), cfg=_cfg(max_windows=10))
    done = {"v": False}

    def shove_once(s1, m):
        if done["v"]:
            return s1, m
        done["v"] = True
        return s1.replace(pos=s1.pos.at[1].add(0.08)), m

    _inject(r, mutate_after=1, mutate=shove_once)
    rep = r.run(verbose=False)
    assert rep.reached_goal
    assert not rep.aborted


def test_long_run_compacts_buffer():
    """With a buffer far smaller than the run, compaction must keep absolute
    indices in range and the stitched report table must still cover every
    executed tick."""
    terr = make_terrain(["plane"] * 4)
    cfg = _cfg(max_windows=24, buffer_rows=12000)
    r = RecedingHorizonRunner(terr, goal_xy=(4.5, 0.0), cfg=cfg)
    rep = r.run(verbose=False)
    assert rep.reached_goal
    assert len(r._archive) >= 1       # compaction actually fired
    assert rep.ref_table.shape[0] == rep.sim_ticks
    # path times in the report table are monotone across compaction seams
    t = rep.ref_table[:, 0]
    assert float(np.diff(t).min()) >= 0.0
