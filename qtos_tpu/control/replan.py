"""Receding-horizon replanning — the flagship continuous-walking loop.

Reference architecture (scripts/main.py:26-62 + QTOS/combiner.py): a Python
thread re-invokes the Docker TOWR solver from a predicted future state found
by scanning the trajectory CSV for an all-feet-in-contact row ~3750 rows
ahead (``lookahead``), then truncate-and-concats CSVs while the sim consumes
rows in real time (forced-execution prefix ``f_steps`` = 2500).

Here the trajectory lives in a device ring buffer; stitching is a
``lax.dynamic_update_slice``; the stitch row search is an argmax over the
contact-mask buffer; planning is one jitted solve+sample call; execution is
the jitted scan control loop.  The host loop only sequences windows.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.control.loop import ControlParams, playback, decode_row, state_from_row, stance_warmup
from qtos_tpu.models.solo12 import Solo12
from qtos_tpu.planner.global_planner import GlobalPlanner
from qtos_tpu.solver.gait import trot_schedule
from qtos_tpu.solver.sampler import sample_trajectory
from qtos_tpu.solver.solve import solve
from qtos_tpu.solver.spec import ProblemSpec, RobotState, SolverConfig
from qtos_tpu.terrain.heightfield import Terrain, height_at


@dataclass
class RunnerConfig:
    lookahead: int = 3750        # rows (reference: scripts/main.py:177)
    f_steps: int = 2500          # forced-execution rows (main.py:176)
    window_duration: float = 2.5
    K: int = 41
    buffer_rows: int = 60000     # analog of TRAJ_SIZE (simulation.yml)
    goal_tol: float = 0.1        # reference: main.py:40 goal_diff < 0.1
    avg_speed: float = 0.22
    stance_warmup_steps: int = 500
    max_windows: int = 64
    # Warm-starting windows from the shifted previous solution is available
    # but off by default: the fresh schedule-aware guess aligns gait phases
    # with the new window's head stance, which empirically tracks better.
    warm_start: bool = False
    # Optional dynamic-terrain hook: (window_idx, terrain) -> terrain, applied
    # before each replan (reference: exp_8 dynamic terrain / simulation.update).
    terrain_update: object = None
    # Checkpoint/resume (SURVEY.md §5.4 — the reference's "checkpoint" is the
    # trajectory CSV itself plus the -s/-e1..e4 solver restart flags): write a
    # full resume snapshot every N windows (0 = off) to checkpoint_path.
    checkpoint_every: int = 0
    checkpoint_path: str = "./data/checkpoint.npz"
    solver: SolverConfig = field(
        default_factory=lambda: SolverConfig(max_iters=70, tol=3e-3)
    )
    control: ControlParams = field(default_factory=ControlParams)


@dataclass
class RunReport:
    reached_goal: bool
    windows: int
    sim_ticks: int
    final_pos: np.ndarray
    goal: np.ndarray
    mean_com_err: float
    max_com_err: float
    avg_com_err_per_s: float
    solve_wall_times: list
    statuses: list


def spec_from_row(row, goal_r, goal_yaw, terrain: Terrain, K: int, duration: float) -> ProblemSpec:
    """Build the next window's spec from a trajectory row — the analog of the
    reference solver restart ABI (-s/-s_ang/-s_vel/-e1..e4 flags, combiner.py:
    170-191)."""
    cmd = decode_row(row)
    start = RobotState(r=cmd["r"], eul=cmd["eul"], v=cmd["v"], omega=cmd["w"], feet=cmd["feet"])
    dt = duration / (K - 1)
    return ProblemSpec(
        start=start,
        goal_r=goal_r,
        goal_yaw=goal_yaw,
        duration=jnp.asarray(duration),
        schedule=trot_schedule(K, dt),
        dt=dt,
    )


def plan_windows_batch(rows, goals_r, goals_yaw, terrain: Terrain, cfg: RunnerConfig):
    """Speculatively solve k future windows in ONE batched call (the
    multi-segment lookahead of SURVEY.md §5.7(c); the reference can only run
    one Docker solve at a time).

    Args:
      rows: (k, 37) candidate start rows.
      goals_r: (k, 3); goals_yaw: (k,).
    Returns a batched SolveResult plus stacked (k, T, 37) tables/(k, T, 4) contacts.
    """
    import jax

    from qtos_tpu.solver.solve import solve_batch

    specs = jax.vmap(
        lambda row, g, y: spec_from_row(row, g, y, terrain, cfg.K, cfg.window_duration)
    )(rows, goals_r, goals_yaw)
    res = solve_batch(specs, terrain, cfg.solver)
    tables, contacts = jax.vmap(lambda x, s: sample_trajectory(x, s, hz=1000))(res.x, specs)
    return res, tables, contacts


class RecedingHorizonRunner:
    """Continuous long-distance locomotion via window stitching."""

    def __init__(
        self,
        terrain: Terrain,
        goal_xy,
        start_xy=(0.0, 0.0),
        cfg: RunnerConfig | None = None,
        blocked: np.ndarray | None = None,
    ):
        self.terrain = terrain
        self.cfg = cfg or RunnerConfig()
        self.goal_xy = np.asarray(goal_xy, np.float32)
        self.planner = GlobalPlanner(
            terrain, start_xy, goal_xy, avg_speed=self.cfg.avg_speed, blocked=blocked
        )
        c = self.cfg
        self.seg_rows = int(round(c.window_duration * 1000)) + 1
        self.buffer = jnp.zeros((c.buffer_rows, 37), jnp.float32)
        self.contact_buf = jnp.zeros((c.buffer_rows, 4), jnp.float32)
        self.buffer_end = 0
        self._st: dict | None = None  # live run state (see state_dict)

        self._exec_jit = jax.jit(
            lambda buf, start, s0, terr: playback(
                jax.lax.dynamic_slice(buf, (start, 0), (c.f_steps, 37)),
                s0,
                terr,
                c.control,
            )
        )

    # ------------------------------------------------------------------
    def _plan_window(self, row, goal_r, goal_yaw, t0, terrain, cfg: RunnerConfig, x_warm=None):
        """Solve one window from a trajectory row and sample it. Jitted parts
        inside (solve/sample are already jit-compiled).  ``x_warm`` warm-starts
        from the previous window's knots shifted toward the new start — the
        reference's solver restart warm-starts implicitly via its spline
        initialization from the CLI state."""
        spec = spec_from_row(row, goal_r, goal_yaw, terrain, cfg.K, cfg.window_duration)
        x0 = None
        if x_warm is not None:
            x0 = self._shift_warm_start(x_warm, spec)
        res = solve(spec, terrain, cfg.solver, x0=x0)
        table, contact = sample_trajectory(res.x, spec, hz=1000, t0=t0)
        return res, table, contact

    @staticmethod
    def _shift_warm_start(x_prev, spec):
        """Translate the previous solution so its start matches the new
        window's start state; blend toward the fresh initial guess for the
        tail the previous window didn't cover."""
        import jax.numpy as jnp

        from qtos_tpu.solver.spec import unpack_state, pack_state

        s = unpack_state(x_prev)
        d_r = spec.start.r - s["r"][0]
        r = s["r"] + d_r
        p = s["p"] + d_r[None, None, :]
        p = p.at[0].set(spec.start.feet)
        return pack_state(r, s["th"], s["v"], s["w"], p, s["f"])

    def _stitch(self, at: int, table, contact):
        self.buffer = jax.lax.dynamic_update_slice(self.buffer, table, (at, 0))
        self.contact_buf = jax.lax.dynamic_update_slice(self.contact_buf, contact, (at, 0))
        self.buffer_end = at + self.seg_rows

    def _find_stitch_row(self, target: int) -> int:
        """First all-feet-in-contact row at/after target (reference:
        combiner.py:245-296 scans the CSV for a four-contact row)."""
        hi = self.buffer_end
        target = min(target, hi - 1)
        window = np.asarray(self.contact_buf[target:hi].min(axis=1) > 0.5)
        idx = np.argmax(window)
        if not window.any():
            return hi - 1
        return target + int(idx)

    # -- checkpoint / resume -------------------------------------------
    # The resume unit is (trajectory buffer, contact buffer, sim state,
    # execution cursor, solver warm start) — the TPU-native analog of the
    # reference's CSV-as-checkpoint + solver restart ABI (combiner.py:
    # 125-135, 170-191; SURVEY.md §5.4).

    def _sim_template(self):
        return state_from_row(self.buffer[0], self.terrain, self.cfg.control)

    def state_dict(self) -> dict:
        """Full resume snapshot as host numpy arrays."""
        st = self._st
        sim_leaves, _ = jax.tree_util.tree_flatten(st["sim"])
        d = dict(
            buffer=np.asarray(self.buffer),
            contact_buf=np.asarray(self.contact_buf),
            buffer_end=self.buffer_end,
            exec_idx=st["exec_idx"],
            window=st["window"],
            planning_done=st["planning_done"],
            prev_x=np.asarray(st["prev_x"]),
            com_errs=np.concatenate(st["com_errs"]) if st["com_errs"] else np.zeros(0),
            solve_times=np.asarray(st["solve_times"]),
            statuses=np.asarray(st["statuses"]),
        )
        for i, leaf in enumerate(sim_leaves):
            d[f"sim_{i}"] = np.asarray(leaf)
        return d

    def load_state_dict(self, d: dict) -> None:
        self.buffer = jnp.asarray(d["buffer"])
        self.contact_buf = jnp.asarray(d["contact_buf"])
        self.buffer_end = int(d["buffer_end"])
        _, treedef = jax.tree_util.tree_flatten(self._sim_template())
        n_sim = treedef.num_leaves
        sim = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(d[f"sim_{i}"]) for i in range(n_sim)]
        )
        com = np.asarray(d["com_errs"])
        self._st = dict(
            sim=sim,
            exec_idx=int(d["exec_idx"]),
            window=int(d["window"]),
            planning_done=bool(d["planning_done"]),
            prev_x=jnp.asarray(d["prev_x"]),
            com_errs=[com] if com.size else [],
            solve_times=list(np.asarray(d["solve_times"]).tolist()),
            statuses=[int(s) for s in np.asarray(d["statuses"])],
        )

    def save_checkpoint(self, path: str | None = None) -> str:
        import os

        path = path or self.cfg.checkpoint_path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(path, **self.state_dict())
        return path

    def restore(self, path: str) -> None:
        """Load a checkpoint written by `save_checkpoint` into this runner
        (must be constructed with the same terrain/goal/config)."""
        with np.load(path, allow_pickle=False) as z:
            self.load_state_dict(dict(z))

    # ------------------------------------------------------------------
    def run(self, verbose: bool = True, resume_from: str | None = None) -> RunReport:
        c = self.cfg
        goal_r_final = np.array(
            [
                self.goal_xy[0],
                self.goal_xy[1],
                float(height_at(self.terrain, *map(float, self.goal_xy)))
                + Solo12.stand_height,
            ],
            np.float32,
        )

        if resume_from is not None:
            self.restore(resume_from)
        else:
            # Initial solve from the canonical standing start (reference:
            # main.py default start_config + combiner.plan_init).
            x0, y0, yaw0 = float(self.planner._xk[0]), float(self.planner._yk[0]), 0.0
            start_state = RobotState.standing((x0, y0), yaw=yaw0, terrain=self.terrain)
            goal0, gyaw0 = self.planner.spine_step(0.0, c.window_duration)
            row0 = jnp.concatenate(
                [
                    jnp.zeros(1),
                    start_state.r,
                    start_state.eul,
                    start_state.feet.reshape(12),
                    start_state.v,
                    start_state.omega,
                    jnp.zeros(12),
                ]
            )
            t_w = time.time()
            res, table, contact = self._plan_window(
                row0, jnp.asarray(goal0), jnp.asarray(gyaw0), 0.0, self.terrain, c
            )
            jax.block_until_ready(table)
            self._stitch(0, table, contact)

            sim = state_from_row(self.buffer[0], self.terrain, c.control)
            sim = stance_warmup(sim, self.terrain, c.control, c.stance_warmup_steps)
            self._st = dict(
                sim=sim,
                exec_idx=0,
                window=0,
                planning_done=False,
                prev_x=res.x,
                com_errs=[],
                solve_times=[time.time() - t_w],
                statuses=[int(res.status)],
            )

        st = self._st
        reached = False
        while st["window"] < c.max_windows:
            window = st["window"]
            sim = st["sim"]
            exec_idx = st["exec_idx"]
            planning_done = st["planning_done"]
            solve_times = st["solve_times"]
            statuses = st["statuses"]
            com_errs = st["com_errs"]
            # dynamic terrain (exp_8): mutate the world between windows; the
            # jitted solver/sim take terrain as data, so no recompilation
            if c.terrain_update is not None:
                self.terrain = c.terrain_update(window, self.terrain)

            # plan the next segment from the lookahead stitch row (overlaps
            # execution in the reference via a thread; sequenced here — the
            # TPU solve is far faster than the 2.5 s real-time budget)
            if not planning_done:
                target = exec_idx + c.lookahead
                if target >= self.buffer_end - 10:
                    target = self.buffer_end - 10
                at = self._find_stitch_row(target)
                row = self.buffer[at]
                t_path = float(row[0])
                goal_vec, gyaw = self.planner.spine_step(t_path, c.window_duration)
                goal_dist = np.linalg.norm(goal_vec[:2] - goal_r_final[:2])
                if goal_dist < c.goal_tol:
                    goal_vec = goal_r_final
                    planning_done = True
                    st["planning_done"] = True
                t_w = time.time()
                res, table, contact = self._plan_window(
                    row, jnp.asarray(goal_vec), jnp.asarray(gyaw), t_path, self.terrain, c,
                    x_warm=st["prev_x"] if c.warm_start else None,
                )
                jax.block_until_ready(table)
                solve_times.append(time.time() - t_w)
                statuses.append(int(res.status))
                self._stitch(at, table, contact)
                st["prev_x"] = res.x

            # execute a forced chunk
            n_exec = min(c.f_steps, self.buffer_end - exec_idx)
            if n_exec <= 0:
                break
            sim, metrics = self._exec_jit(self.buffer, exec_idx, sim, self.terrain)
            com_errs.append(np.asarray(metrics.com_err[:n_exec]))
            exec_idx += n_exec
            st["sim"] = sim
            st["exec_idx"] = exec_idx
            st["window"] = window + 1
            if c.checkpoint_every and (window + 1) % c.checkpoint_every == 0:
                self.save_checkpoint()

            pos = np.asarray(sim.pos)
            if verbose:
                print(
                    f"[window {window}] exec->{exec_idx} pos=({pos[0]:.2f},{pos[1]:.2f},{pos[2]:.2f}) "
                    f"solve={solve_times[-1]*1e3:.0f}ms status={statuses[-1]}"
                )
            if np.linalg.norm(pos[:2] - goal_r_final[:2]) < 1.5 * c.goal_tol:
                reached = True
                break
            if planning_done and exec_idx >= self.buffer_end - 1:
                break

        sim = st["sim"]
        exec_idx = st["exec_idx"]
        solve_times = st["solve_times"]
        statuses = st["statuses"]
        com_errs = st["com_errs"]
        com = np.concatenate(com_errs) if com_errs else np.zeros(1)
        return RunReport(
            reached_goal=bool(
                reached or np.linalg.norm(np.asarray(sim.pos)[:2] - goal_r_final[:2]) < 2 * c.goal_tol
            ),
            windows=len(statuses),
            sim_ticks=exec_idx,
            final_pos=np.asarray(sim.pos),
            goal=goal_r_final,
            mean_com_err=float(com.mean()),
            max_com_err=float(com.max()),
            avg_com_err_per_s=float(com.sum() / max(len(com), 1) * 1000.0),
            solve_wall_times=solve_times,
            statuses=statuses,
        )
