#!/usr/bin/env python3
"""QTOS-TPU experiment driver.

The reference CLI (`python3 scripts/main.py -exp exp_N [-g x y z] [-t] [-T]`,
reference scripts/main.py:166-191) launched a Docker TOWR container, a
replanning thread, and a PyBullet loop.  Here everything is in-process:

    python scripts/main.py --exp exp_1              # continuous replanning run
    python scripts/main.py --exp exp_1 --oneshot    # single whole-path solve (ref -t)
    python scripts/main.py --test                   # canned smoke replay (ref -T)
    python scripts/main.py --exp exp_1 -g 2.0 0.5   # override goal

Artifacts land in logs/ and data/ like the reference (global_plan.png,
trajectory CSV, tracking plots).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_parser():
    p = argparse.ArgumentParser(description="QTOS-TPU experiment driver")
    p.add_argument("--exp", "-exp", default="exp_1", help="experiment preset (exp_1..exp_10)")
    p.add_argument("-g", "--goal", nargs="+", type=float, default=None, help="goal x y [z]")
    p.add_argument("--oneshot", "-t", action="store_true", help="single whole-path solve, no replanning")
    p.add_argument("--test", "-T", action="store_true", help="headless smoke test on canned trajectory")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--record", "-r", action="store_true", help="record realized joint trajectory CSV for hardware replay")
    p.add_argument("--out", default="data", help="artifact output dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile", nargs="?", const="./logs/jax-trace", default=None,
                   metavar="DIR", help="capture a jax.profiler device trace of the run")
    p.add_argument("--visual", action="store_true",
                   help="render 3-D plan-preview artifacts (reference visual.py)")
    p.add_argument("--realtime", action="store_true",
                   help="pace execution at 1 kHz wall clock while replans land "
                        "asynchronously (reference scripts/run.py:166-169); the "
                        "summary then reports buffer underruns")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compile cache: repeat invocations skip the 30-60 s XLA
    # compilation of the solver/control programs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from qtos_tpu.config import get_experiment
    from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
    from qtos_tpu.terrain import make_terrain

    os.makedirs("logs", exist_ok=True)
    os.makedirs(os.path.join(args.out, "traj"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "tracking"), exist_ok=True)

    if args.test:
        return run_smoke_test()

    exp = get_experiment(args.exp)
    goal = tuple(args.goal[:2]) if args.goal else exp.goal_xy
    rng = np.random.default_rng(args.seed)
    terrain = make_terrain(
        list(exp.maps), scale_factor=exp.mesh_scale, randomize=exp.random_env, rng=rng
    )

    blocked = None
    if exp.bool_map_search:
        from qtos_tpu.planner.feasibility import feasibility_map

        print("probing feasibility map with batched solves...")
        t0 = time.time()
        blocked = feasibility_map(terrain)
        print(f"feasibility map done in {time.time()-t0:.1f}s "
              f"({int(blocked.sum())} blocked cells)")
        save_map_plot(blocked, os.path.join(args.out, "bool_map.png"))

    cfg = RunnerConfig(avg_speed=exp.avg_speed, gait=exp.gait)
    if exp.swing_clearance > cfg.solver.swing_clearance:
        # terrain-adaptive: only windows crossing a height discontinuity
        # solve with the raised apex (see RunnerConfig.rough_clearance)
        cfg.rough_clearance = exp.swing_clearance
    cfg.rough_pace = exp.rough_pace
    cfg.realtime = args.realtime
    if exp.control_profile:
        from qtos_tpu.control.loop import control_profile

        cfg.control = control_profile(exp.control_profile)
    if exp.friction != 1.0:
        from qtos_tpu.control.loop import ControlParams, gait_control_params

        base = cfg.control if cfg.control is not None else gait_control_params(exp.gait)
        cfg.control = base.replace(sim=base.sim.replace(friction=exp.friction))
    if exp.dynamic_terrain:
        # exp_8: spawn a box obstacle mid-run (reference QTOS/simulation.py:
        # 102-115 update -> GEOM_BOX at (1.0 + idx, 0, 0.24)); the solver and
        # sim take terrain as data, so the world changes without recompiling
        from qtos_tpu.terrain.heightfield import add_box_obstacle

        # Spawn cadence: ~1 m of reaction distance ahead of the robot, like
        # the reference's fixed (1.0 + idx, 0) spawn line (QTOS/simulation.py:
        # 102-115) — a box dropped nearly underfoot is a crash in any stack.
        def terrain_update(window, terr):
            if window in (2, 4):
                x = 2.0 + 1.0 * (window // 2 - 1)
                print(f"[dynamic terrain] spawning obstacle at x={x:.1f}")
                return add_box_obstacle(terr, x, 0.0)
            return terr

        cfg.terrain_update = terrain_update
    if args.oneshot:
        return run_oneshot(terrain, goal, cfg, args)

    runner = RecedingHorizonRunner(terrain, goal, cfg=cfg, blocked=blocked)
    runner.planner.save_plot(os.path.join(args.out, "global_plan.png"))
    t0 = time.time()
    if args.profile:
        from qtos_tpu.utils.profiling import trace

        with trace(args.profile):
            report = runner.run()
        print(f"device trace written to {args.profile} (view with tensorboard)")
    else:
        report = runner.run()
    wall = time.time() - t0

    save_tracking_artifacts(report, args.out)
    if args.visual and report.ref_table is not None and len(report.ref_table):
        # offline analog of the reference's live scrolled plan preview
        # (QTOS/visual.py Visual_Planner.step): snapshot the upcoming plan at
        # several points along the run
        from qtos_tpu.utils.visual import VisualPlanner

        vp = VisualPlanner(report.ref_table, out_dir=os.path.join(args.out, "visual"))
        T = len(report.ref_table)
        for frac in (0.0, 0.5, 0.9):
            vp.render(at_row=int(frac * (T - 1)), name=f"plan_{int(frac*100):02d}")
        print(f"plan-preview artifacts in {os.path.join(args.out, 'visual')}")
    if args.record:
        print("note: use scripts/record.py for the hardware-replay CSV")
    summary = dict(
        experiment=exp.name,
        reached_goal=report.reached_goal,
        windows=report.windows,
        sim_ticks=report.sim_ticks,
        final_pos=[float(v) for v in report.final_pos],
        goal=[float(v) for v in report.goal],
        avg_com_err_per_s=report.avg_com_err_per_s,
        solve_ms_p50=float(np.median(report.solve_wall_times[1:]) * 1000)
        if len(report.solve_wall_times) > 1
        else float(report.solve_wall_times[0] * 1000),
        stance_holds=report.stance_holds,
        aborted=report.aborted,
        statuses=report.statuses,
        wall_time_s=wall,
    )
    if args.realtime:
        summary["underruns"] = report.underruns
        summary["realtime_factor"] = round(report.realtime_factor, 3)
    # per-experiment evidence file (plus the legacy latest-run file): a new
    # run must never destroy the committed evidence for another experiment
    with open(f"logs/experiment_data_{exp.name}.out", "w") as f:
        json.dump(summary, f, indent=2)
    with open("logs/experiment_data.out", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return 0 if report.reached_goal else 1


def run_oneshot(terrain, goal, cfg, args):
    """Single solve of the whole path (reference `-t` run_default,
    main.py:105-137: -duration 4.0 x num_tiles)."""
    import numpy as np

    from qtos_tpu.control import ControlParams, playback, stance_warmup
    from qtos_tpu.control.loop import state_from_row
    from qtos_tpu.solver import SolverConfig, default_spec, sample_trajectory, solve
    from qtos_tpu.solver.sampler import table_to_csv

    dist = float(np.hypot(goal[0], goal[1]))
    duration = max(2.5, dist / cfg.avg_speed)
    K = int(round(duration / 0.0625)) + 1
    spec = default_spec(terrain, start_xy=(0.0, 0.0), goal_xy=goal, duration=duration, K=K)
    t0 = time.time()
    res = solve(spec, terrain, SolverConfig(max_iters=80, tol=5e-3))
    print(f"oneshot solve: status={int(res.status)} viol={float(res.max_violation):.2e} "
          f"({time.time()-t0:.1f}s, K={K})")
    table, _ = sample_trajectory(res.x, spec)
    table_to_csv(os.path.join(args.out, "traj", "towr.csv"), table)
    params = ControlParams()
    s0 = stance_warmup(state_from_row(table[0], terrain, params), terrain, params, 500)
    final, m = playback(table, s0, terrain, params)
    print(f"playback: final=({float(final.pos[0]):.2f},{float(final.pos[1]):.2f}) "
          f"metric={float(m.avg_com_err_per_s):.1f}")
    return 0 if int(res.status) == 0 else 1


def run_smoke_test():
    """Headless canned-trajectory replay (reference `-T`: replays
    test/data/traj/gait.csv through the full stack, main.py:181-199)."""
    import jax.numpy as jnp
    import numpy as np

    from qtos_tpu.control import ControlParams, playback, stance_warmup
    from qtos_tpu.control.loop import state_from_row
    from qtos_tpu.solver import SolverConfig, default_spec, sample_trajectory, solve
    from qtos_tpu.terrain import make_terrain

    terrain = make_terrain(["plane", "plane"])
    ref_fixture = "/root/reference/test/data/traj/gait.csv"
    if os.path.exists(ref_fixture):
        from qtos_tpu.solver.sampler import csv_to_table

        table = jnp.asarray(csv_to_table(ref_fixture)[:3000])
        print("replaying reference golden fixture gait.csv")
    else:
        spec = default_spec(terrain, goal_xy=(0.5, 0.0), K=33)
        res = solve(spec, terrain, SolverConfig(max_iters=30))
        table, _ = sample_trajectory(res.x, spec)
        print("replaying freshly solved canned trajectory")
    params = ControlParams()
    s0 = stance_warmup(state_from_row(table[0], terrain, params), terrain, params, 300)
    final, m = playback(table, s0, terrain, params)
    err = float(m.com_err.mean())
    print(f"smoke test: mean CoM err {err:.3f} m, final z {float(final.pos[2]):.3f}")
    ok = np.isfinite(err) and err < 0.15 and 0.1 < float(final.pos[2]) < 0.4
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def save_tracking_artifacts(report, out_dir):
    """Render the reference's four tracking plots with the run's real series
    (reference: QTOS/tracking.py:202-401 — CoM track, per-foot ref-vs-sim
    panels, error, error-vs-distance) into <out>/tracking/."""
    try:
        from qtos_tpu.utils.tracking import Tracking

        tr = Tracking(os.path.join(out_dir, "tracking"))
        T = len(report.sim_pos_series)
        tr.extend(report.ref_table[:T], report.sim_pos_series,
                  sim_feet=report.sim_feet_series)
        tr.plot()
        print(f"tracking artifacts in {tr.out_dir}: "
              f"{tr.summary()}")
    except Exception as e:  # matplotlib optional
        print("plot skipped:", e)


def save_map_plot(blocked, path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        fig, ax = plt.subplots()
        ax.imshow(np.asarray(blocked), origin="lower", cmap="gray_r")
        fig.savefig(path, dpi=100)
        plt.close(fig)
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    sys.exit(main())
