#!/usr/bin/env python3
"""Record a realized joint trajectory for hardware (SOLO12 SDK) replay.

Reference: scripts/trajectory_record.py — runs the sim loop while appending
[12 joint angles, 12 velocities, 12 torques] per tick, duplicated
``copy_trajectory_pts`` times, into towr_traj_cmode_<mode>.csv.

    python scripts/record.py --exp exp_1 --cpu -g 1.0 0
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp", default="exp_1")
    p.add_argument("-g", "--goal", nargs="+", type=float, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--copy-pts", type=int, default=1,
                   help="row duplication factor (reference copy_trajectory_pts)")
    p.add_argument("--out", default="data/traj")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from qtos_tpu.config import get_experiment
    from qtos_tpu.control import ControlParams, stance_warmup
    from qtos_tpu.control.loop import playback_recorded, record_csv, state_from_row
    from qtos_tpu.solver import SolverConfig, default_spec, sample_trajectory, solve
    from qtos_tpu.terrain import make_terrain
    from qtos_tpu.utils.tracking import Tracking

    exp = get_experiment(args.exp)
    goal = tuple(args.goal[:2]) if args.goal else exp.goal_xy
    terrain = make_terrain(list(exp.maps), scale_factor=exp.mesh_scale)

    import numpy as np

    dist = float(np.hypot(goal[0], goal[1]))
    duration = max(2.5, dist / exp.avg_speed)
    K = int(round(duration / 0.0625)) + 1
    spec = default_spec(terrain, goal_xy=goal, duration=duration, K=K)
    res = solve(spec, terrain, SolverConfig(max_iters=60, tol=5e-3))
    print(f"solve status={int(res.status)} viol={float(res.max_violation):.2e}")
    table, _ = sample_trajectory(res.x, spec)

    params = ControlParams()
    s0 = stance_warmup(state_from_row(table[0], terrain, params), terrain, params, 500)
    final, metrics, traces = playback_recorded(table, s0, terrain, params)

    os.makedirs(args.out, exist_ok=True)
    mode = params.motor.__class__.__name__.lower()
    out_csv = os.path.join(args.out, "towr_traj_cmode_torque.csv")
    record_csv(traces, out_csv, args.copy_pts)
    print(f"wrote {out_csv} ({np.asarray(traces['q']).shape[0] * args.copy_pts} rows x 36 cols)")

    tr = Tracking()
    tr.extend(np.asarray(table), np.asarray(traces["pos"]))
    tr.plot()
    tr.write_log()
    print("tracking:", tr.summary())
    return 0 if int(res.status) == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
