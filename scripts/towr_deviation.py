#!/usr/bin/env python3
"""Measure trajectory deviation vs TOWR's golden window (BASELINE.md gate).

Solves OUR collocation NLP from the exact start state, contact schedule, and
2.5 s goal of the reference's checked-in TOWR/IPOPT solution
(/root/reference/data/traj/towr.csv) and reports CoM / foot deviation.
Used by tests/test_towr_deviation.py; runnable standalone for diagnostics.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GOLDEN = "/root/reference/data/traj/towr.csv"


def towr_window(duration: float = 2.5, K: int = 41, row0: int = 0):
    """Extract (spec, golden_slice) for a `duration`-second window of the
    golden trajectory starting at row `row0`.

    The schedule is TOWR's own: contact masks sampled from the golden force
    profile (fz > 1 N) at the K knot times, with per-leg swing progress
    computed from the 1 kHz contact run-lengths.
    """
    import jax.numpy as jnp

    from qtos_tpu.solver.gait import GaitSchedule
    from qtos_tpu.solver.spec import ProblemSpec, RobotState

    tab = np.loadtxt(GOLDEN, delimiter=",")
    rows = int(round(duration * 1000))
    g = tab[row0 : row0 + rows + 1]
    assert len(g) == rows + 1, "golden window exceeds fixture length"

    t = g[:, 0] - g[0, 0]
    r = g[:, 1:4]
    eul = g[:, 4:7]
    feet = g[:, 7:19].reshape(-1, 4, 3)
    v = g[:, 19:22]
    w = g[:, 22:25]
    f = g[:, 25:37].reshape(-1, 4, 3)

    contact_1k = (f[..., 2] > 1.0).astype(np.float32)  # (T, 4)
    dt = duration / (K - 1)
    knot_rows = np.round(np.arange(K) * dt * 1000).astype(int)
    contact = contact_1k[knot_rows]

    # swing progress at each knot: fraction elapsed of the enclosing 1 kHz
    # swing interval (0 in stance)
    prog = np.zeros((K, 4), np.float32)
    for leg in range(4):
        c = contact_1k[:, leg]
        # segment boundaries
        change = np.flatnonzero(np.diff(c) != 0) + 1
        bounds = np.concatenate([[0], change, [len(c)]])
        for a, b in zip(bounds[:-1], bounds[1:]):
            if c[a] == 0:  # swing segment [a, b)
                for k, kr in enumerate(knot_rows):
                    if a <= kr < b:
                        prog[k, leg] = (kr - a) / max(b - a - 1, 1)

    sched = GaitSchedule(
        contact=jnp.asarray(contact), swing_progress=jnp.asarray(prog)
    )
    start = RobotState(
        r=jnp.asarray(r[0], jnp.float32),
        eul=jnp.asarray(eul[0], jnp.float32),
        v=jnp.asarray(v[0], jnp.float32),
        omega=jnp.asarray(w[0], jnp.float32),
        feet=jnp.asarray(feet[0], jnp.float32),
    )
    spec = ProblemSpec(
        start=start,
        goal_r=jnp.asarray(r[rows], jnp.float32),
        goal_yaw=jnp.asarray(eul[rows, 2], jnp.float32),
        duration=jnp.asarray(duration),
        schedule=sched,
        dt=dt,
    )
    return spec, g


def measure(duration: float = 2.5, K: int = 41, max_iters: int = 120, row0: int = 0):
    import jax
    import jax.numpy as jnp

    from qtos_tpu.solver.sampler import sample_trajectory
    from qtos_tpu.solver.solve import solve
    from qtos_tpu.solver.spec import SolverConfig
    from qtos_tpu.terrain import make_terrain

    terrain = make_terrain(["plane"] * 4)  # golden run is flat ground
    spec, g = towr_window(duration, K, row0)
    cfg = SolverConfig(max_iters=max_iters, tol=3e-3)
    res = solve(spec, terrain, cfg)
    table, _ = sample_trajectory(res.x, spec, hz=1000)
    ours = np.asarray(table)

    T = min(len(ours), len(g))
    com_dev = np.linalg.norm(ours[:T, 1:4] - g[:T, 1:4], axis=-1)
    feet_dev = np.linalg.norm(
        ours[:T, 7:19].reshape(-1, 4, 3) - g[:T, 7:19].reshape(-1, 4, 3), axis=-1
    )
    out = dict(
        status=int(res.status),
        max_violation=float(res.max_violation),
        com_rms=float(np.sqrt((com_dev**2).mean())),
        com_max=float(com_dev.max()),
        com_mean=float(com_dev.mean()),
        feet_rms=float(np.sqrt((feet_dev**2).mean())),
        feet_max=float(feet_dev.max()),
        end_dev=float(com_dev[-1]),
    )
    return out, res, spec


if __name__ == "__main__":
    out, res, spec = measure()
    for k, v in out.items():
        print(f"{k:14s} {v:.6g}")
