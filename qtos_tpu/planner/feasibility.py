"""Solver-probed feasibility map as ONE batched TPU solve.

The reference builds its collision-avoidance bool map by launching 32 OS
processes, each running `docker exec ./main` TOWR solves on (start, goal)
cell pairs near obstacles and merging results under a lock (reference:
QTOS/generateHeightField.py:172-404 PATH_MAP.probe_map/run/worker_f).  Here
the candidate pairs become a stacked ProblemSpec batch and a single
`solve_batch` call; per-scenario convergence statuses mark traversability.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from qtos_tpu.solver.gait import trot_schedule
from qtos_tpu.solver.solve import solve_batch
from qtos_tpu.solver.spec import ProblemSpec, RobotState, SolverConfig, default_spec
from qtos_tpu.terrain.heightfield import Terrain, height_at, traversability_map


def _candidate_pairs(rough: np.ndarray, stride: int):
    """(start, goal) cell pairs probing across locally-rough cells — the
    analog of probe_map's neighbors_danger_test enumeration
    (generateHeightField.py:303-342)."""
    H, W = rough.shape
    pairs = []
    for r in range(0, H, stride):
        for c in range(0, W - stride, stride):
            window = rough[max(r - 1, 0) : r + 2, c : c + stride + 1]
            if window.any():
                pairs.append(((r, c), (r, min(c + stride, W - 1))))
    return pairs


def feasibility_map(
    terrain: Terrain,
    cfg: SolverConfig | None = None,
    stride: int = 4,
    window_duration: float = 1.5,
    K: int = 25,
    max_batch: int = 4096,
) -> np.ndarray:
    """Probe the terrain with batched gait solves; return (H, W) blocked map.

    A cell pair whose gait NLP fails to converge stamps its neighborhood as
    untraversable (reference: worker_f marks the convex hull of failures —
    generateHeightField.py:393-404; we stamp the goal cell neighborhood).
    """
    cfg = cfg or SolverConfig(max_iters=30, tol=6e-3)
    rough = np.asarray(traversability_map(terrain)) > 0.5
    blocked = rough.copy()
    pairs = _candidate_pairs(rough, stride)
    if not pairs:
        return blocked.astype(np.float32)
    pairs = pairs[:max_batch]

    x0, y0 = terrain.origin
    res = terrain.resolution

    def cell_xy(cell):
        return (x0 + (cell[1] + 0.5) * res, y0 + (cell[0] + 0.5) * res)

    starts = np.array([cell_xy(p[0]) for p in pairs], np.float32)
    goals = np.array([cell_xy(p[1]) for p in pairs], np.float32)

    def mk(start_xy, goal_xy):
        return default_spec(
            terrain,
            start_xy=tuple(start_xy),
            goal_xy=tuple(goal_xy),
            duration=window_duration,
            K=K,
        )

    specs = jax.vmap(mk)(jnp.asarray(starts), jnp.asarray(goals))
    res_b = solve_batch(specs, terrain, cfg)
    ok = np.asarray(res_b.status) == 0

    H, W = blocked.shape
    for (st, gl), good in zip(pairs, ok):
        if not good:
            r, c = gl
            blocked[max(r - 1, 0) : r + 2, max(c - 1, 0) : c + 2] = True
    return blocked.astype(np.float32)
