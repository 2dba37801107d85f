"""Solver-probed feasibility map as ONE batched TPU solve.

The reference builds its collision-avoidance bool map by launching 32 OS
processes, each running `docker exec ./main` TOWR solves on (start, goal)
cell pairs near obstacles and merging results under a lock (reference:
QTOS/generateHeightField.py:172-404 PATH_MAP.probe_map/run/worker_f).  Here
the candidate pairs become a stacked ProblemSpec batch and a single
`solve_batch` call; per-scenario convergence statuses mark traversability.

Probe semantics mirror the reference:
  - candidate pairs are 2-cell hops along +x on every row, enqueued iff
    either endpoint has a height>0 cell in its 8-neighborhood
    (probe_map :303-342, neighbors_danger_test :280-300);
  - a failed solve stamps the FILLED CONVEX HULL of a radius-3 diamond
    around the start, mid, and goal cells as blocked (worker_f :393-404,
    find_convex_hull :227-266 — the hull of (±3,0),(0,±3) is the diamond
    |dr|+|dc| <= 3);
  - an all-flat map short-circuits to "everything traversable"
    (check_flat_ground :268-276).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from qtos_tpu.solver.solve import solve_batch
from qtos_tpu.solver.spec import SolverConfig, default_spec
from qtos_tpu.terrain.heightfield import Terrain, traversability_map


def _danger_mask(height: np.ndarray, thresh: float = 0.025) -> np.ndarray:
    """Cells with an obstacle-height cell in their 8-neighborhood (the
    reference's neighbors_danger_test, vectorized).

    ``thresh`` separates obstacles from surface texture: randomized
    environments (exp_8 `random_env`) carry 0-2 cm noise EVERYWHERE, and a
    height>0 test would enqueue a probe for every cell of the map — the
    reference's equivalent maps keep their noise in dedicated rough tiles,
    so its >0 test only fires near real structures."""
    obst = height > thresh
    H, W = obst.shape
    out = np.zeros_like(obst)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            src = obst[
                max(0, -dr) : H - max(0, dr), max(0, -dc) : W - max(0, dc)
            ]
            out[max(0, dr) : H - max(0, -dr), max(0, dc) : W - max(0, -dc)] |= src
    return out


def _candidate_pairs(height: np.ndarray, col_step: int = 2):
    """(start, goal) cell pairs: 2-cell +x hops on every row, near danger
    (reference probe_map enumeration)."""
    danger = _danger_mask(height)
    H, W = height.shape
    pairs = []
    for r in range(H):
        for c in range(0, W - col_step, col_step):
            if danger[r, c] or danger[r, c + col_step]:
                pairs.append(((r, c), (r, c + col_step)))
    return pairs


def _diamond_offsets(radius: int = 3) -> np.ndarray:
    """Filled |dr|+|dc| <= radius diamond — the convex hull of the reference's
    (±r, 0), (0, ±r) neighbor set (find_convex_hull)."""
    offs = [
        (dr, dc)
        for dr in range(-radius, radius + 1)
        for dc in range(-radius, radius + 1)
        if abs(dr) + abs(dc) <= radius
    ]
    return np.asarray(offs, np.int64)


def _stamp(blocked: np.ndarray, cell, offsets: np.ndarray) -> None:
    H, W = blocked.shape
    r = cell[0] + offsets[:, 0]
    c = cell[1] + offsets[:, 1]
    keep = (r >= 0) & (r < H) & (c >= 0) & (c < W)
    blocked[r[keep], c[keep]] = True


def feasibility_map(
    terrain: Terrain,
    cfg: SolverConfig | None = None,
    window_duration: float = 1.5,
    K: int = 25,
    max_batch: int = 8192,
    stamp_radius: int = 3,
    include_rough: bool = True,
) -> np.ndarray:
    """Probe the terrain with batched gait solves; return (H, W) blocked map.

    This replaces the reference's 32-process Docker sweep end to end: every
    candidate pair is one scenario lane of a single `solve_batch` call.

    ``include_rough`` additionally pre-blocks locally-rough cells (the
    height_bound=0.2 traversability the reference's A* applies separately —
    QTOS/planner.py:354-399), so the returned map is directly usable as the
    planner's obstacle grid.
    """
    cfg = cfg or SolverConfig(max_iters=30, tol=6e-3)
    height = np.asarray(terrain.height)
    blocked = np.zeros(height.shape, bool)
    if not (height > 0).any():
        # reference check_flat_ground: flat maps skip probing entirely
        return blocked.astype(np.float32)

    pairs = _candidate_pairs(height)
    pairs = pairs[:max_batch]
    offsets = _diamond_offsets(stamp_radius)

    if pairs:
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
        # Blocked = the hop is INFEASIBLE, not merely slow to converge: the
        # reference stamps on a nonzero TOWR returncode (a hard IPOPT
        # failure), while a status-only test here also stamps loosely-
        # converged solves on rough-but-walkable ground (observed: random
        # 2 cm noise walled off exp_8's goal).  Gate on the OBSTACLE-relevant
        # families only (feet off the surface, body through terrain, feet
        # outside the kinematic box): a true obstacle in the hop (e.g. the
        # 1 m pillars) leaves these orders of magnitude above threshold,
        # while slow dynamics/goal convergence on walkable ground does not
        # touch them.
        obst = np.maximum.reduce(
            [np.asarray(res_b.viol[k]) for k in ("terrain", "body")]
        )
        ok = obst < 3e-2

        for (st, gl), good in zip(pairs, ok):
            if not good:
                mid = (st[0], st[1] + 1)
                _stamp(blocked, st, offsets)
                _stamp(blocked, mid, offsets)
                _stamp(blocked, gl, offsets)

    if include_rough:
        blocked |= np.asarray(traversability_map(terrain)) > 0.5
    return blocked.astype(np.float32)
