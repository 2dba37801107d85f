"""Solver-probed feasibility map fidelity (reference PATH_MAP semantics).

Reference: QTOS/generateHeightField.py:172-404 — probe (start,goal) 2-cell
x-hops near obstacles with real solves; failures stamp the filled convex
hull (radius-3 diamond) around start/mid/goal; flat maps short-circuit.
The produced map must block the pillars of the feasibility tile while
leaving the reference's known walking corridor open (exp_3 routes around
the pillars — its golden bool_map/global_plan artifacts).
"""

import numpy as np

from qtos_tpu.planner.astar import astar
from qtos_tpu.planner.feasibility import (
    _candidate_pairs,
    _danger_mask,
    _diamond_offsets,
    feasibility_map,
)
from qtos_tpu.solver import SolverConfig
from qtos_tpu.terrain import make_terrain, tile
import pytest


def test_flat_ground_short_circuits():
    terr = make_terrain(["plane", "plane"])
    m = feasibility_map(terr)
    assert m.sum() == 0                      # check_flat_ground analog


def test_probe_enumeration_matches_reference_shape():
    """Pairs are 2-cell +x hops on every row, only near height>0 cells."""
    t = tile("feasibility")                  # reference pillars tile
    pairs = _candidate_pairs(t)
    assert pairs                             # pillars produce candidates
    for (r0, c0), (r1, c1) in pairs:
        assert r0 == r1 and c1 - c0 == 2     # x-direction 2-cell hop
    danger = _danger_mask(t)
    for (r0, c0), (r1, c1) in pairs:
        assert danger[r0, c0] or danger[r1, c1]
    # rows far from any pillar are not probed
    probed_rows = {p[0][0] for p in pairs}
    pillar_rows = set(np.nonzero(t.max(axis=1) > 0)[0].tolist())
    near = set()
    for r in pillar_rows:
        near |= {r - 1, r, r + 1}
    assert probed_rows <= near


def test_diamond_stamp_is_convex_hull_of_axis_points():
    offs = _diamond_offsets(3)
    assert len(offs) == 25                   # |dr|+|dc| <= 3 filled diamond
    assert (np.abs(offs).sum(axis=1) <= 3).all()
    for p in [(3, 0), (-3, 0), (0, 3), (0, -3), (0, 0), (1, 2)]:
        assert any((offs == p).all(axis=1))


@pytest.mark.slow  # full exp_3 map probe; nightly
def test_exp3_map_blocks_pillars_and_keeps_corridor():
    terr = make_terrain(["feasibility", "plane"])
    m = feasibility_map(terr, cfg=SolverConfig(max_iters=25, tol=6e-3))
    grid = np.asarray(terr.height)
    blocked = m > 0.5

    # every pillar cell is blocked
    assert blocked[grid > 0.1].all()

    # and a corridor survives: A* still finds a route from the start to the
    # far side (exp_3's whole point is routing AROUND the pillars)
    H, W = blocked.shape
    start = (H // 2, 0)
    goal = (H // 2, W - 2)
    path = astar(blocked, start, goal)
    assert path is not None, "feasibility map sealed the corridor shut"
    assert not blocked.all(axis=0).any(), "some column fully blocked"
