import numpy as np
import pytest

from qtos_tpu.planner import GlobalPlanner, astar
from qtos_tpu.terrain import make_terrain


def test_astar_straight_line():
    blocked = np.zeros((10, 20), bool)
    path = astar(blocked, (5, 0), (5, 19))
    assert path is not None
    assert tuple(path[0]) == (5, 0)
    assert tuple(path[-1]) == (5, 19)
    assert len(path) == 20


def test_astar_routes_around_wall():
    blocked = np.zeros((10, 20), bool)
    blocked[:8, 10] = True  # wall with gap at rows 8-9
    path = astar(blocked, (2, 2), (2, 18))
    assert path is not None
    cols = path[:, 1]
    rows = path[:, 0]
    at_wall = rows[cols == 10]
    assert (at_wall >= 8).all()  # goes through the gap


def test_astar_unreachable_returns_none():
    blocked = np.zeros((5, 5), bool)
    blocked[:, 2] = True  # full wall
    assert astar(blocked, (2, 0), (2, 4)) is None


def test_astar_no_corner_cutting():
    blocked = np.zeros((3, 3), bool)
    blocked[0, 1] = True
    path = astar(blocked, (0, 0), (0, 2))
    assert path is not None
    # no diagonal step may cut past a blocked orthogonal neighbor
    for a, b in zip(path[:-1], path[1:]):
        if abs(a[0] - b[0]) == 1 and abs(a[1] - b[1]) == 1:
            assert not (blocked[a[0], b[1]] or blocked[b[0], a[1]])
    # fully sealed start -> unreachable
    sealed = np.zeros((3, 3), bool)
    sealed[0, 1] = sealed[1, 0] = True
    assert astar(sealed, (0, 0), (2, 2)) is None


def test_global_planner_flat():
    terr = make_terrain(["plane", "plane"])
    gp = GlobalPlanner(terr, (0.0, 0.0), (2.0, 0.0))
    assert gp.path_length == pytest.approx(2.0, abs=0.2)
    x, y, yaw = gp.point_at(0.0)
    assert float(x) == pytest.approx(0.0, abs=0.05)
    xe, ye, _ = gp.point_at(gp.total_time)
    assert float(xe) == pytest.approx(2.0, abs=0.05)
    assert float(ye) == pytest.approx(0.0, abs=0.05)


def test_global_planner_avoids_walls():
    terr = make_terrain(["plane", "wall_2", "plane"])
    gp = GlobalPlanner(terr, (0.0, 0.0), (3.5, 0.0))
    # wall_2 blocks x~[0.9, 1.1] except rows 7-13 (y in [-0.3, 0.3]);
    # with inflation the path must thread the gap
    ts = np.linspace(0, gp.total_time, 100)
    ys_at_wall = [
        float(gp.point_at(t)[1])
        for t in ts
        if 0.85 < float(gp.point_at(t)[0]) < 1.15
    ]
    assert ys_at_wall, "path never crosses the wall band"
    assert max(abs(y) for y in ys_at_wall) < 0.45


def test_global_planner_raises_when_blocked():
    terr = make_terrain(["plane", "wall", "plane"])  # full wall, no gap
    with pytest.raises(RuntimeError):
        GlobalPlanner(terr, (0.0, 0.0), (3.5, 0.0))


def test_spine_step_clamps_to_goal():
    terr = make_terrain(["plane"])
    gp = GlobalPlanner(terr, (0.0, 0.0), (0.8, 0.0))
    goal, yaw = gp.spine_step(gp.total_time + 10.0, 2.5)
    np.testing.assert_allclose(goal[:2], [0.8, 0.0], atol=0.05)


def test_save_plot(tmp_path):
    # 'stair' is the gentle reference staircase; 'stairs' is the 1 m tall
    # one (generateHeightField.py:515,523) which rightly blocks the planner
    terr = make_terrain(["plane", "stair"])
    gp = GlobalPlanner(terr, (0.0, 0.0), (2.5, 0.0))
    p = str(tmp_path / "global_plan.png")
    gp.save_plot(p)
    import os

    assert os.path.getsize(p) > 1000


def test_margin_tapers_at_endpoints_not_globally():
    """An endpoint close to geometry must not collapse the inflation margin
    everywhere (the round-4 exp_7/exp_8 failure mode): far from the
    endpoints the spine keeps the full safety margin, while the unavoidable
    final approach threads a tapered pocket."""
    from qtos_tpu.terrain.heightfield import add_box_obstacle

    terr = make_terrain(["plane", "plane"])
    terr = add_box_obstacle(terr, 1.0, 0.0, half=0.1, height=0.5)

    # endpoints right next to the box: a path must still exist (detour)
    gp = GlobalPlanner(terr, (0.65, 0.0), (1.35, 0.0))
    assert gp.path_length > 1.0  # went around, not through

    # distant transit: full margin held where no endpoint forces a taper
    gp2 = GlobalPlanner(terr, (-0.5, 0.0), (2.5, 0.0))
    ts = np.linspace(0.0, gp2.total_time, 300)
    near_box = [abs(gp2._point_np(t)[1]) for t in ts
                if 0.7 < gp2._point_np(t)[0] < 1.3]
    assert max(near_box) > 0.25, "margin collapsed to a wall-hugging spine"
