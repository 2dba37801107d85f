"""Global planning: A* over traversability maps, spline paths, and the
solver-probed feasibility map (reference: QTOS/planner.py +
QTOS/generateHeightField.py PATH_MAP)."""

from qtos_tpu.planner.astar import astar  # noqa: F401
from qtos_tpu.planner.global_planner import GlobalPlanner  # noqa: F401
from qtos_tpu.planner.feasibility import feasibility_map  # noqa: F401
