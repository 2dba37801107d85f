"""Batched phase-aware gait trajectory optimization (the TOWR/ifopt/IPOPT
replacement — reference: solver/ submodule + Dockerfile:42-52, logs/towr_log.out).

Design (TPU-first, not a port):
- Uniform-knot direct collocation over single-rigid-body dynamics instead of
  TOWR's phase-based Hermite node sets: every scenario has identical static
  shapes, and the *contact schedule is data* (a (K, 4) mask), so thousands of
  heterogeneous-gait scenarios batch in one `vmap`/`pjit` call — the
  reference needed 32 OS processes x Docker for that (SURVEY.md §3.4).
- Gauss-Newton/Levenberg on a weighted residual system; every coupling is
  between adjacent knots, so the normal equations are block-tridiagonal in
  time and solved by `qtos_tpu.ops.tridiag` (MUMPS' role, structure-aware).
- Inequalities (friction cone, kinematic range, clearance) enter as smooth
  hinge residuals, the batched analog of IPOPT's barrier.
"""

from qtos_tpu.solver.gait import GaitSchedule, trot_schedule, stand_schedule  # noqa: F401
from qtos_tpu.solver.spec import ProblemSpec, SolverConfig, RobotState, default_spec  # noqa: F401
from qtos_tpu.solver.solve import solve, solve_batch, SolveResult  # noqa: F401
from qtos_tpu.solver.sampler import sample_trajectory, TRAJ_COLS  # noqa: F401
