import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.solver.sampler import sample_trajectory
from qtos_tpu.control.loop import ControlParams, playback, state_from_row, stance_warmup
from qtos_tpu.terrain import make_terrain

terrain = make_terrain(["stair","stair_1","stair_1","plane"], scale_factor=2)
# window straddling the 0.11 m step at x=1.0, walking-trot at exp_6's pace
for (sx, gx) in [(0.6, 0.975), (0.975, 1.35), (0.7, 1.05)]:
    spec = default_spec(terrain, start_xy=(sx,0.0), goal_xy=(gx,0.0), K=41)
    res = solve(spec, terrain, SolverConfig())
    tab = sample_trajectory(res.x, spec, hz=1000)
    tab = tab[0] if isinstance(tab, tuple) else tab
    params = ControlParams()
    s0 = state_from_row(tab[0], terrain, params)
    s0 = stance_warmup(s0, terrain, params, 500)
    final, m = playback(tab, s0, terrain, params)
    fp = np.asarray(final.pos)
    print(f"window {sx}->{gx}: status={int(res.status)} viol={float(res.max_violation):.4f} "
          f"err/s={float(m.avg_com_err_per_s):.1f} final=({fp[0]:.2f},{fp[1]:.2f},{fp[2]:.2f}) "
          f"plan_end=({float(tab[-1,1]):.2f},{float(tab[-1,3]):.2f})")
