import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.solver.sampler import sample_trajectory
from qtos_tpu.control.loop import ControlParams, playback, state_from_row, stance_warmup
from qtos_tpu.terrain import make_terrain

terrain = make_terrain(["stair","stair_1","stair_1","plane"], scale_factor=2)
for (sx, gx, dur) in [(4.8, 5.2, 4.0), (4.9, 5.3, 4.0), (4.8, 5.2, 2.7)]:
    spec = default_spec(terrain, start_xy=(sx,0.0), goal_xy=(gx,0.0), K=41, duration=dur)
    res = solve(spec, terrain, SolverConfig())
    tab = sample_trajectory(res.x, spec, hz=1000)
    tab = tab[0] if isinstance(tab, tuple) else tab
    params = ControlParams()
    s0 = state_from_row(tab[0], terrain, params)
    s0 = stance_warmup(s0, terrain, params, 500)
    final, m = playback(tab, s0, terrain, params)
    fp = np.asarray(final.pos)
    print(f"desc {sx}->{gx} dur={dur}: status={int(res.status)} viol={float(res.max_violation):.4f} "
          f"err/s={float(m.avg_com_err_per_s):.1f} final=({fp[0]:.2f},{fp[1]:.2f},{fp[2]:.2f}) plan_end_x={float(tab[-1,1]):.2f}")
