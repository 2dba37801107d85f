import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.gait import make_schedule
from qtos_tpu.solver.solve import solve
from qtos_tpu.solver.sampler import sample_trajectory
from qtos_tpu.control.loop import ControlParams, gait_control_params, playback, state_from_row, stance_warmup
from qtos_tpu.terrain import make_terrain

terrain = make_terrain(["stair","stair_1","stair_1","plane"], scale_factor=2)

def run(clearance, duration, gait):
    K = 41
    dt = duration / (K - 1)
    sched = make_schedule(gait, K, dt)
    spec = default_spec(terrain, start_xy=(0.7,0.0), goal_xy=(1.3,0.0), K=K, duration=duration, schedule=sched)
    cfg = SolverConfig(swing_clearance=clearance)
    res = solve(spec, terrain, cfg)
    tab = sample_trajectory(res.x, spec, hz=1000)
    tab = tab[0] if isinstance(tab, tuple) else tab
    params = gait_control_params(gait)
    s0 = state_from_row(tab[0], terrain, params)
    s0 = stance_warmup(s0, terrain, params, 500)
    final, m = playback(tab, s0, terrain, params)
    fp = np.asarray(final.pos)
    dx = fp[0] - float(tab[-1,1])
    print(f"gait={gait} clr={clearance} dur={duration}: status={int(res.status)} viol={float(res.max_violation):.4f} "
          f"err/s={float(m.avg_com_err_per_s):.1f} dx_end={dx:+.3f} z={fp[2]:.2f}")

for gait in ("trot", "walk"):
    for clearance in (0.14, 0.18):
        for duration in (4.0, 6.0):
            run(clearance, duration, gait)
