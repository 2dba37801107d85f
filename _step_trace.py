import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.solver.sampler import sample_trajectory
from qtos_tpu.control.loop import ControlParams, state_from_row, stance_warmup, _scan_ticks
from qtos_tpu.terrain import make_terrain
from qtos_tpu.terrain.heightfield import height_at

terrain = make_terrain(["stair","stair_1","stair_1","plane"], scale_factor=2)
spec = default_spec(terrain, start_xy=(0.6,0.0), goal_xy=(0.975,0.0), K=41)
res = solve(spec, terrain, SolverConfig())
tab = sample_trajectory(res.x, spec, hz=1000)
tab = tab[0] if isinstance(tab, tuple) else tab
params = ControlParams()
s0 = state_from_row(tab[0], terrain, params)
s0 = stance_warmup(s0, terrain, params, 500)
final, tr = _scan_ticks(tab, s0, terrain, params)
pos = np.asarray(tr["pos"] if isinstance(tr, dict) else tr.pos)
feet = np.asarray(tr["feet"] if isinstance(tr, dict) else tr.feet)  # (T,4,3)
T = pos.shape[0]
plan_com = np.asarray(tab[:,1:4]); plan_feet = np.asarray(tab[:,7:19]).reshape(T,4,3)
for t in range(0, T, 250):
    dx = pos[t,0]-plan_com[t,0]
    print(f"t={t} plan_x={plan_com[t,0]:.3f} sim_x={pos[t,0]:.3f} dx={dx:+.3f} sim_z={pos[t,2]:.3f} "
          + " ".join(f"f{i}:({feet[t,i,0]:.2f},{feet[t,i,2]:.2f}|p{plan_feet[t,i,0]:.2f},{plan_feet[t,i,2]:.2f})" for i in range(4)))
