import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.terrain import make_terrain

terrain = make_terrain(["stair","bridge"], scale_factor=2)
for (sx, sy, gx, gy) in [(1.5,0.4,1.9,0.4), (1.5,0.4,1.8,0.4), (1.6,0.45,2.0,0.45), (1.9,0.45,2.3,0.45), (1.5,0.0,1.9,0.0)]:
    spec = default_spec(terrain, start_xy=(sx,sy), goal_xy=(gx,gy), K=41, duration=2.5)
    res = solve(spec, terrain, SolverConfig())
    v = {k: round(float(val),4) for k,val in res.viol.items()}
    top = sorted(v, key=v.get, reverse=True)[:3]
    print(f"({sx},{sy})->({gx},{gy}): status={int(res.status)} mv={float(res.max_violation):.4f} top={ {k:v[k] for k in top} }")
