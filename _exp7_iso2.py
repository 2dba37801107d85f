import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.terrain import make_terrain

terrain = make_terrain(["stair","bridge"], scale_factor=2)
for iters in (30, 100):
    for dur in (2.5, 4.0):
        spec = default_spec(terrain, start_xy=(1.5,0.4), goal_xy=(1.9,0.4), K=41, duration=dur)
        res = solve(spec, terrain, SolverConfig(max_iters=iters))
        v = {k: round(float(val),4) for k,val in res.viol.items()}
        top = sorted(v, key=v.get, reverse=True)[:3]
        print(f"iters={iters} dur={dur}: status={int(res.status)} mv={float(res.max_violation):.4f} top={ {k:v[k] for k in top} }")
