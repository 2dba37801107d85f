import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.terrain import make_terrain

terrain = make_terrain(["stair","bridge"], scale_factor=2)
cases = [
    ((1.5,0.4),(1.65,0.43),2.5),
    ((1.5,0.4),(1.7,0.44),2.5),
    ((1.5,0.42),(1.75,0.44),2.5),
    ((1.55,0.43),(1.8,0.45),2.5),
    ((1.6,0.44),(1.85,0.45),2.5),
    ((1.7,0.44),(1.95,0.46),2.5),
    ((1.8,0.44),(2.05,0.47),2.5),
]
for (s, g, dur) in cases:
    spec = default_spec(terrain, start_xy=s, goal_xy=g, K=41, duration=dur)
    res = solve(spec, terrain, SolverConfig())
    v = {k: round(float(val),4) for k,val in res.viol.items()}
    top = sorted(v, key=v.get, reverse=True)[:2]
    print(f"{s}->{g}: status={int(res.status)} mv={float(res.max_violation):.4f} top={ {k:v[k] for k in top} }")
