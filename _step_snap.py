import jax; jax.config.update("jax_platforms","cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.solver.sampler import sample_trajectory
from qtos_tpu.control.loop import ControlParams, playback, state_from_row, stance_warmup
from qtos_tpu.terrain import make_terrain
from qtos_tpu.terrain.heightfield import height_at

terrain = make_terrain(["stair","stair_1","stair_1","plane"], scale_factor=2)

def slope(x, y, d=0.05):
    hx1 = height_at(terrain, x+d, y); hx0 = height_at(terrain, x-d, y)
    hy1 = height_at(terrain, x, y+d); hy0 = height_at(terrain, x, y-d)
    return jnp.sqrt(((hx1-hx0)/(2*d))**2 + ((hy1-hy0)/(2*d))**2)

def snap_table(tab, contact):
    # for each stance segment of each foot, if foothold on steep slope, shift x
    tabn = np.asarray(tab).copy()
    feet = tabn[:, 7:19].reshape(-1, 4, 3)
    c = np.asarray(contact)
    for f in range(4):
        t = 0
        T = len(tabn)
        while t < T:
            if c[t, f] > 0.5:
                t2 = t
                while t2 < T and c[t2, f] > 0.5:
                    t2 += 1
                x0, y0 = feet[t, f, 0], feet[t, f, 1]
                s = float(slope(jnp.asarray(x0), jnp.asarray(y0)))
                if s > 0.5:
                    # try shifts along x
                    best = None
                    for dx in (-0.08, -0.05, 0.05, 0.08, -0.11, 0.11):
                        if float(slope(jnp.asarray(x0+dx), jnp.asarray(y0))) < 0.3:
                            best = dx if best is None or abs(dx) < abs(best) else best
                    if best is not None:
                        newz = float(height_at(terrain, jnp.asarray(x0+best), jnp.asarray(y0)))
                        feet[t:t2, f, 0] = x0 + best
                        feet[t:t2, f, 2] = newz
                t = t2
            else:
                t += 1
    tabn[:, 7:19] = feet.reshape(-1, 12)
    return jnp.asarray(tabn)

spec = default_spec(terrain, start_xy=(0.7,0.0), goal_xy=(1.3,0.0), K=41, duration=4.0)
cfg = SolverConfig(swing_clearance=0.14)
res = solve(spec, terrain, cfg)
out = sample_trajectory(res.x, spec, hz=1000)
tab, contact = out if isinstance(out, tuple) else (out, None)
print("have contact:", contact is not None)
params = ControlParams()
for name, t in (("raw", tab), ("snapped", snap_table(tab, contact) if contact is not None else tab)):
    s0 = state_from_row(t[0], terrain, params)
    s0 = stance_warmup(s0, terrain, params, 500)
    final, m = playback(t, s0, terrain, params)
    fp = np.asarray(final.pos)
    print(f"{name}: err/s={float(m.avg_com_err_per_s):.1f} dx_end={fp[0]-float(t[-1,1]):+.3f} z={fp[2]:.2f}")
