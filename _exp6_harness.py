import sys, numpy as np, jax
jax.config.update("jax_default_matmul_precision", "highest")
from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.terrain import make_terrain
from qtos_tpu.terrain.heightfield import height_at
import jax.numpy as jnp

terrain = make_terrain(["stair","stair_1","stair_1","plane"], scale_factor=2)
cfg = RunnerConfig(avg_speed=0.15, gait="trot", rough_clearance=0.14)
import qtos_tpu.control.loop as cl
for kv in sys.argv[1:]:
    k, v = kv.split('=')
    if k == "control":
        cfg.control = cl.gait_control_params(v)
    elif k == "damp":
        cfg.control = cl.ControlParams(motor=cl.MotorParams(kd=2.0), sim=cl.SimParams(joint_damping=0.5), vel_corr=0.15, yaw_corr=0.3, yaw_tau=0.4)
    else:
        setattr(cfg, k, type(getattr(cfg, k))(v))
runner = RecedingHorizonRunner(terrain, (2.5, 0.0), cfg=cfg)
rep = runner.run()
pos = rep.sim_pos_series
print("reached:", rep.reached_goal, "aborted:", rep.aborted, "final:", np.round(rep.final_pos,2))
# analyze: print every 250 ticks around where z_rel drops
hs = np.asarray(height_at(terrain, jnp.asarray(pos[:,0]), jnp.asarray(pos[:,1])))
zrel = pos[:,2]-hs
bad = np.flatnonzero(zrel < 0.15)
t0 = bad[0] if len(bad) else len(pos)
print("first low-z tick:", t0, "of", len(pos))
for t in range(max(0,t0-2000), min(len(pos), t0+500), 250):
    print(f"t={t} pos=({pos[t,0]:.2f},{pos[t,1]:.2f},{pos[t,2]:.2f}) zrel={zrel[t]:.3f}")
err = rep.com_err_series
print("err by 2500-chunk:", [float(np.mean(err[i:i+2500])) for i in range(0, len(err), 2500)])
