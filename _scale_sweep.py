import sys, numpy as np, jax
jax.config.update("jax_default_matmul_precision", "highest")
from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.terrain import make_terrain
import qtos_tpu.control.loop as cl

which = sys.argv[1]
if which == "exp4s5":
    terrain = make_terrain(["random_terrain_1"]*3, scale_factor=5)
    goal = (3.8, 0.0); kw = dict(avg_speed=0.22); fric = 2.0; prof = None
elif which == "exp4s5slow":
    terrain = make_terrain(["random_terrain_1"]*3, scale_factor=5)
    goal = (3.8, 0.0); kw = dict(avg_speed=0.15); fric = 2.0; prof = None
elif which == "exp7s10":
    terrain = make_terrain(["stair","bridge"], scale_factor=10)
    goal = (2.4, 0.0); kw = dict(avg_speed=0.15, rough_pace=12.0); fric = 0.9; prof = "stairs"
elif which == "exp7s5":
    terrain = make_terrain(["stair","bridge"], scale_factor=5)
    goal = (2.4, 0.0); kw = dict(avg_speed=0.15, rough_pace=12.0); fric = 0.9; prof = "stairs"

wins = 0
for jy in (0.0, 0.02, -0.02):
    cfg = RunnerConfig(gait="trot", **kw)
    base = cl.control_profile(prof) if prof else cl.gait_control_params("trot")
    cfg.control = base.replace(sim=base.sim.replace(friction=fric))
    r = RecedingHorizonRunner(terrain, goal, start_xy=(0.0, jy), cfg=cfg)
    rep = r.run(verbose=False)
    fp = rep.final_pos
    print(f"{which} jy={jy:+.2f}: reached={rep.reached_goal} aborted={rep.aborted} "
          f"final=({fp[0]:.2f},{fp[1]:.2f},{fp[2]:.2f}) win={rep.windows} err/s={rep.avg_com_err_per_s:.0f} holds={rep.stance_holds}", flush=True)
    wins += bool(rep.reached_goal)
print(f"== {which}: {wins}/3", flush=True)
