import sys, numpy as np, jax
jax.config.update("jax_default_matmul_precision", "highest")
from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.terrain import make_terrain
import qtos_tpu.control.loop as cl

terrain = make_terrain(["stair","bridge"], scale_factor=2)
cfg = RunnerConfig(avg_speed=0.15, gait="trot", rough_pace=12.0,
                   control=cl.control_profile("stairs"))
r = RecedingHorizonRunner(terrain, (2.4, 0.0), start_xy=(0.0, 0.02), cfg=cfg)
rep = r.run(verbose=True)
print("final:", np.round(rep.final_pos,2), "reached:", rep.reached_goal)
