import sys, numpy as np, jax
jax.config.update("jax_default_matmul_precision", "highest")
from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.terrain import make_terrain
import qtos_tpu.control.loop as cl

terrain = make_terrain(["stair","bridge"], scale_factor=2)

def run_one(tag, jy, **kw):
    cfg = RunnerConfig(avg_speed=0.15, gait="trot", rough_pace=12.0,
                       control=cl.control_profile("stairs"))
    for k, v in kw.items():
        setattr(cfg, k, v)
    r = RecedingHorizonRunner(terrain, (2.4, 0.0), start_xy=(0.0, jy), cfg=cfg)
    rep = r.run(verbose=False)
    fp = rep.final_pos
    st = rep.statuses
    print(f"{tag} jy={jy:+.2f}: reached={rep.reached_goal} aborted={rep.aborted} "
          f"final=({fp[0]:.2f},{fp[1]:.2f},{fp[2]:.2f}) win={rep.windows} err/s={rep.avg_com_err_per_s:.0f} "
          f"holds={rep.stance_holds} bad={sum(1 for s in st if s)}", flush=True)
    return rep.reached_goal

variants = {
    "base": {},
    "slow": dict(avg_speed=0.10),
    "pace20": dict(rough_pace=20.0),
    "slow+pace20": dict(avg_speed=0.10, rough_pace=20.0),
}
name = sys.argv[1] if len(sys.argv) > 1 else "base"
kw = variants[name]
wins = 0
for jy in (0.0, 0.02, -0.02):
    wins += bool(run_one(name, jy, **dict(kw)))
print(f"== {name}: {wins}/3", flush=True)
