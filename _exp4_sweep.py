import sys, numpy as np, jax
jax.config.update("jax_default_matmul_precision", "highest")
from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.terrain import make_terrain
import qtos_tpu.control.loop as cl

terrain = make_terrain(["random_terrain_1"]*3, scale_factor=2)

def run_one(tag, jy, **kw):
    prof = kw.pop("profile", None)
    fric = kw.pop("friction", 2.0)
    cfg = RunnerConfig(avg_speed=kw.pop("avg_speed", 0.22), gait="trot")
    base = cl.control_profile(prof) if prof else cl.gait_control_params("trot")
    cfg.control = base.replace(sim=base.sim.replace(friction=fric))
    for k, v in kw.items():
        setattr(cfg, k, v)
    r = RecedingHorizonRunner(terrain, (3.8, 0.0), start_xy=(0.0, jy), cfg=cfg)
    rep = r.run(verbose=False)
    fp = rep.final_pos
    print(f"{tag} jy={jy:+.2f}: reached={rep.reached_goal} aborted={rep.aborted} "
          f"final=({fp[0]:.2f},{fp[1]:.2f},{fp[2]:.2f}) win={rep.windows} err/s={rep.avg_com_err_per_s:.0f} holds={rep.stance_holds}", flush=True)
    return rep.reached_goal

variants = {
    "base": {},
    "slow": dict(avg_speed=0.15),
    "slow+st": dict(avg_speed=0.15, profile="stairs"),
    "st": dict(profile="stairs"),
    "fric1": dict(friction=1.0),
}
name = sys.argv[1]
wins = 0
for jy in (0.0, 0.02, -0.02):
    wins += bool(run_one(name, jy, **dict(variants[name])))
print(f"== {name}: {wins}/3", flush=True)
