import sys, numpy as np, jax
jax.config.update("jax_default_matmul_precision", "highest")
from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.terrain import make_terrain
import qtos_tpu.control.loop as cl

terrain = make_terrain(["stair","stair_1","stair_1","plane"], scale_factor=2)

def run_one(tag, jit_y, **kw):
    cfg = RunnerConfig(avg_speed=0.15, gait="trot", rough_pace=8.0)
    ctl = kw.pop("control", None)
    for k, v in kw.items():
        setattr(cfg, k, v)
    if ctl is not None:
        cfg.control = ctl
    r = RecedingHorizonRunner(terrain, (2.0, 0.0), start_xy=(0.0, jit_y), cfg=cfg)
    rep = r.run(verbose=False)
    fp = rep.final_pos
    print(f"{tag} jy={jit_y:+.2f}: reached={rep.reached_goal} aborted={rep.aborted} "
          f"final=({fp[0]:.2f},{fp[1]:.2f},{fp[2]:.2f}) win={rep.windows} err/s={rep.avg_com_err_per_s:.0f} holds={rep.stance_holds}", flush=True)
    return rep.reached_goal

variants = {
    "base(p8)": {},
    "p12": dict(rough_pace=12.0),
    "p8+div.2": dict(divergence_err=0.2),
    "p8+ctl": dict(control=cl.ControlParams(vel_corr=0.15, yaw_corr=0.3, yaw_tau=0.4)),
}
name = sys.argv[1] if len(sys.argv) > 1 else None
for tag, kw in variants.items():
    if name and tag != name:
        continue
    wins = 0
    for jy in (0.0, 0.02, -0.02):
        wins += bool(run_one(tag, jy, **dict(kw)))
    print(f"== {tag}: {wins}/3", flush=True)

# extra variants appended: run via argv name
extra = {
    "p12+ctl": dict(rough_pace=12.0, control=cl.ControlParams(vel_corr=0.15, yaw_corr=0.3, yaw_tau=0.4)),
    "p12+div.2": dict(rough_pace=12.0, divergence_err=0.2),
    "walk": dict(gait="walk", rough_pace=8.0),
    "p12+kd": dict(rough_pace=12.0, control=cl.ControlParams(motor=cl.MotorParams(kd=2.0), sim=cl.SimParams(joint_damping=0.5), yaw_corr=0.3, yaw_tau=0.4)),
}
for tag, kw in extra.items():
    if name and tag != name:
        continue
    wins = 0
    for jy in (0.0, 0.02, -0.02):
        wins += bool(run_one(tag, jy, **dict(kw)))
    print(f"== {tag}: {wins}/3", flush=True)
