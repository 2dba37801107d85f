"""Wall-clock-paced executor canary (reference scripts/run.py:166-169).

The reference gates every sim tick on wall clock to prove the 1 kHz
contract; here the batch runner normally executes faster than real time, so
`RunnerConfig.realtime` paces chunk release at 1 kHz while replans land
asynchronously.  With replan p50 far below the 2.5 s chunk budget the paced
consumer must never starve (zero underruns).
"""

import pytest

from qtos_tpu.control.replan import RecedingHorizonRunner, RunnerConfig
from qtos_tpu.terrain import make_terrain


@pytest.mark.slow
def test_realtime_pacing_no_underruns():
    terrain = make_terrain(["plane", "plane"])
    cfg = RunnerConfig(realtime=True, max_windows=6)
    runner = RecedingHorizonRunner(terrain, (0.8, 0.0), cfg=cfg)
    rep = runner.run(verbose=False)
    assert rep.underruns == 0
    # realtime_factor anchors at the run loop (after the initial solve +
    # compile warmup, like a robot warming up before walking): >= ~1.0 means
    # the consumer really paced at <= 1 kHz; near 1.0 (not ballooning) means
    # replanning kept up inside the pacing budget
    assert 0.99 <= rep.realtime_factor < 1.5, rep.realtime_factor
    assert rep.sim_ticks > 2000
