import jax.numpy as jnp
import numpy as np

from qtos_tpu.control import ControlParams, stance_warmup
from qtos_tpu.control.loop import playback_recorded, record_csv, state_from_row
from qtos_tpu.solver import SolverConfig, default_spec, sample_trajectory, solve
from qtos_tpu.terrain import make_terrain
from qtos_tpu.utils import Logger, cmd_pose_from_row, row_from_cmd_pose
from qtos_tpu.utils.tracking import Tracking

TERR = make_terrain(["plane"])


def test_cmd_pose_codec_roundtrip():
    row = np.arange(37.0, dtype=np.float32)
    cmd = cmd_pose_from_row(row)
    np.testing.assert_allclose(cmd["COM"], row[1:7])
    np.testing.assert_allclose(cmd["FL_FOOT"]["P"], row[7:10])
    np.testing.assert_allclose(cmd["HR_FOOT_FORCE"], row[34:37])
    back = row_from_cmd_pose(row[0], cmd)
    np.testing.assert_allclose(back, row)


def test_logger_writes(tmp_path):
    lg = Logger(str(tmp_path), "test")
    lg.write("hello")
    lg.close()
    text = open(lg.path).read()
    assert "hello" in text


def test_recorded_playback_and_csv(tmp_path):
    spec = default_spec(TERR, goal_xy=(0.25, 0.0), K=17, duration=1.5)
    res = solve(spec, TERR, SolverConfig(max_iters=25))
    table, _ = sample_trajectory(res.x, spec)
    params = ControlParams()
    s0 = stance_warmup(state_from_row(table[0], TERR, params), TERR, params, 200)
    final, m, traces = playback_recorded(table, s0, TERR, params)
    T = table.shape[0]
    assert traces["q"].shape == (T, 12)
    assert traces["tau"].shape == (T, 12)
    # torques respect the motor clip
    assert float(jnp.abs(traces["tau"]).max()) <= 8.0 + 1e-5
    p = str(tmp_path / "rec.csv")
    record_csv(traces, p, copy_trajectory_pts=4)
    data = np.loadtxt(p, delimiter=",")
    assert data.shape == (4 * T, 36)  # reference 36-col hardware CSV x4 rows
    np.testing.assert_allclose(data[0], data[3])  # duplicated rows


def test_tracking_summary_and_plots(tmp_path):
    tr = Tracking(str(tmp_path))
    table = np.zeros((100, 37), np.float32)
    table[:, 0] = np.arange(100) / 1000.0
    table[:, 1] = np.linspace(0, 0.1, 100)
    sim = table[:, 1:4] + np.array([0.01, 0.0, 0.0], np.float32)
    tr.extend(table, sim)
    s = tr.summary()
    assert abs(s["mean_com_err"] - 0.01) < 1e-6
    assert abs(s["avg_com_err_per_s"] - 10.0) < 1e-3
    tr.plot()
    import os

    for f in ["CoM_track.png", "ref_sim_com.png", "tracking_error.png"]:
        assert os.path.getsize(os.path.join(str(tmp_path), f)) > 500
    tr.write_log(str(tmp_path / "experiment_data.out"))
    assert "avg_com_err_per_s" in open(tmp_path / "experiment_data.out").read()
