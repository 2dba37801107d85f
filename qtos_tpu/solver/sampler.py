"""Knot solution -> dense 1 kHz trajectory table, on device.

Produces the reference's 37-column trajectory schema (reference:
data/traj/towr.csv, decoded by QTOS/utils.py:107-148 ``vec_to_cmd_pose``):

    [t, CoM pos(3), CoM euler(3), FL/FR/HL/HR foot pos(12),
     CoM lin vel(3), CoM ang vel(3), FL/FR/HL/HR force(12)]

In the reference this table is a CSV written by the Docker solver and re-read
row by row by the sim loop (scripts/run.py:184-185); here it is a device array
fed directly to the jitted control loop, and stitching is a
``dynamic_update_slice`` instead of truncate-and-concat on files
(QTOS/combiner.py:125-135).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qtos_tpu.ops.rotations import omega_to_euler_rate
from qtos_tpu.ops.splines import hermite_eval
from qtos_tpu.solver.spec import ProblemSpec, unpack_state

TRAJ_COLS = 37


def _knot_foot_velocities(p, contact, dt):
    """(K, 4, 3) central-difference foot velocities, zero in stance."""
    v_mid = (p[2:] - p[:-2]) / (2 * dt)
    v0 = (p[1] - p[0]) / dt
    vK = (p[-1] - p[-2]) / dt
    v = jnp.concatenate([v0[None], v_mid, vK[None]], axis=0)
    return v * (1.0 - contact[..., None])


@functools.partial(jax.jit, static_argnames=("hz",))
def sample_trajectory(x: jax.Array, spec: ProblemSpec, hz: int = 1000, t0: float = 0.0):
    """Sample the solved knot trajectory to a dense table.

    Args:
      x: (K, NV) solver output.
      spec: problem spec (provides dt and the contact schedule).
      hz: output rate (reference runs 1 kHz — data/config/simulation.yml HZ).
      t0: time stamped into column 0 of the first row.

    Returns:
      (table, contact): (T, 37) float32 table and (T, 4) contact mask, where
      T = round(duration * hz) + 1.
    """
    s = unpack_state(x)
    K = x.shape[0]
    dt = spec.dt
    duration = dt * (K - 1)
    T = int(round(duration * hz)) + 1
    times = jnp.arange(T) / hz

    seg = jnp.clip(jnp.floor(times / dt).astype(jnp.int32), 0, K - 2)
    tau = times / dt - seg.astype(jnp.float32)

    def seg_interp(knot_x, knot_v):
        pos, vel, _ = hermite_eval(
            knot_x[seg], knot_x[seg + 1], knot_v[seg], knot_v[seg + 1], dt, tau
        )
        return pos, vel

    rate = omega_to_euler_rate(s["th"], s["w"])
    r, v = seg_interp(s["r"], s["v"])
    th, _ = seg_interp(s["th"], rate)
    _, w_s = None, None
    # angular velocity: interpolate omega linearly (consistent with trapezoidal defects)
    w = s["w"][seg] * (1 - tau)[:, None] + s["w"][seg + 1] * tau[:, None]

    pv = _knot_foot_velocities(s["p"], spec.schedule.contact, dt)
    p_flat = s["p"].reshape(K, 12)
    pv_flat = pv.reshape(K, 12)
    p, _ = seg_interp(p_flat, pv_flat)

    f_flat = s["f"].reshape(K, 12)
    f = f_flat[seg] * (1 - tau)[:, None] + f_flat[seg + 1] * tau[:, None]

    contact = spec.schedule.contact[seg] * spec.schedule.contact[seg + 1]

    table = jnp.concatenate(
        [(times + t0)[:, None], r, th, p, v, w, f], axis=-1
    ).astype(jnp.float32)
    return table, contact


def table_to_csv(path: str, table) -> None:
    """Write the reference CSV format (no header, reference data/traj/towr.csv)."""
    import numpy as np

    np.savetxt(path, np.asarray(table), delimiter=",", fmt="%.6g")


def csv_to_table(path: str):
    """Read a reference-format 37-col trajectory CSV (e.g. the checked-in
    golden fixtures test/data/traj/gait.csv) as a numpy array."""
    import numpy as np

    return np.loadtxt(path, delimiter=",", dtype=np.float32)
