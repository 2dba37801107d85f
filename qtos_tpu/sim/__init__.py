"""JAX-native rigid-body simulator + motor model.

Replaces the reference's PyBullet simulation layer (QTOS/simulation.py,
QTOS/robot/robot.py, QTOS/robot/robot_motor.py).  The whole 1 kHz loop —
IK, PD motor, soft-contact dynamics, integration — is a `lax.scan` so an
entire episode is one XLA computation instead of a Python-per-tick loop
against a C engine.
"""

from qtos_tpu.sim.engine import SimParams, SimState, init_state, sim_step, rollout  # noqa: F401
from qtos_tpu.sim.motor import MotorParams, pd_torque  # noqa: F401
