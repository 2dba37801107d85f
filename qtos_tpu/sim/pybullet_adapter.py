"""Optional PyBullet cross-verifier (gated import).

The reference's whole sim layer is PyBullet (QTOS/simulation.py); this
framework's primary physics is the JAX engine in qtos_tpu.sim.engine.  When a
pybullet wheel is present (it is NOT in the TPU image), this adapter loads the
same SOLO12 URDF + heightfield and replays a 37-col trajectory table through
Bullet for cross-engine validation of tracking metrics.
"""

from __future__ import annotations

import numpy as np


def pybullet_available() -> bool:
    try:
        import pybullet  # noqa: F401

        return True
    except ImportError:
        return False


class BulletVerifier:
    """Replays a trajectory table in PyBullet (requires `pip install pybullet`
    and a SOLO12 URDF; both absent in the TPU image — gate with
    `pybullet_available()`)."""

    def __init__(self, terrain, urdf_path: str, gui: bool = False):
        if not pybullet_available():
            raise ImportError(
                "pybullet is not installed; use the JAX engine (qtos_tpu.sim) "
                "or install pybullet for cross-verification"
            )
        import pybullet as p
        import pybullet_data

        self.p = p
        self.client = p.connect(p.GUI if gui else p.DIRECT)
        p.setAdditionalSearchPath(pybullet_data.getDataPath())
        p.setGravity(0, 0, -9.81)
        p.setTimeStep(1.0 / 1000.0)
        hz = np.asarray(terrain.height)
        rows, cols = hz.shape
        shape = p.createCollisionShape(
            shapeType=p.GEOM_HEIGHTFIELD,
            meshScale=[terrain.resolution, terrain.resolution, 1.0],
            heightfieldData=hz.T.flatten(),
            numHeightfieldRows=cols,
            numHeightfieldColumns=rows,
        )
        self.ground = p.createMultiBody(0, shape)
        self.robot = p.loadURDF(urdf_path, [0, 0, 0.4])

    def replay(self, table, kp: float = 20.0, kd: float = 0.08):
        """Position-control replay of IK joint targets; returns CoM trace."""
        from qtos_tpu.control.loop import plan_joint_targets, ControlParams

        p = self.p
        joint_ids = [j for j in range(p.getNumJoints(self.robot))
                     if p.getJointInfo(self.robot, j)[2] == p.JOINT_REVOLUTE]
        com = []
        params = ControlParams()
        for row in np.asarray(table):
            q_des, _ = plan_joint_targets(row, params)
            p.setJointMotorControlArray(
                self.robot, joint_ids, p.POSITION_CONTROL,
                targetPositions=np.asarray(q_des), positionGains=[kp * 1e-3] * 12,
            )
            p.stepSimulation()
            com.append(p.getBasePositionAndOrientation(self.robot)[0])
        return np.asarray(com)
