"""Robot models (JAX-native kinematics/dynamics)."""

from qtos_tpu.models.solo12 import Solo12  # noqa: F401
