"""Pallas TPU kernels for the hot solver ops."""

from qtos_tpu.ops.pallas.btd import btd_solve_pallas  # noqa: F401
