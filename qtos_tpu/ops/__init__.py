"""Math kernels: rotations, splines, batched block-tridiagonal solves."""

from qtos_tpu.ops import rotations, splines, tridiag  # noqa: F401
