"""Device-mesh scaling of the scenario batch axis.

The reference's only scale-out mechanism is 32 OS processes fanning out
Docker solver calls on one host (reference: generateHeightField.py:344-404)
— no NCCL/MPI exists (SURVEY.md §2.3).  Here scenarios shard over a
`jax.sharding.Mesh`: ICI collectives handle merges inside a slice, and
`jax.distributed` extends the same axis across hosts.
"""

from qtos_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    solve_batch_sharded,
    feasibility_statuses_sharded,
)
