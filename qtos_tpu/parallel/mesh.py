"""Mesh construction and sharded batch solving."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# NOTE: solver/terrain imports are deferred into the functions that need
# them: those modules build jnp constants at import time, which initialises
# the XLA backend — and `jax.distributed.initialize` (see
# qtos_tpu.parallel.distributed.initialize_multihost) must run BEFORE any
# backend init on a multi-host cluster.

SCENARIO_AXIS = "scenario"


def make_mesh(n_devices: int | None = None, axis: str = SCENARIO_AXIS) -> Mesh:
    """1-D mesh over the first n devices (scenario/data-parallel axis)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(specs, mesh: Mesh, axis: str = SCENARIO_AXIS):
    """Place a stacked ProblemSpec batch with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))

    def place(leaf):
        return jax.device_put(leaf, sharding)

    return jax.tree.map(place, specs)


def solve_batch_sharded(specs, terrain, cfg, mesh: Mesh):
    """Batched solve with scenarios sharded over the mesh.

    XLA partitions the whole Gauss-Newton iteration along the batch axis —
    zero collectives in the hot loop (scenarios are independent), which is
    the ideal mapping; the reference paid process + Docker-exec + CSV
    overhead per scenario instead (SURVEY.md §3.4)."""
    from qtos_tpu.solver.solve import solve_batch

    specs = shard_batch(specs, mesh)
    terrain = jax.device_put(terrain, NamedSharding(mesh, P()))  # replicated
    return solve_batch(specs, terrain, cfg)


def feasibility_statuses_sharded(specs, terrain, cfg, mesh: Mesh):
    """Sharded feasibility probe: statuses gathered to host for map stamping
    (the all-gather replacing the reference's multiprocessing.Array + Lock
    merge — generateHeightField.py:210-213, 388-394)."""
    res = solve_batch_sharded(specs, terrain, cfg, mesh)
    return np.asarray(res.status)
