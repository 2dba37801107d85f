"""Multi-host scaling scaffolding.

The scenario axis extends across hosts with `jax.distributed` + DCN: each
host contributes its chips to one global mesh, scenario batches shard across
all of them, and result gathers ride XLA collectives.  (The reference's only
multi-host story was "run more Docker containers"; SURVEY.md §5.8.)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from qtos_tpu.parallel.mesh import SCENARIO_AXIS

# Solver imports are deferred (see qtos_tpu.parallel.mesh): this module must
# be importable before the XLA backend initialises so initialize_multihost
# can run first on each host of a cluster.


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Join this host to the cluster (call before any device use).

    On Cloud TPU pods the arguments auto-detect; elsewhere pass them
    explicitly (reference has no analog — Docker containers were manually
    launched per machine)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_scenario_mesh(axis: str = SCENARIO_AXIS) -> Mesh:
    """Mesh over every device in the cluster (all hosts)."""
    return Mesh(np.array(jax.devices()), (axis,))


def solve_batch_collective(specs, terrain, cfg, mesh: Mesh):
    """shard_map-batched solve with an explicit all_gather of statuses.

    Demonstrates the framework's collective pattern: per-shard solves run
    independently (no comms in the hot loop), then the per-scenario status
    vector is all-gathered over ICI/DCN so every host can stamp the full
    feasibility map locally — the distributed version of the reference's
    multiprocessing.Array merge (generateHeightField.py:210-213)."""

    from qtos_tpu.solver.solve import solve

    def shard_fn(local_specs):
        res = jax.vmap(lambda s: solve(s, terrain, cfg))(local_specs)
        statuses = jax.lax.all_gather(res.status, SCENARIO_AXIS, tiled=True)
        return res.x, res.status, statuses

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS),),
        out_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS), P()),
        check_vma=False,
    )
    return fn(specs)
