"""shard_map collective pattern on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.parallel.distributed import global_scenario_mesh, solve_batch_collective
from qtos_tpu.parallel.mesh import make_mesh, shard_batch
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.terrain import make_terrain


def test_solve_batch_collective_all_gather():
    terr = make_terrain(["plane"])
    cfg = SolverConfig(max_iters=12)
    B = 8
    goals = jnp.linspace(0.15, 0.35, B)
    specs = jax.vmap(lambda g: default_spec(terr, goal_xy=(g, 0.0), K=13, duration=1.5))(goals)
    mesh = make_mesh(8)
    specs = shard_batch(specs, mesh)
    x, status, gathered = solve_batch_collective(specs, terr, cfg, mesh)
    assert x.shape[0] == B
    # the all-gathered status vector is full-length and replicated
    assert gathered.shape == (B,)
    np.testing.assert_array_equal(np.asarray(gathered), np.asarray(status))


def test_global_mesh_covers_all_devices():
    mesh = global_scenario_mesh()
    assert mesh.devices.size == len(jax.devices())
