"""Standalone 2-process jax.distributed smoke worker (test_distributed.py)."""
import sys

def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # initialize BEFORE importing qtos_tpu: the package builds jnp constants
    # at import time, which would initialise the XLA backend single-process
    from qtos_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from qtos_tpu.parallel.distributed import global_scenario_mesh, solve_batch_collective
    from qtos_tpu.parallel.mesh import shard_batch
    from qtos_tpu.solver import SolverConfig, default_spec
    from qtos_tpu.terrain import make_terrain
    assert jax.process_count() == nproc
    mesh = global_scenario_mesh()
    assert mesh.devices.size == len(jax.devices())

    terr = make_terrain(["plane"])
    cfg = SolverConfig(max_iters=4)
    B = mesh.devices.size
    goals = jnp.linspace(0.15, 0.35, B)
    specs = jax.vmap(lambda g: default_spec(terr, goal_xy=(g, 0.0), K=13, duration=1.5))(goals)
    specs = shard_batch(specs, mesh)
    x, status, gathered = solve_batch_collective(specs, terr, cfg, mesh)
    g = np.asarray(jax.device_get(gathered))
    assert g.shape == (B,), g.shape
    print(f"DIST_OK pid={pid} gathered={g.tolist()}", flush=True)

if __name__ == "__main__":
    main()
