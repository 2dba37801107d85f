"""shard_map collective pattern on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.parallel.distributed import global_scenario_mesh, solve_batch_collective
from qtos_tpu.parallel.mesh import make_mesh, shard_batch
from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.terrain import make_terrain
import pytest


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


@pytest.mark.slow  # spawns 2 fresh-compile processes; nightly
def test_two_process_distributed_smoke():
    """Real multi-process `jax.distributed` path (initialize_multihost):
    two CPU processes join a local coordinator, build the global mesh, run
    the collective solve, and each must see the full all-gathered status
    vector.  This is the cross-host story the 8-virtual-device tests cannot
    cover (they are single-process)."""
    import os
    import socket
    import subprocess
    import sys

    # pick a free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "helpers", "dist_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    # the workers must each see exactly their own single CPU device
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DIST_OK pid={pid} gathered=[0, 0]" in out, out
