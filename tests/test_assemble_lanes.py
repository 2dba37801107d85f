"""Lanes-layout assembly must match the per-scenario vmapped assembly.

Pins `qtos_tpu.solver.assemble_lanes` (batch on the lane axis) to
`qtos_tpu.solver.solve._assemble` (batch-leading vmap over
`normal_eq.knot_normal`/`interval_normal`), closing the chain
autodiff -> dense J -> block-space D/L/g -> lanes layout.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.assemble_lanes import assemble_lanes, lanes_spec
from qtos_tpu.solver.solve import _assemble
from qtos_tpu.solver.transcription import initial_guess
from qtos_tpu.terrain import make_terrain

import pytest

pytestmark = pytest.mark.slow  # full lanes-vs-block consistency sweep (~200 s compile-bound)



def test_assemble_lanes_matches_vmap():
    terrain = make_terrain(["step", "plane"])
    cfg = SolverConfig(max_iters=4)
    B, K = 6, 13
    goals = jnp.linspace(0.2, 0.6, B)
    specs = jax.vmap(lambda g: default_spec(terrain, goal_xy=(g, 0.03), K=K, duration=1.5))(goals)
    x0 = jax.vmap(lambda s: initial_guess(s, terrain, cfg))(specs)
    key = jax.random.PRNGKey(1)
    x = x0 + 0.05 * jax.random.normal(key, x0.shape)

    D_ref, L_ref, g_ref, merit_ref = jax.vmap(
        lambda xx, s: _assemble(xx, s, terrain, cfg)
    )(x, specs)

    xT = jnp.transpose(x, (2, 1, 0))                               # (NV, K, B) lanes
    ls = lanes_spec(specs)
    D, L, g, merit = assemble_lanes(xT, ls, terrain, cfg, specs.dt)

    # lanes outputs are (K, 36, 36, N); reference is (B, K, 36, 36)
    D = jnp.transpose(D, (3, 0, 1, 2))
    L = jnp.transpose(L, (3, 0, 1, 2))
    g = jnp.transpose(g, (2, 0, 1))

    tol = dict(atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(D), np.asarray(D_ref), **tol)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), **tol)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), **tol)
    np.testing.assert_allclose(np.asarray(merit), np.asarray(merit_ref), rtol=1e-4)


def test_solve_batch_lanes_matches_vmap():
    from qtos_tpu.solver.solve import _solve_batch_lanes, solve

    terrain = make_terrain(["plane", "plane"])
    cfg = SolverConfig(max_iters=6)
    B, K = 4, 13
    goals = jnp.linspace(0.2, 0.5, B)
    specs = jax.vmap(lambda g: default_spec(terrain, goal_xy=(g, 0.0), K=K, duration=1.5))(goals)

    ref = jax.vmap(lambda s: solve(s, terrain, cfg))(specs)
    res = _solve_batch_lanes(specs, terrain, cfg)

    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(res.max_violation), np.asarray(ref.max_violation), atol=1e-3
    )
