"""Block-space normal-equation assembly must match the dense-Jacobian path.

`qtos_tpu.solver.jacobians` is pinned to autodiff by test_jacobians.py; this
pins `qtos_tpu.solver.normal_eq` to the dense einsum assembly, closing the
chain autodiff -> dense J -> block-space D/L/g.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.jacobians import interval_system, knot_system
from qtos_tpu.solver.normal_eq import interval_normal, knot_normal
from qtos_tpu.solver.solve import _aux
from qtos_tpu.solver.transcription import initial_guess
from qtos_tpu.terrain import make_terrain


@pytest.fixture(scope="module")
def problem():
    terrain = make_terrain(["step", "plane"])
    cfg = SolverConfig(max_iters=4)
    spec = default_spec(terrain, goal_xy=(0.5, 0.05), K=13, duration=1.5)
    x0 = initial_guess(spec, terrain, cfg)
    # perturb off the guess so hinges activate on both sides
    key = jax.random.PRNGKey(0)
    x = x0 + 0.05 * jax.random.normal(key, x0.shape)
    return terrain, cfg, spec, x


def test_knot_normal_matches_dense(problem):
    terrain, cfg, spec, x = problem
    aux = _aux(spec, terrain, cfg)

    rho, J = jax.vmap(lambda xk, a: knot_system(xk, a, spec, terrain, cfg))(x, aux)
    D_ref = jnp.einsum("kmi,kmj->kij", J, J)
    g_ref = jnp.einsum("kmi,km->ki", J, rho)
    sq_ref = jnp.sum(rho * rho, axis=-1)

    D, g, sq = jax.vmap(lambda xk, a: knot_normal(xk, a, spec, terrain, cfg))(x, aux)

    np.testing.assert_allclose(np.asarray(D), np.asarray(D_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sq_ref), atol=1e-4, rtol=1e-4)


def test_interval_normal_matches_dense(problem):
    terrain, cfg, spec, x = problem
    ca = spec.schedule.contact[:-1]
    cb = spec.schedule.contact[1:]

    rho, Ja, Jb = jax.vmap(
        lambda a, b, c0, c1: interval_system(a, b, c0, c1, spec, cfg)
    )(x[:-1], x[1:], ca, cb)
    Daa_ref = jnp.einsum("kmi,kmj->kij", Ja, Ja)
    Dbb_ref = jnp.einsum("kmi,kmj->kij", Jb, Jb)
    Lba_ref = jnp.einsum("kmi,kmj->kij", Jb, Ja)
    ga_ref = jnp.einsum("kmi,km->ki", Ja, rho)
    gb_ref = jnp.einsum("kmi,km->ki", Jb, rho)
    sq_ref = jnp.sum(rho * rho, axis=-1)

    Daa, Dbb, Lba, ga, gb, sq = jax.vmap(
        lambda a, b, c0, c1: interval_normal(a, b, c0, c1, spec, cfg)
    )(x[:-1], x[1:], ca, cb)

    tol = dict(atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(Daa), np.asarray(Daa_ref), **tol)
    np.testing.assert_allclose(np.asarray(Dbb), np.asarray(Dbb_ref), **tol)
    np.testing.assert_allclose(np.asarray(Lba), np.asarray(Lba_ref), **tol)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), **tol)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), **tol)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sq_ref), **tol)
