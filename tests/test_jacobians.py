"""Analytic Jacobians must match autodiff of the reference transcription."""

import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.jacobians import interval_system, knot_system
from qtos_tpu.solver.spec import NV
from qtos_tpu.solver.transcription import (
    KnotAux,
    initial_guess,
    interval_residuals,
    knot_residuals,
)
from qtos_tpu.terrain import make_terrain

TERR = make_terrain(["plane", "stairs"])
CFG = SolverConfig()


def _random_state(rng, K):
    spec = default_spec(TERR, start_xy=(0.5, 0.0), goal_xy=(1.3, 0.1), K=K)
    x = initial_guess(spec, TERR, CFG)
    x = x + jnp.asarray(rng.normal(scale=0.02, size=x.shape).astype(np.float32))
    return spec, x


def test_knot_system_matches_autodiff():
    rng = np.random.default_rng(0)
    spec, x = _random_state(rng, 17)
    aux = KnotAux(
        contact=spec.schedule.contact,
        swing_prog=spec.schedule.swing_progress,
        is_first=(jnp.arange(17) == 0).astype(jnp.float32),
        is_last=(jnp.arange(17) == 16).astype(jnp.float32),
        terr_slack=jnp.zeros((17, 4)),
        box_widen=jnp.zeros((17, 4, 3)),
        # zero (not the cumprod) so the slope rows stay ACTIVE at every
        # stance knot — the autodiff-vs-analytic comparison must exercise
        # them on this non-flat terrain
        first_stance=jnp.zeros((17, 4)),
    )
    kfn = lambda xk, a: knot_residuals(xk, a, spec, TERR, CFG)
    for k in [0, 3, 8, 16]:
        a_k = jax.tree.map(lambda l: l[k], aux)
        rho_ref = kfn(x[k], a_k)
        J_ref = jax.jacfwd(kfn)(x[k], a_k)
        rho, J = knot_system(x[k], a_k, spec, TERR, CFG)
        np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=2e-4)


def test_interval_system_matches_autodiff():
    rng = np.random.default_rng(1)
    spec, x = _random_state(rng, 17)
    c = spec.schedule.contact
    ifn = lambda xx, ca, cb: interval_residuals(xx[:NV], xx[NV:], ca, cb, spec, CFG)
    for k in [0, 5, 11, 15]:
        xab = jnp.concatenate([x[k], x[k + 1]])
        rho_ref = ifn(xab, c[k], c[k + 1])
        J_ref = jax.jacfwd(ifn)(xab, c[k], c[k + 1])
        rho, Ja, Jb = interval_system(x[k], x[k + 1], c[k], c[k + 1], spec, CFG)
        np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ja), np.asarray(J_ref[:, :NV]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(Jb), np.asarray(J_ref[:, NV:]), atol=2e-4)
