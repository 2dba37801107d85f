"""Batched Gauss-Newton / Levenberg gait solver.

One compiled solver instance handles an arbitrary scenario batch: `solve` is
a pure function of (spec, terrain) pytrees; `solve_batch` vmaps it.  The
per-iteration core is: vmapped residual Jacobians -> block-tridiagonal normal
equations -> block Thomas solve -> Levenberg accept/reject.  Fixed iteration
count (no data-dependent trip counts) keeps every scenario on the same
instruction stream — the TPU analog of IPOPT's 7-8 interior-point iterations
per solve (reference: logs/towr_log.out:64, 201).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from qtos_tpu.ops.tridiag import block_tridiag_solve
from qtos_tpu.solver.spec import NV, ProblemSpec, SolverConfig
from qtos_tpu.solver.transcription import (
    KnotAux,
    initial_guess,
    interval_residuals,
    knot_residuals,
    violations,
)
from qtos_tpu.terrain.heightfield import Terrain

STATUS_CONVERGED = 0
STATUS_MAX_ITERS = 1


@struct.dataclass
class SolveResult:
    x: jax.Array             # (K, NV) optimized knot trajectory
    status: jax.Array        # () int32: 0 converged, 1 hit max iters
    merit: jax.Array         # () final 0.5*||rho||^2
    max_violation: jax.Array # () max physical constraint violation (m / rad / N-scale)
    viol: dict               # per-family violation scalars
    iters: jax.Array         # () iterations run


def _aux(spec: ProblemSpec) -> KnotAux:
    K = spec.num_knots
    idx = jnp.arange(K)
    return KnotAux(
        contact=spec.schedule.contact,
        swing_prog=spec.schedule.swing_progress,
        is_first=(idx == 0).astype(jnp.float32),
        is_last=(idx == K - 1).astype(jnp.float32),
    )


def _residuals(x, spec, terrain, cfg):
    aux = _aux(spec)
    kfn = lambda xk, a: knot_residuals(xk, a, spec, terrain, cfg)
    rho_k = jax.vmap(kfn)(x, aux)
    xab = jnp.concatenate([x[:-1], x[1:]], axis=-1)
    ifn = lambda xx, ca, cb: interval_residuals(xx[:NV], xx[NV:], ca, cb, spec, cfg)
    rho_i = jax.vmap(ifn)(xab, spec.schedule.contact[:-1], spec.schedule.contact[1:])
    return rho_k, rho_i


def _merit(x, spec, terrain, cfg):
    rho_k, rho_i = _residuals(x, spec, terrain, cfg)
    return 0.5 * (jnp.sum(rho_k * rho_k) + jnp.sum(rho_i * rho_i))


def _assemble(x, spec, terrain, cfg):
    """Residuals + block-tridiagonal Gauss-Newton system (analytic Jacobians
    from qtos_tpu.solver.jacobians; autodiff equivalence is pinned by
    tests/test_jacobians.py)."""
    from qtos_tpu.solver.jacobians import interval_system, knot_system

    aux = _aux(spec)
    rho_k, Jk = jax.vmap(lambda xk, a: knot_system(xk, a, spec, terrain, cfg))(x, aux)

    rho_i, Ja, Jb = jax.vmap(
        lambda a, b, ca, cb: interval_system(a, b, ca, cb, spec, cfg)
    )(x[:-1], x[1:], spec.schedule.contact[:-1], spec.schedule.contact[1:])

    D = jnp.einsum("kmi,kmj->kij", Jk, Jk)
    D = D.at[:-1].add(jnp.einsum("kmi,kmj->kij", Ja, Ja))
    D = D.at[1:].add(jnp.einsum("kmi,kmj->kij", Jb, Jb))
    L = jnp.einsum("kmi,kmj->kij", Jb, Ja)                      # block at (k+1, k)

    g = jnp.einsum("kmi,km->ki", Jk, rho_k)
    g = g.at[:-1].add(jnp.einsum("kmi,km->ki", Ja, rho_i))
    g = g.at[1:].add(jnp.einsum("kmi,km->ki", Jb, rho_i))

    merit = 0.5 * (jnp.sum(rho_k * rho_k) + jnp.sum(rho_i * rho_i))
    return D, L, g, merit


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve(
    spec: ProblemSpec,
    terrain: Terrain,
    cfg: SolverConfig = SolverConfig(),
    x0: jax.Array | None = None,
) -> SolveResult:
    """Solve one gait window. jit-compiled; vmap via `solve_batch`."""
    with jax.default_matmul_precision("highest"):
        if x0 is None:
            x0 = initial_guess(spec, terrain, cfg)

        eyes = jnp.eye(NV)[None]

        # One residual/Jacobian evaluation per iteration: the candidate step is
        # evaluated by the NEXT iteration's assemble; on rejection we revert to
        # the stored system of the last accepted point (classic "delayed
        # gratification" LM — halves residual work vs a separate merit pass).
        def body(_, carry):
            x, x_best, D_b, L_b, g_b, merit_b, lm = carry
            D, L, g, merit = _assemble(x, spec, terrain, cfg)
            accept = merit < merit_b
            x_best = jnp.where(accept, x, x_best)
            D_b = jnp.where(accept, D, D_b)
            L_b = jnp.where(accept, L, L_b)
            g_b = jnp.where(accept, g, g_b)
            merit_b = jnp.where(accept, merit, merit_b)
            lm = jnp.clip(
                jnp.where(accept, lm * 0.4, lm * 4.0), cfg.lm_min, cfg.lm_max
            )
            diag = jnp.diagonal(D_b, axis1=-2, axis2=-1)
            damp = lm * diag[..., None] * eyes[0][None] + 1e-8 * eyes
            dx = block_tridiag_solve(D_b + damp, L_b, -g_b)
            return x_best + dx, x_best, D_b, L_b, g_b, merit_b, lm

        K = x0.shape[0]
        zeros_sys = (
            jnp.zeros((K, NV, NV)),
            jnp.zeros((K - 1, NV, NV)),
            jnp.zeros((K, NV)),
        )
        x_trial, x, _, _, _, merit, lm = jax.lax.fori_loop(
            0,
            cfg.max_iters,
            body,
            (x0, x0, *zeros_sys, jnp.asarray(jnp.inf), jnp.asarray(cfg.lm_init)),
        )
        # last trial point may be better than the last accepted one
        merit_trial = _merit(x_trial, spec, terrain, cfg)
        x = jnp.where(merit_trial < merit, x_trial, x)
        merit = jnp.minimum(merit_trial, merit)

        viol = violations(x, spec, terrain, cfg)
        max_v = jnp.max(jnp.stack([viol[k] for k in sorted(viol)]))
        status = jnp.where(max_v < cfg.tol, STATUS_CONVERGED, STATUS_MAX_ITERS).astype(
            jnp.int32
        )
        return SolveResult(
            x=x,
            status=status,
            merit=merit,
            max_violation=max_v,
            viol=viol,
            iters=jnp.asarray(cfg.max_iters, jnp.int32),
        )


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve_batch(
    specs: ProblemSpec,
    terrain: Terrain,
    cfg: SolverConfig = SolverConfig(),
) -> SolveResult:
    """Solve a stacked batch of specs on one terrain.

    This is the end-to-end replacement for the reference's scenario fan-out
    (32 multiprocessing workers x `docker exec` TOWR solves — reference:
    QTOS/generateHeightField.py:344-404).
    """
    return jax.vmap(lambda s: solve(s, terrain, cfg))(specs)
