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
from qtos_tpu.solver.assemble_lanes import assemble_lanes, lanes_spec
from qtos_tpu.solver.normal_eq import interval_normal, knot_normal
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


def _aux(spec: ProblemSpec, terrain: Terrain, cfg: SolverConfig) -> KnotAux:
    from qtos_tpu.models.solo12 import Solo12
    from qtos_tpu.ops.rotations import euler_to_rot
    from qtos_tpu.terrain.heightfield import height_at

    K = spec.num_knots
    idx = jnp.arange(K)
    # Start-state boundary accommodations, applied while each foot's first
    # stance phase lasts (contact unbroken since knot 0):
    #  - box_widen: the start's own out-of-box RoM overshoot;
    #  - terr_slack: the start's measured hover above the bilinear surface.
    # See KnotAux for the failure modes these remove.
    st = spec.start
    R0 = euler_to_rot(st.eul)
    d0 = jnp.einsum("ji,kj->ki", R0, st.feet - st.r[None, :]) - Solo12.nominal_feet
    over = jnp.maximum(jnp.abs(d0) - jnp.asarray(cfg.rom_box)[None, :], 0.0)
    h0 = height_at(terrain, st.feet[:, 0], st.feet[:, 1])
    hover0 = jnp.maximum(st.feet[:, 2] - h0, 0.0)
    first_stance = jnp.cumprod(spec.schedule.contact, axis=0)      # (K, 4)
    return KnotAux(
        contact=spec.schedule.contact,
        swing_prog=spec.schedule.swing_progress,
        is_first=(idx == 0).astype(jnp.float32),
        is_last=(idx == K - 1).astype(jnp.float32),
        terr_slack=first_stance * hover0[None, :],
        box_widen=first_stance[:, :, None] * over[None, :, :],
        first_stance=first_stance,
    )


def _residuals(x, spec, terrain, cfg):
    aux = _aux(spec, terrain, cfg)
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
    """Block-tridiagonal Gauss-Newton system, assembled directly in block
    space (qtos_tpu.solver.normal_eq) — no dense per-row Jacobian is ever
    materialized.  Equivalence with the dense path (itself pinned to autodiff
    by tests/test_jacobians.py) is pinned by tests/test_normal_eq.py."""
    aux = _aux(spec, terrain, cfg)
    D, g, sq_k = jax.vmap(lambda xk, a: knot_normal(xk, a, spec, terrain, cfg))(x, aux)

    Daa, Dbb, L, ga, gb, sq_i = jax.vmap(
        lambda a, b, ca, cb: interval_normal(a, b, ca, cb, spec, cfg)
    )(x[:-1], x[1:], spec.schedule.contact[:-1], spec.schedule.contact[1:])

    D = D.at[:-1].add(Daa).at[1:].add(Dbb)
    g = g.at[:-1].add(ga).at[1:].add(gb)

    merit = 0.5 * (jnp.sum(sq_k) + jnp.sum(sq_i))
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
                jnp.where(accept, lm * cfg.lm_down, lm * cfg.lm_up), cfg.lm_min, cfg.lm_max
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
        # Final selection between the best ACCEPTED point and the last trial
        # point is by max constraint VIOLATION, not merit: merit trades the
        # constraint families against goal/regularization terms, so at low
        # damping a lower-merit iterate can carry a higher dynamics defect
        # (measured: 512/512 converged at 6 LM iters dropping to 362/512 at 8
        # under merit selection — violation selection restores monotonicity).
        viol_b = violations(x, spec, terrain, cfg)
        viol_t = violations(x_trial, spec, terrain, cfg)
        mv_b = jnp.max(jnp.stack([viol_b[k] for k in sorted(viol_b)]))
        mv_t = jnp.max(jnp.stack([viol_t[k] for k in sorted(viol_t)]))
        take_t = mv_t < mv_b
        x = jnp.where(take_t, x_trial, x)
        viol = jax.tree_util.tree_map(
            lambda b, t: jnp.where(take_t, t, b), viol_b, viol_t
        )
        max_v = jnp.minimum(mv_b, mv_t)
        merit = jnp.where(take_t, _merit(x_trial, spec, terrain, cfg), merit)
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


def _use_lanes() -> bool:
    import os

    if os.environ.get("QTOS_NO_LANES"):
        return False
    return jax.default_backend() != "cpu"


def _lanes_linsolve(D, L, g):
    """Batched BTD solve in lanes layout (K, n, n, N)."""
    import os

    if jax.default_backend() == "cpu" or os.environ.get("QTOS_NO_PALLAS"):
        from qtos_tpu.ops.tridiag import _block_tridiag_solve_lanes

        return _block_tridiag_solve_lanes(D, L, g)
    from qtos_tpu.ops.pallas.btd import btd_solve_pallas_lanes

    return btd_solve_pallas_lanes(D, L, g)


def _solve_batch_lanes(
    specs: ProblemSpec,
    terrain: Terrain,
    cfg: SolverConfig,
    x0: jax.Array | None = None,
) -> SolveResult:
    """Batch-on-lanes solver loop: every iterate keeps the scenario batch on
    the minor (lane) axis — assembly (`assemble_lanes`), damping, and the
    Pallas BTD solve all share the layout, so no per-iteration transposes of
    the ~200 MB system are paid."""
    with jax.default_matmul_precision("highest"):
        if x0 is None:
            x0 = jax.vmap(lambda s: initial_guess(s, terrain, cfg))(specs)  # (B, K, NV)
        B, K, _ = x0.shape
        xT = jnp.transpose(x0, (2, 1, 0))                          # (NV, K, B)
        ls = lanes_spec(specs)
        dt = specs.dt
        eyeNV = jnp.eye(NV, dtype=xT.dtype)[None, :, :, None]

        def asm(xt):
            return assemble_lanes(xt, ls, terrain, cfg, dt)

        def body(_, carry):
            x, x_best, D_b, L_b, g_b, merit_b, lm = carry
            D, L, g, merit = asm(x)
            accept = merit < merit_b                               # (B,)
            a4 = accept[None, None, None, :]
            a3 = accept[None, None, :]
            x_best = jnp.where(a3, x, x_best)
            D_b = jnp.where(a4, D, D_b)
            L_b = jnp.where(a4, L, L_b)
            g_b = jnp.where(a3, g, g_b)
            merit_b = jnp.where(accept, merit, merit_b)
            lm = jnp.clip(
                jnp.where(accept, lm * cfg.lm_down, lm * cfg.lm_up), cfg.lm_min, cfg.lm_max
            )
            diag = jnp.transpose(jnp.diagonal(D_b, axis1=1, axis2=2), (0, 2, 1))
            dmat = lm[None, None, :] * diag + 1e-8                 # (K, NV, B)
            Dd = D_b + eyeNV * dmat[:, :, None, :]
            dx = _lanes_linsolve(Dd, L_b, -g_b)                    # (K, NV, B)
            return jnp.swapaxes(dx, 0, 1) + x_best, x_best, D_b, L_b, g_b, merit_b, lm

        zeros_sys = (
            jnp.zeros((K, NV, NV, B), xT.dtype),
            jnp.zeros((K - 1, NV, NV, B), xT.dtype),
            jnp.zeros((K, NV, B), xT.dtype),
        )
        x_trial, x_best, _, _, _, merit_b, lm = jax.lax.fori_loop(
            0,
            cfg.max_iters,
            body,
            (xT, xT, *zeros_sys, jnp.full((B,), jnp.inf, xT.dtype),
             jnp.full((B,), cfg.lm_init, xT.dtype)),
        )
        # Final selection between best accepted point and last trial is by
        # max constraint VIOLATION (see `solve` for the rationale and the
        # measured monotonicity failure of merit selection).  This also drops
        # the full normal-equation assembly the old merit-only comparison
        # paid on the trial point — violations are residual-only.
        xb = jnp.transpose(x_best, (2, 1, 0))                      # (B, K, NV)
        xt = jnp.transpose(x_trial, (2, 1, 0))
        viol_fn = jax.vmap(lambda xx, s: violations(xx, s, terrain, cfg))
        viol_b = viol_fn(xb, specs)
        viol_t = viol_fn(xt, specs)
        mv_b = jnp.max(jnp.stack([viol_b[k] for k in sorted(viol_b)], -1), -1)
        mv_t = jnp.max(jnp.stack([viol_t[k] for k in sorted(viol_t)], -1), -1)
        take_t = mv_t < mv_b                                       # (B,)
        x = jnp.where(take_t[:, None, None], xt, xb)
        viol = jax.tree_util.tree_map(
            lambda b, t: jnp.where(take_t, t, b), viol_b, viol_t
        )
        max_v = jnp.minimum(mv_b, mv_t)
        # merit is diagnostics-only (utils/profiling.py): report the best
        # ACCEPTED merit rather than paying a full residual pass to price
        # the trial point exactly (~6% of bench wall time at B=8192)
        merit = merit_b
        status = jnp.where(max_v < cfg.tol, STATUS_CONVERGED, STATUS_MAX_ITERS).astype(
            jnp.int32
        )
        return SolveResult(
            x=x,
            status=status,
            merit=merit,
            max_violation=max_v,
            viol=viol,
            iters=jnp.full((B,), cfg.max_iters, jnp.int32),
        )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _solve_pass(
    specs: ProblemSpec,
    terrain: Terrain,
    cfg: SolverConfig,
    x0: jax.Array | None = None,
) -> SolveResult:
    if _use_lanes():
        return _solve_batch_lanes(specs, terrain, cfg, x0)
    if x0 is None:
        return jax.vmap(lambda s: solve(s, terrain, cfg))(specs)
    return jax.vmap(lambda s, x: solve(s, terrain, cfg, x))(specs, x0)


def solve_batch(
    specs: ProblemSpec,
    terrain: Terrain,
    cfg: SolverConfig = SolverConfig(),
) -> SolveResult:
    """Solve a stacked batch of specs on one terrain.

    This is the end-to-end replacement for the reference's scenario fan-out
    (32 multiprocessing workers x `docker exec` TOWR solves — reference:
    QTOS/generateHeightField.py:344-404).

    On TPU the whole iteration runs in batch-on-lanes layout; on CPU (tests,
    virtual meshes) it falls back to the per-scenario vmap of `solve`.

    With ``cfg.rescue_iters > 0`` a compacted second pass re-solves the
    unconverged tail: indices of failed scenarios are gathered (static cap
    ``max(B // rescue_frac, 128)``), warm-started from their pass-1 iterate,
    run ``rescue_iters`` more LM iterations, and scattered back only where
    the violation improved.  IPOPT adapts its iteration count per problem
    (7-8 on this class — reference: logs/towr_log.out:64, 201); this is the
    static-shape batch analog.  The two passes are separate XLA programs
    (compiling both solver instances into one program is pathologically slow);
    rescue therefore requires an eager call — under a trace (vmap/jit of
    solve_batch itself) it falls back to the single pass.
    """
    pass1_cfg = cfg.replace(rescue_iters=0) if cfg.rescue_iters > 0 else cfg
    res = _solve_pass(specs, terrain, pass1_cfg)
    if cfg.rescue_iters <= 0 or isinstance(res.status, jax.core.Tracer):
        return res

    import numpy as np

    bad = np.flatnonzero(np.asarray(res.status) != STATUS_CONVERGED)
    if bad.size == 0:
        return res
    B = res.x.shape[0]
    # Floor from rescue_frac (the expected-tail budget), but grow to cover
    # the ACTUAL failure mass: a pass-1 regression must degrade to "slower"
    # (bigger rescue), never to "mostly-unconverged results" (round-4
    # postmortem: a B/8 cap could not absorb a 79% failure rate).  Cap sizes
    # are bucketed to powers of two on 128-lane groups so at most
    # log2(B/128)+1 rescue executables are ever compiled.
    floor = max(B // max(cfg.rescue_frac, 1), min(B, 128))
    cap = max(floor, int(bad.size))
    cap = min(B, 128 * (1 << max(0, (cap + 127) // 128 - 1).bit_length()))
    idx = np.full(cap, B, np.int32)
    idx[: min(bad.size, cap)] = bad[:cap]

    cfg2 = cfg.replace(max_iters=cfg.rescue_iters, rescue_iters=0)
    return _rescue_pass(specs, terrain, cfg2, res, jnp.asarray(idx))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _rescue_pass(
    specs: ProblemSpec,
    terrain: Terrain,
    cfg: SolverConfig,
    res: SolveResult,
    idx: jax.Array,
) -> SolveResult:
    """Gather idx-selected scenarios, re-solve warm-started, merge improved.

    One XLA program: the gather/scatter bookkeeping rides along with the
    single rescue solver instance (eager per-leaf gathers cost a host round
    trip each on a tunneled device).  Slots with idx == B are padding:
    gathers clamp, scatters drop."""
    B = res.x.shape[0]
    idx_g = jnp.minimum(idx, B - 1)

    sub = jax.tree_util.tree_map(lambda a: a[idx_g], specs)
    res2 = _solve_pass(sub, terrain, cfg, res.x[idx_g])

    valid = idx < B
    improved = valid & (res2.max_violation < res.max_violation[idx_g])

    def merge(old, new):
        upd = jnp.where(improved.reshape((-1,) + (1,) * (new.ndim - 1)), new, old[idx_g])
        return old.at[idx].set(upd, mode="drop")

    return SolveResult(
        x=merge(res.x, res2.x),
        status=merge(res.status, res2.status),
        merit=merge(res.merit, res2.merit),
        max_violation=merge(res.max_violation, res2.max_violation),
        viol=jax.tree_util.tree_map(merge, res.viol, res2.viol),
        iters=merge(res.iters, res.iters[idx_g] + res2.iters),
    )
