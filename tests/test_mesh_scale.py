"""mesh_scale invariance: the reference scales terrain tiles 5-11x for
rendering fidelity (QTOS/generateHeightField.py:39-56 scale_map feeds both
PyBullet's mesh and the solver's txt export); our presets cap the factor at 2
on the claim that upsampling is visual-only.  This pins that claim
numerically: `make_terrain` upsamples with cell replication (np.kron) while
shrinking `resolution`, so the bilinear surface `height_at` sees — and hence
the solver's terrain residuals and the solved trajectory — must be unchanged
up to interpolation at cell boundaries.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qtos_tpu.solver import SolverConfig, default_spec
from qtos_tpu.solver.solve import solve
from qtos_tpu.terrain import make_terrain
from qtos_tpu.terrain.heightfield import height_at

MAPS = ["step", "step_1"]


def test_height_surface_invariant_under_scale():
    t2 = make_terrain(MAPS, scale_factor=2)
    t5 = make_terrain(MAPS, scale_factor=5)
    rng = np.random.default_rng(0)
    xs = rng.uniform(-0.9, 2.9, 400)
    ys = rng.uniform(-0.9, 0.9, 400)
    h2 = np.asarray(height_at(t2, jnp.asarray(xs), jnp.asarray(ys)))
    h5 = np.asarray(height_at(t5, jnp.asarray(xs), jnp.asarray(ys)))
    # identical up to bilinear smoothing across the (replicated) cell edges:
    # the max step is 0.13 m and an edge is smeared over one fine cell, so
    # pointwise differences stay well under the step height
    assert np.median(np.abs(h2 - h5)) < 1e-3
    assert np.abs(h2 - h5).max() < 0.13 * 0.75


def test_solved_window_invariant_under_scale():
    cfg = SolverConfig(max_iters=25, tol=5e-3)
    sols = {}
    for s in (2, 5):
        terr = make_terrain(MAPS, scale_factor=s)
        spec = default_spec(terr, start_xy=(0.0, 0.0), goal_xy=(0.5, 0.0), K=33)
        res = solve(spec, terr, cfg)
        assert int(res.status) == 0, f"scale {s} window failed to converge"
        sols[s] = np.asarray(res.x)
    # same NLP up to the interpolated surface -> same solution to solver tol
    d_com = np.abs(sols[2][:, 0:3] - sols[5][:, 0:3]).max()
    d_feet = np.abs(sols[2][:, 12:24] - sols[5][:, 12:24]).max()
    assert d_com < 0.01, f"CoM trajectory differs across mesh_scale: {d_com}"
    assert d_feet < 0.02, f"feet differ across mesh_scale: {d_feet}"
