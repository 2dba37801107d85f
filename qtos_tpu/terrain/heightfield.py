"""Jittable heightfield terrain.

World convention (matches the reference's arena layout): tiles are 2 m x 2 m,
composed along +x; the robot starts at the center of the first tile, so a
k-tile map spans x in [-1, 2k-1], y in [-1, 1] (reference:
QTOS/generateHeightField.py:561 ``resolution = 1/(dim/2)``; default goals like
``-g 4.5 0 0.24`` sit near the end of a 3-tile run).

Unlike the reference — where the heightfield is a txt file copied into the
solver's Docker container (QTOS/utils.py:21-22) and probed via PyBullet
raycasts — the terrain here is a device array queried inside the NLP with
bilinear interpolation, so height and gradient are differentiable and
batchable.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from qtos_tpu.terrain import tiles as tiles_lib


@struct.dataclass
class Terrain:
    """Heightfield grid. rows = y, cols = x, cell size = resolution meters."""

    height: jax.Array          # (H, W) float32 heights
    resolution: float = struct.field(pytree_node=False, default=0.1)
    origin: tuple = struct.field(pytree_node=False, default=(-1.0, -1.0))  # world xy of cell (0, 0) corner

    @property
    def extent(self):
        h, w = self.height.shape
        x0, y0 = self.origin
        return (x0, y0, x0 + w * self.resolution, y0 + h * self.resolution)


def make_terrain(
    names: Sequence[str] | str = ("plane",),
    scale_factor: int = 1,
    randomize: bool = False,
    rng: np.random.Generator | None = None,
    random_height_amp: float = 0.02,
) -> Terrain:
    """Compose named tiles along +x into one Terrain.

    ``scale_factor`` upsamples each cell (reference:
    QTOS/generateHeightField.py:39-56 ``scale_map``), shrinking the cell size so
    the world extent is unchanged.
    """
    if isinstance(names, str):
        names = [names]
    mats = [tiles_lib.tile(n) for n in names]
    grid = np.concatenate(mats, axis=1)  # compose along x
    if scale_factor > 1:
        grid = np.kron(grid, np.ones((scale_factor, scale_factor), dtype=grid.dtype))
    if randomize:
        rng = rng or np.random.default_rng(0)
        grid = grid + rng.uniform(0.0, random_height_amp, size=grid.shape).astype(grid.dtype)
    res = 0.1 / scale_factor
    return Terrain(height=jnp.asarray(grid, jnp.float32), resolution=res, origin=(-1.0, -1.0))


def _cell_coords(terrain: Terrain, x, y):
    x0, y0 = terrain.origin
    H, W = terrain.height.shape
    cx = (x - x0) / terrain.resolution - 0.5
    cy = (y - y0) / terrain.resolution - 0.5
    cx = jnp.clip(cx, 0.0, W - 1.001)
    cy = jnp.clip(cy, 0.0, H - 1.001)
    return cx, cy


def height_at(terrain: Terrain, x, y):
    """Bilinear height query; broadcasts over any shape of (x, y)."""
    cx, cy = _cell_coords(terrain, x, y)
    ix = jnp.floor(cx).astype(jnp.int32)
    iy = jnp.floor(cy).astype(jnp.int32)
    fx = cx - ix
    fy = cy - iy
    h = terrain.height
    h00 = h[iy, ix]
    h01 = h[iy, ix + 1]
    h10 = h[iy + 1, ix]
    h11 = h[iy + 1, ix + 1]
    return (
        h00 * (1 - fx) * (1 - fy)
        + h01 * fx * (1 - fy)
        + h10 * (1 - fx) * fy
        + h11 * fx * fy
    )


def grad_at(terrain: Terrain, x, y):
    """Analytic gradient (dh/dx, dh/dy) of the bilinear surface."""
    cx, cy = _cell_coords(terrain, x, y)
    ix = jnp.floor(cx).astype(jnp.int32)
    iy = jnp.floor(cy).astype(jnp.int32)
    fx = cx - ix
    fy = cy - iy
    h = terrain.height
    h00 = h[iy, ix]
    h01 = h[iy, ix + 1]
    h10 = h[iy + 1, ix]
    h11 = h[iy + 1, ix + 1]
    dhdx = ((h01 - h00) * (1 - fy) + (h11 - h10) * fy) / terrain.resolution
    dhdy = ((h10 - h00) * (1 - fx) + (h11 - h01) * fx) / terrain.resolution
    return dhdx, dhdy


_SLOPE_EPS = 1e-12


def slope_terrain(terrain: Terrain, d: float) -> Terrain:
    """A Terrain whose height grid is the SLOPE magnitude of this one,
    central-differenced with probe half-width `d` (foot-scale, wider than a
    heightfield cell).  Unlike `grad_at` the probed slope sees a sharp riser
    from `d` away, so a Gauss-Newton step on it has usable derivatives — the
    raw bilinear gradient is piecewise constant per cell (zero second
    derivative, no descent signal).

    Computed lazily from `terrain.height` with shifts (one (H, W) pass XLA
    fuses into the assembly), NOT stored on Terrain: dynamic-terrain
    mutations (shift_terrain / add_box_obstacle) can then never leave a
    stale slope grid behind.  The per-knot lookups this replaces (4
    height_at + 4 grad_at probes per foot) were 8 TPU gathers; a grid
    lookup is 1 (measured: 5.6k -> 3.6k solves/s regression from the
    probe-based version, recovered by this form)."""
    h = terrain.height
    res = terrain.resolution
    n = max(1, int(round(d / res)))
    H, W = h.shape
    ix = jnp.arange(W)
    iy = jnp.arange(H)
    xp = h[:, jnp.clip(ix + n, 0, W - 1)]
    xm = h[:, jnp.clip(ix - n, 0, W - 1)]
    yp = h[jnp.clip(iy + n, 0, H - 1), :]
    ym = h[jnp.clip(iy - n, 0, H - 1), :]
    gx = (xp - xm) / (2 * n * res)
    gy = (yp - ym) / (2 * n * res)
    return terrain.replace(height=jnp.sqrt(gx * gx + gy * gy + _SLOPE_EPS))


def slope_at(terrain: Terrain, x, y, d: float):
    """Slope magnitude at (x, y): bilinear lookup on `slope_terrain`'s grid.
    Built on `height_at`, so autodiff through it matches `slope_grad_at`."""
    return height_at(slope_terrain(terrain, d), x, y)


def slope_grad_at(terrain: Terrain, x, y, d: float):
    """(s, ds/dx, ds/dy) of `slope_at` in closed form (for the analytic
    normal-equation assemblies; pinned to the autodiff of `slope_at` by
    tests/test_jacobians.py)."""
    ts = slope_terrain(terrain, d)
    s = height_at(ts, x, y)
    sx, sy = grad_at(ts, x, y)
    return s, sx, sy


def shift_terrain(terrain: Terrain, rows: int = 0, cols: int = 0, fill: float = 0.0) -> Terrain:
    """Dynamic-terrain update: scroll the height grid by (rows, cols) cells,
    filling vacated cells (reference: QTOS/generateHeightField.py
    Height_Map_Generator.update/shift_map + QTOS/simulation.py:102 dynamic
    terrain).  jittable; shape is unchanged so downstream jits don't recompile."""
    h = terrain.height
    h = jnp.roll(h, (rows, cols), axis=(0, 1))
    H, W = h.shape
    if rows > 0:
        h = h.at[:rows].set(fill)
    elif rows < 0:
        h = h.at[rows:].set(fill)
    if cols > 0:
        h = h.at[:, :cols].set(fill)
    elif cols < 0:
        h = h.at[:, cols:].set(fill)
    return terrain.replace(height=h)


def add_box_obstacle(terrain: Terrain, x: float, y: float, half: float = 0.1,
                     height: float = 0.34) -> Terrain:
    """Raise a box-shaped obstacle into the heightfield at world (x, y) —
    the dynamic-terrain event of the reference's exp_8, which spawns a
    0.2 m box at (1.0 + idx, 0, 0.24) mid-run (QTOS/simulation.py:102-115
    `update`: GEOM_BOX halfExtents 0.1 at z 0.24 -> top face 0.34 m).
    Shape/dtype preserved, so downstream jits don't recompile."""
    h = terrain.height
    H, W = h.shape
    x0, y0 = terrain.origin
    res = terrain.resolution
    c0 = int(np.clip(np.floor((x - half - x0) / res), 0, W - 1))
    c1 = int(np.clip(np.ceil((x + half - x0) / res), 1, W))
    r0 = int(np.clip(np.floor((y - half - y0) / res), 0, H - 1))
    r1 = int(np.clip(np.ceil((y + half - y0) / res), 1, H))
    region = h[r0:r1, c0:c1]
    h = h.at[r0:r1, c0:c1].set(jnp.maximum(region, height))
    return terrain.replace(height=h)


def export_heightfield_txt(terrain: Terrain, path: str, towr_frame: bool = False) -> None:
    """Write the height grid in the reference's on-disk heightfield
    interchange format: comma-delimited with a trailing comma per row
    (QTOS/generateHeightField.py create_height_file).

    The reference exports TWO variants (QTOS/generateHeightField.py:562-571):
    the PyBullet row-major grid, and a "TOWR-frame" export that transposes the
    grid then shifts the rows down by one — a zero first row, the last
    transposed row dropped, shape preserved (:568, :616).  ``towr_frame=True``
    reproduces that exact layout for tooling that consumed the old files.
    """
    grid = np.asarray(terrain.height)
    if towr_frame:
        g = grid.T
        out = np.zeros_like(g)
        out[1:] = g[:-1]
        grid = out
    with open(path, "w") as f:
        lines = [", ".join(str(float(v)) for v in row) + "," for row in grid]
        f.write("\n".join(lines))


def import_heightfield_txt(path: str, resolution: float = 0.1,
                           origin: tuple = (-1.0, -1.0)) -> Terrain:
    """Load a reference-format heightfield txt into a Terrain
    (counterpart of QTOS/generateHeightField.py:100 heighmap_2_np_reader).
    Accepts both the reference's comma-delimited format (trailing comma per
    line) and plain whitespace txt."""
    from qtos_tpu.terrain.tiles import load_tile_txt

    with open(path) as f:
        head = f.read(4096)
    if "," in head:
        grid = load_tile_txt(path)
    else:
        grid = np.loadtxt(path, dtype=np.float32)
    return Terrain(height=jnp.asarray(np.atleast_2d(grid)), resolution=resolution,
                   origin=origin)


def traversability_map(terrain: Terrain, height_bound: float = 0.2) -> jax.Array:
    """Boolean obstacle map from local height discontinuity, the cheap analog
    of the reference's solver-probed bool map (QTOS/planner.py:354-399 uses
    ``height_bound = 0.2`` traversability; the expensive probe lives in
    qtos_tpu.planner.feasibility)."""
    h = terrain.height
    pad = jnp.pad(h, 1, mode="edge")
    neigh = jnp.stack(
        [pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:]], axis=0
    )
    jump = jnp.max(jnp.abs(neigh - h[None]), axis=0)
    return (jump > height_bound).astype(jnp.float32)
