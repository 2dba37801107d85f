"""Terrain: heightfield tiles, composition, and jittable height/gradient queries."""

from qtos_tpu.terrain.heightfield import (  # noqa: F401
    Terrain,
    height_at,
    grad_at,
    make_terrain,
)
from qtos_tpu.terrain.tiles import TILE_GENERATORS, tile, load_tile_txt, save_tile_txt  # noqa: F401
