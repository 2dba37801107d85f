"""Terrain: heightfield tiles, composition, and jittable height/gradient queries."""

from qtos_tpu.terrain.heightfield import (  # noqa: F401
    Terrain,
    export_heightfield_txt,
    grad_at,
    height_at,
    import_heightfield_txt,
    make_terrain,
    shift_terrain,
    traversability_map,
)
from qtos_tpu.terrain.tiles import TILE_GENERATORS, tile, load_tile_txt, save_tile_txt  # noqa: F401
