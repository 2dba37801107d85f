"""Terrain geometry parity with the reference's checked-in heightfields.

The reference ships its experiment terrain as txt data
(/root/reference/data/heightfields/*.txt, loaded by name through
QTOS/generateHeightField.py:505-528 `map_files`).  That data is vendored
under data/heightfields/ and `tile()` serves it directly, so exp_2/5/6/7
etc. run the reference's ACTUAL geometry.  These tests pin the vendored
bytes to the reference originals and the name->file contract.
"""

import os

import numpy as np
import pytest

from qtos_tpu.terrain import make_terrain
from qtos_tpu.terrain.tiles import (
    REFERENCE_TILE_FILES,
    _DATA_DIR,
    load_tile_txt,
    tile,
)

REF_DIR = "/root/reference/data/heightfields"


def test_all_reference_tiles_vendored():
    for name, fname in REFERENCE_TILE_FILES.items():
        path = os.path.join(_DATA_DIR, fname)
        assert os.path.exists(path), f"tile {name!r}: {fname} not vendored"
        arr = tile(name)
        assert arr.shape == (20, 20), (name, arr.shape)


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not present")
def test_vendored_tiles_match_reference_exactly():
    for name, fname in sorted(set(REFERENCE_TILE_FILES.items())):
        ours = tile(name)
        ref = load_tile_txt(os.path.join(REF_DIR, fname))
        np.testing.assert_array_equal(ours, ref, err_msg=name)


def test_experiment_terrains_use_reference_geometry():
    """exp_2's composed terrain equals the reference tiles side by side."""
    from qtos_tpu.config import get_experiment

    exp = get_experiment("exp_2")             # step, step_1, step_2, plane
    terr = make_terrain(list(exp.maps))
    grid = np.asarray(terr.height)
    ref = np.concatenate([tile(n) for n in exp.maps], axis=1)
    np.testing.assert_array_equal(grid, ref)
    # the reference's step.txt raises a 0.13 m band — present in the world
    assert grid.max() > 0.1


def test_reference_name_vocabulary():
    """The tricky names of the reference's map_files dict resolve to the
    right geometry: 'stairs' is the TALL staircase, 'stair' the gentle one
    (generateHeightField.py:515, 523-524)."""
    assert tile("stairs").max() == pytest.approx(1.0)
    assert tile("stair").max() == pytest.approx(0.1)
    assert tile("stair_1").max() == pytest.approx(0.2)
    assert tile("random_terrain_1").max() < 0.08


def test_towr_frame_export_matches_reference_transform(tmp_path):
    """towr_frame export = transpose then shift rows down by one (zero first
    row, last transposed row dropped) — QTOS/generateHeightField.py:568+616."""
    from qtos_tpu.terrain.heightfield import (
        export_heightfield_txt,
        import_heightfield_txt,
    )

    terr = make_terrain(["step"])
    grid = np.asarray(terr.height)
    p = tmp_path / "towr.txt"
    export_heightfield_txt(terr, str(p), towr_frame=True)
    out = load_tile_txt(str(p))
    g = grid.T
    expect = np.zeros_like(g)
    expect[1:] = g[:-1]
    np.testing.assert_allclose(out, expect, atol=1e-6)

    # plain export round-trips through the comma-format importer
    p2 = tmp_path / "plain.txt"
    export_heightfield_txt(terr, str(p2))
    back = import_heightfield_txt(str(p2))
    np.testing.assert_allclose(np.asarray(back.height), grid, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not present")
def test_import_reads_actual_reference_files():
    """import_heightfield_txt parses the reference's comma-delimited files
    (trailing comma per line) directly."""
    from qtos_tpu.terrain.heightfield import import_heightfield_txt

    t = import_heightfield_txt(os.path.join(REF_DIR, "step.txt"))
    assert np.asarray(t.height).shape == (20, 20)
    assert float(t.height.max()) == pytest.approx(0.13)
