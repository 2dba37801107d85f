"""Builder bundle + heightfield txt interchange tests (round 2)."""

import numpy as np

from qtos_tpu.builder import Bundle, build
from qtos_tpu.terrain import (
    export_heightfield_txt,
    import_heightfield_txt,
    make_terrain,
)


def test_build_bundle_wiring():
    b = build("exp_1", goal_xy=(1.0, 0.0))
    assert isinstance(b, Bundle)
    assert b.exp.name == "exp_1"
    assert b.terrain.height.ndim == 2
    assert b.runner.planner is b.planner
    # goal override propagated
    np.testing.assert_allclose(np.asarray(b.runner.goal_xy), [1.0, 0.0])
    assert b.blocked is None  # exp_1 has no bool_map_search


def test_build_accepts_config_object():
    from qtos_tpu.config import get_experiment

    cfg = get_experiment("exp_2")
    b = build(cfg)
    assert b.exp is cfg


def test_heightfield_txt_roundtrip(tmp_path):
    t = make_terrain(["stairs"])
    p = str(tmp_path / "hf.txt")
    export_heightfield_txt(t, p)
    t2 = import_heightfield_txt(p, resolution=t.resolution, origin=t.origin)
    np.testing.assert_allclose(np.asarray(t2.height), np.asarray(t.height), atol=1e-5)

    # towr-frame variant: transposed, rows shifted down by one with a zero
    # first row, shape preserved (reference generateHeightField.py:568+616);
    # exact-transform check lives in tests/test_terrain_parity.py
    from qtos_tpu.terrain.tiles import load_tile_txt

    p2 = str(tmp_path / "hf_towr.txt")
    export_heightfield_txt(t, p2, towr_frame=True)
    g = load_tile_txt(p2)
    H, W = np.asarray(t.height).shape
    assert g.shape == (W, H)
    assert (g[0] == 0).all()
