import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.terrain import Terrain, grad_at, height_at, make_terrain, tile
from qtos_tpu.terrain.heightfield import traversability_map
from qtos_tpu.terrain.tiles import TILE_GENERATORS, load_tile_txt, save_tile_txt


def test_tiles_exist_and_shapes():
    for name in ["plane", "step", "step_1", "stairs", "wall_1", "random_terrain", "bridge"]:
        t = tile(name)
        assert t.shape == (20, 20)
        assert np.isfinite(t).all()


def test_plane_height_zero():
    terr = make_terrain(["plane", "plane", "plane"])
    assert terr.height.shape == (20, 60)
    xs = jnp.linspace(-0.9, 4.9, 32)
    ys = jnp.zeros(32)
    h = height_at(terr, xs, ys)
    np.testing.assert_allclose(np.asarray(h), 0.0, atol=1e-6)


def test_step_height_and_extent():
    terr = make_terrain(["step"])
    x0, y0, x1, y1 = terr.extent
    assert (x0, y0, x1, y1) == (-1.0, -1.0, 1.0, 1.0)
    # the reference's step.txt raises rows 13..19 (y in [0.3, 1.0]) to 0.13
    # (vendored geometry — see tests/test_terrain_parity.py)
    h_on = height_at(terr, jnp.array(0.2), jnp.array(0.65))
    h_off = height_at(terr, jnp.array(0.2), jnp.array(-0.5))
    assert float(h_on) == np.float32(0.13)
    assert float(h_off) == 0.0


def test_bilinear_gradient_matches_autodiff():
    terr = make_terrain(["random_terrain"])
    f = lambda xy: height_at(terr, xy[0], xy[1])
    g_auto = jax.grad(f)(jnp.array([0.33, -0.21]))
    gx, gy = grad_at(terr, jnp.array(0.33), jnp.array(-0.21))
    np.testing.assert_allclose(float(g_auto[0]), float(gx), atol=1e-4)
    np.testing.assert_allclose(float(g_auto[1]), float(gy), atol=1e-4)


def test_scale_factor_preserves_extent():
    t1 = make_terrain(["stairs"], scale_factor=1)
    t4 = make_terrain(["stairs"], scale_factor=4)
    assert t4.height.shape == (80, 80)
    assert t1.extent == t4.extent
    h1 = height_at(t1, jnp.array(0.55), jnp.array(0.1))
    h4 = height_at(t4, jnp.array(0.55), jnp.array(0.1))
    np.testing.assert_allclose(float(h1), float(h4), atol=0.06)


def test_txt_roundtrip(tmp_path):
    t = tile("step_2")
    p = str(tmp_path / "tile.txt")
    save_tile_txt(p, t)
    back = load_tile_txt(p)
    np.testing.assert_allclose(back, t)


def test_reference_txt_format_compatible():
    """Our loader parses the reference's on-disk tiles when present."""
    import os

    path = "/root/reference/data/heightfields/plane.txt"
    if not os.path.exists(path):
        return
    arr = load_tile_txt(path)
    assert arr.shape == (20, 20)
    assert float(arr.max()) == 0.0


def test_traversability_map_flags_walls():
    terr = make_terrain(["wall_1"])
    bmap = np.asarray(traversability_map(terr, height_bound=0.2))
    assert bmap.max() == 1.0  # wall edges flagged
    terr2 = make_terrain(["plane"])
    assert np.asarray(traversability_map(terr2)).max() == 0.0


def test_height_query_is_jittable_and_batched():
    terr = make_terrain(["climb_2"])
    f = jax.jit(lambda xy: height_at(terr, xy[..., 0], xy[..., 1]))
    out = f(jnp.zeros((8, 16, 2)))
    assert out.shape == (8, 16)
