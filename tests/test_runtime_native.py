"""Native runtime (C++ A* + ring buffer) vs python reference semantics."""

import numpy as np
import pytest

from qtos_tpu.planner.astar import astar
from qtos_tpu.runtime import RingBuffer, native_astar, native_available


def test_native_builds():
    assert native_available(), "g++ toolchain present in image; native build must succeed"


def test_native_astar_matches_python():
    rng = np.random.default_rng(0)
    for trial in range(5):
        blocked = rng.random((15, 25)) < 0.25
        blocked[2, 2] = blocked[12, 22] = False
        p_py = astar(blocked, (2, 2), (12, 22))
        p_cc = native_astar(blocked, (2, 2), (12, 22))
        if p_py is None:
            assert p_cc is None
        else:
            assert p_cc is not None
            # both optimal: same cost
            def cost(p):
                d = np.abs(np.diff(p, axis=0))
                return float(np.where(d.sum(1) == 2, 1.41421, 1.0).sum())

            assert abs(cost(p_py) - cost(p_cc)) < 1e-3
            assert tuple(p_cc[0]) == (2, 2) and tuple(p_cc[-1]) == (12, 22)


def test_native_astar_unreachable():
    blocked = np.zeros((5, 5), bool)
    blocked[:, 2] = True
    assert native_astar(blocked, (2, 0), (2, 4)) is None


def test_ringbuffer_stitch_read_contact():
    rb = RingBuffer(capacity=100)
    rows = np.arange(20 * 37, dtype=np.float32).reshape(20, 37)
    contact = np.ones((20, 4), np.float32)
    contact[5:15] = 0.0
    assert rb.stitch(0, rows, contact) == 20
    assert rb.end == 20
    np.testing.assert_allclose(rb.read(3, 4), rows[3:7])
    assert rb.find_contact_row(0) == 0
    assert rb.find_contact_row(5) == 15
    # stitch a replacement segment at row 10: truncates + appends
    rows2 = np.zeros((8, 37), np.float32)
    c2 = np.ones((8, 4), np.float32)
    assert rb.stitch(10, rows2, c2) == 18
    assert rb.end == 18
    np.testing.assert_allclose(rb.read(10, 8), rows2)
    assert rb.find_contact_row(5) == 10


def test_ringbuffer_bounds():
    rb = RingBuffer(capacity=10)
    with pytest.raises(ValueError):
        rb.stitch(0, np.zeros((11, 37), np.float32), np.zeros((11, 4), np.float32))
    with pytest.raises(ValueError):
        rb.stitch(5, np.zeros((2, 37), np.float32), np.zeros((2, 4), np.float32))  # beyond end
