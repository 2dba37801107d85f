"""Host-side containers + GUI camera-state unit tests (reference:
QTOS/containers.py, QTOS/pybulletInterface.py)."""

import numpy as np
import pytest

from qtos_tpu.sim.pybullet_ui import CameraState, DebugCommand
from qtos_tpu.utils.containers import FIFOQueue, Limited_Stack, LimitedFIFOQueue, LimitedStack


def test_limited_fifo_window_average():
    q = LimitedFIFOQueue(max_size=3)
    assert q.average() == 0.0
    for v in [1.0, 2.0, 3.0]:
        q.enqueue(v)
    assert q.average() == pytest.approx(2.0)
    q.enqueue(4.0)  # evicts 1.0
    assert len(q) == 3
    assert q.average() == pytest.approx(3.0)
    assert q.dequeue() == 2.0


def test_fifo_queue_order_and_empty():
    q = FIFOQueue()
    assert q.is_empty()
    q.enqueue("a")
    q.enqueue("b")
    assert q.size() == 2
    assert q.dequeue() == "a"
    assert q.dequeue() == "b"
    with pytest.raises(IndexError):
        q.dequeue()


def test_limited_stack_plan_pairs():
    s = LimitedStack(max_size=2)
    s.push((np.array([0.0, 0.0, 0.24]), np.array([1.0, 0.0, 0.24])))
    s.push(([1.0, 0.0, 0.24], [2.0, 0.0, 0.24]))
    s.push(([2.0, 0.0, 0.24], [3.0, 0.0, 0.24]))  # evicts the first
    assert s.size() == 2
    start, goal = s.peek()
    assert goal == [3.0, 0.0, 0.24]
    assert isinstance(s.pop()[0], list)  # arrays normalized to lists
    s.clear()
    assert s.is_empty()
    with pytest.raises(IndexError):
        s.peek()
    assert Limited_Stack is LimitedStack


def test_camera_state_keyboard_bindings():
    cam = CameraState()
    # A/D yaw, Q/E pitch, Z/X dolly — reference QTOS/pybulletInterface.py:81-96
    assert not cam.apply_keys({100: 1})
    assert cam.yaw == 46.0
    cam.apply_keys({97: 1, 113: 1, 101: 1})
    assert cam.yaw == 45.0 and cam.pitch == -30.0
    cam.apply_keys({122: 1})
    assert cam.distance == pytest.approx(1.24)
    cam.apply_keys({120: 1})
    assert cam.distance == pytest.approx(1.25)
    assert cam.apply_keys({27: 1})  # ESC requests disconnect


def test_debug_command_defaults():
    cmd = DebugCommand()
    assert cmd.pos.shape == (3,) and cmd.step_period == 2.0
