"""Golden tests for the map<->world coordinate-transform chain.

The reference spreads these transforms across trajectory_2d_to_3d.py,
collision_detector.py and object_based_success.py; metric parity depends on the
chain being reproduced exactly, so these tests pin the algebra.
"""

import math

import numpy as np
import pytest

from sage3d_tpu.utils import transforms as T

BOUNDS = (-3.25, 7.75, -2.0, 11.5)  # (min_x, max_x, min_y, max_y)


def test_map_world_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 12, size=(100, 2))
    wx, wy = T.map_to_world_xy(pts[:, 0], pts[:, 1], BOUNDS)
    mx, my = T.world_to_map_xy(wx, wy, BOUNDS)
    np.testing.assert_allclose(mx, pts[:, 0], atol=1e-12)
    np.testing.assert_allclose(my, pts[:, 1], atol=1e-12)


def test_map_to_world_matches_reference_chain():
    # Reference chain: mirror about bounds then negate (trajectory_2d_to_3d.py:33-63).
    px, py = 1.0, 2.0
    min_x, max_x, min_y, max_y = BOUNDS
    exp_x = -((min_x + max_x) - px)
    exp_y = -((min_y + max_y) - py)
    wx, wy = T.map_to_world_xy(px, py, BOUNDS)
    assert wx == pytest.approx(exp_x)
    assert wy == pytest.approx(exp_y)


def test_world_to_map_matches_collision_detector_order():
    # collision_detector.py:146-189: negate FIRST, then mirror.
    wx, wy = -4.0, 3.5
    min_x, max_x, min_y, max_y = BOUNDS
    exp_x = (min_x + max_x) - (-wx)
    exp_y = (min_y + max_y) - (-wy)
    mx, my = T.world_to_map_xy(wx, wy, BOUNDS)
    assert mx == pytest.approx(exp_x)
    assert my == pytest.approx(exp_y)


def test_yaw_quaternion_roundtrip():
    for yaw in np.linspace(-math.pi + 1e-6, math.pi, 17):
        q = T.quaternion_from_yaw_xyzw(yaw)
        back = T.yaw_from_quaternion_xyzw(*q)
        assert back == pytest.approx(yaw, abs=1e-10)


def test_world_quat_roundtrip_decodes_original_yaw():
    # Generation applies yaw+pi and the z->-x remap; the env decode
    # (simple_env.py:1164-1182) must recover the original map yaw.
    for yaw in np.linspace(-math.pi + 0.01, math.pi - 0.01, 23):
        q = T.world_quat_from_map_yaw(yaw)
        decoded = T.yaw_from_world_quat(*q)
        assert decoded == pytest.approx(yaw, abs=1e-9), yaw


def test_world_quat_layout():
    # Only x and w components are populated (trajectory_2d_to_3d.py:165-171).
    q = T.world_quat_from_map_yaw(0.7)
    assert q[1] == 0.0 and q[2] == 0.0
    yaw_new = 0.7 + math.pi - 2 * math.pi
    assert q[0] == pytest.approx(-math.sin(yaw_new / 2))
    assert q[3] == pytest.approx(math.cos(yaw_new / 2))


def test_world_pixel_roundtrip():
    py, px = T.world_to_pixel(1.234, 5.678, min_x=-3.25, min_y=-2.0, scale=0.05)
    x, y = T.pixel_to_world(px, py, min_x=-3.25, min_y=-2.0, scale=0.05)
    # pixel centers are within half a pixel of the query
    assert abs(x - 1.234) <= 0.05
    assert abs(y - 5.678) <= 0.05


def test_world_to_pixel_rounds_to_nearest():
    # collision_detector.py:134-138 uses round(), not floor.
    py, px = T.world_to_pixel(0.026, 0.0, min_x=0.0, min_y=0.0, scale=0.05)
    assert px == 1  # 0.026/0.05 = 0.52 -> 1
    py, px = T.world_to_pixel(0.024, 0.0, min_x=0.0, min_y=0.0, scale=0.05)
    assert px == 0
