"""Geometry primitives vs scipy oracles (quat/SE3 replace scipy Rotation)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from intentbev.geometry import (
    ego_centric_transform_matrix,
    quat_to_rotation_matrix,
    quat_to_yaw,
    se3_from_quat_translation,
    se3_inverse,
    transform_points,
    world_to_bev_pixel,
    wrap_angle,
)
from intentbev.configs import GridConfig


class TestQuaternions:
    def test_yaw_matches_scipy(self, rng):
        for _ in range(50):
            q = rng.normal(0, 1, 4)
            q /= np.linalg.norm(q)
            want = R.from_quat(q).as_euler("xyz")[2]
            got = quat_to_yaw(q[0], q[1], q[2], q[3])
            np.testing.assert_allclose(got, want, atol=1e-9)

    def test_rotation_matrix_matches_scipy(self, rng):
        for _ in range(20):
            q = rng.normal(0, 1, 4)
            q /= np.linalg.norm(q)
            np.testing.assert_allclose(
                quat_to_rotation_matrix(q), R.from_quat(q).as_matrix(), atol=1e-12)

    def test_unnormalised_quaternion(self, rng):
        q = rng.normal(0, 1, 4) * 3.7
        np.testing.assert_allclose(
            quat_to_rotation_matrix(q), R.from_quat(q / np.linalg.norm(q)).as_matrix(),
            atol=1e-12)

    def test_zero_quaternion_raises(self):
        with pytest.raises(ValueError):
            quat_to_rotation_matrix([0, 0, 0, 0])


class TestSE3:
    def test_inverse(self, rng):
        q = rng.normal(0, 1, 4)
        q /= np.linalg.norm(q)
        T = se3_from_quat_translation(q, rng.normal(0, 10, 3))
        np.testing.assert_allclose(se3_inverse(T) @ T, np.eye(4), atol=1e-12)

    def test_transform_points_matches_matmul(self, rng):
        q = rng.normal(0, 1, 4)
        q /= np.linalg.norm(q)
        T = se3_from_quat_translation(q, rng.normal(0, 5, 3))
        pts = rng.normal(0, 10, (100, 3))
        homo = np.concatenate([pts, np.ones((100, 1))], 1)
        want = (T @ homo.T).T[:, :3]
        np.testing.assert_allclose(transform_points(pts, T), want, atol=1e-10)

    def test_empty_points(self):
        out = transform_points(np.empty((0, 3)), np.eye(4))
        assert out.shape == (0, 3)


class TestBEVPixels:
    def test_world_to_bev_pixel_reference_formula(self):
        """Matches reference utils.py:47-60: ego (x fwd, y left) ->
        (col = ox + y/v, row = oy - x/v), rounded."""
        grid = GridConfig()
        tf = ego_centric_transform_matrix(np.array([0.0, 0.0]), 0.0)
        px = world_to_bev_pixel(np.array([[10.0, 2.0]]), tf, grid)
        np.testing.assert_array_equal(px, [[370, 250]])  # col=360+10, row=300-50

    def test_ego_rotation(self):
        grid = GridConfig()
        tf = ego_centric_transform_matrix(np.array([5.0, 5.0]), np.pi / 2)
        # world point 10,5 -> ego frame: rotated -90deg about (5,5): (0, -5)
        px = world_to_bev_pixel(np.array([[10.0, 5.0]]), tf, grid)
        np.testing.assert_array_equal(px, [[335, 300]])

    def test_wrap_angle(self):
        # atan2(sin, cos) semantics (reference utils.py:255): the sign of the
        # vanishing sine decides the +-pi branch
        np.testing.assert_allclose(abs(wrap_angle(3 * np.pi)), np.pi, atol=1e-12)
        np.testing.assert_allclose(abs(wrap_angle(-3 * np.pi)), np.pi, atol=1e-12)
        np.testing.assert_allclose(wrap_angle(0.3), 0.3, atol=1e-12)
        np.testing.assert_allclose(wrap_angle(2 * np.pi + 0.5), 0.5, atol=1e-12)
