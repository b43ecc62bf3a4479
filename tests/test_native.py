"""Native C++ host library vs numpy/JAX twins (skipped if not built)."""

import numpy as np
import pytest

from intentbev.utils.native import (
    NATIVE_AVAILABLE,
    fill_polygon_native,
    draw_polyline_native,
    rotated_iou_native,
    transform_points_native,
    voxelize_sweep_native,
)

pytestmark = pytest.mark.skipif(not NATIVE_AVAILABLE,
                                reason="cpp/libintentbev_host.so not built")


class TestNativeRaster:
    def test_fill_polygon_matches_numpy(self, rng):
        # fill_polygon = closed outline (host-side, both paths) + even-odd
        # fill (C++ when built, numpy scanline otherwise) — compare the
        # FULL fill_polygon with native dispatch on vs off (comparing raw
        # fill_polygon_native against it would miss the outline the
        # wrapper adds since the cv2-parity fix, rasterize.py fill_polygon)
        from intentbev.bev import rasterize as rz
        import intentbev.utils.native as nat

        assert nat.NATIVE_AVAILABLE
        for _ in range(5):
            pts = rng.uniform(3, 60, (rng.integers(3, 8), 2)).astype(np.int32)
            native = np.zeros((64, 64), np.uint8)
            rz.fill_polygon(native, pts)
            numpy_mask = np.zeros((64, 64), np.uint8)
            orig = nat.NATIVE_AVAILABLE
            try:
                nat.NATIVE_AVAILABLE = False
                rz.fill_polygon(numpy_mask, pts)
            finally:
                nat.NATIVE_AVAILABLE = orig
            np.testing.assert_array_equal(native, numpy_mask)

    def test_draw_polyline_matches_numpy(self):
        from intentbev.bev import rasterize as rz
        import intentbev.utils.native as nat

        pts = np.array([[3, 3], [40, 10], [50, 50], [10, 45]], np.int32)
        native = np.zeros((64, 64), np.uint8)
        assert draw_polyline_native(native, pts)
        numpy_mask = np.zeros((64, 64), np.uint8)
        orig = nat.NATIVE_AVAILABLE
        try:
            nat.NATIVE_AVAILABLE = False
            rz.draw_polyline(numpy_mask, pts)
        finally:
            nat.NATIVE_AVAILABLE = orig
        np.testing.assert_array_equal(native, numpy_mask)


class TestNativeTransform:
    def test_transform_points(self, rng):
        from intentbev.geometry import transform_points

        pts = rng.normal(0, 10, (500, 3))
        T = np.eye(4)
        th = 0.7
        T[:3, :3] = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        T[:3, 3] = [1.0, -2.0, 0.5]
        got = transform_points_native(pts, T)
        want = transform_points(pts, T).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestNativeVoxelize:
    def test_matches_numpy_voxelizer(self, rng):
        from intentbev.configs import GridConfig
        from intentbev.bev.voxelize import voxelize_numpy

        grid = GridConfig(height_px=64, width_px=96, lidar_height_channels=4,
                          lidar_sweeps=2)
        pts_list, int_list = [], []
        for _ in range(2):
            pts = np.stack([rng.uniform(-15, 10, 800), rng.uniform(-12, 12, 800),
                            rng.uniform(-3, 5, 800)], 1).astype(np.float32)
            pts_list.append(pts)
            int_list.append(rng.uniform(0, 255, 800).astype(np.float32))
        want = voxelize_numpy(pts_list, int_list, grid)

        bev = np.zeros((64, 96, 8), np.float32)
        for i in range(2):
            xyzi = np.concatenate([pts_list[i], int_list[i][:, None]], 1)
            assert voxelize_sweep_native(
                bev, xyzi, i, grid.lidar_height_channels, grid.voxel_size_m,
                grid.pixel_offset_x, grid.pixel_offset_y, grid.z_min, grid.z_max)
        np.testing.assert_allclose(bev, want, atol=1e-6)


class TestNativeRotatedIoU:
    def test_matches_device_kernel(self, rng):
        import jax.numpy as jnp
        from intentbev.boxes.iou import rotated_iou

        def mk(k):
            return np.stack([rng.uniform(-5, 5, k), rng.uniform(-5, 5, k),
                             rng.uniform(1, 4, k), rng.uniform(1, 8, k),
                             rng.uniform(-np.pi, np.pi, k)], 1).astype(np.float32)
        b1, b2 = mk(8), mk(6)
        got = rotated_iou_native(b1, b2)
        want = np.asarray(rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(got, want, atol=1e-4)
