"""City-frame raster cache + warp vs direct ego rasterization."""

import numpy as np
import jax.numpy as jnp

from intentbev.configs import GridConfig
from intentbev.bev.rasterize import LaneSegment, MapElements, rasterize_map_ego_centric
from intentbev.bev.city_raster import (
    build_city_raster,
    warp_city_to_ego,
    warp_city_to_ego_device,
)

GRID = GridConfig(height_px=64, width_px=96, lidar_height_channels=4, lidar_sweeps=2)


def _elements():
    # dense boundary sampling: the direct path drops out-of-view boundary
    # points BEFORE building the polygon (reference utils.py:131-144), so
    # sparse boundaries truncate the fill near the view edge while the
    # city-warp keeps full coverage — agreement is measured away from that
    # intrinsic difference by sampling densely.
    xs = np.linspace(-30, 40, 140)
    lane = LaneSegment(
        left_boundary=np.stack([xs, np.full_like(xs, 3.0)], 1),
        right_boundary=np.stack([xs, np.full_like(xs, -3.0)], 1),
        is_intersection=False, lane_type="VEHICLE",
        left_mark_type="SOLID_YELLOW",
    )
    cw = np.array([[2.0, -4.0], [6.0, -4.0], [6.0, 4.0], [2.0, 4.0]])
    return MapElements(lanes=[lane], crosswalks=[cw])


def _iou(a, b):
    a = a > 0.5
    b = b > 0.5
    union = (a | b).sum()
    return 1.0 if union == 0 else (a & b).sum() / union


class TestCityRaster:
    def test_identity_pose_matches_direct(self):
        elements = _elements()
        city = build_city_raster(elements, GRID)
        pose = {"tx_m": 0.0, "ty_m": 0.0, "qx": 0, "qy": 0, "qz": 0, "qw": 1}
        direct = rasterize_map_ego_centric(elements, pose, GRID)
        warped = warp_city_to_ego(city, pose, GRID)
        # fill channels agree up to half-pixel boundary effects (the tiny
        # 64x96 grid has a large boundary fraction; full-res agreement is
        # higher)
        assert _iou(direct[..., 0], warped[..., 0]) > 0.9
        assert _iou(direct[..., 3], warped[..., 3]) > 0.85
        # polyline channel present in both
        assert warped[..., 8].sum() > 0 and direct[..., 8].sum() > 0

    def test_rotated_pose_fill_agreement(self):
        elements = _elements()
        city = build_city_raster(elements, GRID)
        yaw = 0.4
        pose = {"tx_m": 5.0, "ty_m": 1.0, "qx": 0, "qy": 0,
                "qz": np.sin(yaw / 2), "qw": np.cos(yaw / 2)}
        direct = rasterize_map_ego_centric(elements, pose, GRID)
        warped = warp_city_to_ego(city, pose, GRID)
        assert _iou(direct[..., 0], warped[..., 0]) > 0.88

    def test_device_warp_matches_host(self):
        elements = _elements()
        city = build_city_raster(elements, GRID)
        yaw = -0.3
        pose = {"tx_m": 2.0, "ty_m": -1.0, "qx": 0, "qy": 0,
                "qz": np.sin(yaw / 2), "qw": np.cos(yaw / 2)}
        host = warp_city_to_ego(city, pose, GRID)
        dev = np.asarray(warp_city_to_ego_device(
            jnp.asarray(city.raster), city.origin_xy,
            jnp.asarray([2.0, -1.0, yaw], dtype=jnp.float32), GRID))
        # identical sampling math up to float precision on the threshold edge
        assert (host != dev).mean() < 0.002

    def test_empty_map(self):
        city = build_city_raster(MapElements(), GRID)
        pose = {"tx_m": 0.0, "ty_m": 0.0, "qx": 0, "qy": 0, "qz": 0, "qw": 1}
        out = warp_city_to_ego(city, pose, GRID)
        assert out.shape == (64, 96, 9)
        assert out.sum() == 0
