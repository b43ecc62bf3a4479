from .voxelize import pack_points, voxelize_numpy, voxelize_packed
from .rasterize import (
    MapElements,
    parse_map_json,
    rasterize_map_ego_centric,
)
from .augment import augment_bev, batched_augment_bev

__all__ = [
    "pack_points",
    "voxelize_numpy",
    "voxelize_packed",
    "MapElements",
    "parse_map_json",
    "rasterize_map_ego_centric",
    "augment_bev",
    "batched_augment_bev",
]
