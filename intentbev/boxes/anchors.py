"""Anchor grid generation.

Load-bearing contract (reference utils.py:519-562 <-> heads.py:22): the
flattened anchor index is location-major / anchor-minor,
``idx = ((h * Wf + w) * A + a)``, matching the head reshape order
(B, Hf, Wf, A, params) -> (B, Hf*Wf*A, params).

Anchors live in ego-centric metric coordinates (cx, cy, w, l, yaw).
Cell centres: pixel centre of each stride-sized cell mapped through the
pixel->ego transform (reference utils.py:535-539).
"""

from __future__ import annotations

import numpy as np

from ..configs import AnchorGridConfig, GridConfig


def generate_anchors(
    grid: GridConfig,
    anchor_cfg: AnchorGridConfig,
) -> np.ndarray:
    """Returns f32[(Hf*Wf*A), 5] anchors = (cx, cy, w, l, yaw), interleaved.

    Numpy (host, computed once per run); callers move it to device.
    Reference: utils.py:519-562 (the interleaved layout at utils.py:553-562
    is the one actually returned; the earlier block is dead code).
    """
    stride = anchor_cfg.stride
    fh = grid.height_px // stride
    fw = grid.width_px // stride

    gy, gx = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
    center_px_x = gx * stride + stride / 2.0  # column
    center_px_y = gy * stride + stride / 2.0  # row

    # pixel -> ego metric (reference utils.py:538-539)
    center_ego_y = (center_px_x - grid.pixel_offset_x) * grid.voxel_size_m
    center_ego_x = (grid.pixel_offset_y - center_px_y) * grid.voxel_size_m

    centers = np.stack([center_ego_x, center_ego_y], axis=-1).reshape(-1, 2)  # [L, 2]
    shapes = np.asarray(anchor_cfg.anchor_shapes, dtype=np.float32)  # [A, 3]

    L, A = centers.shape[0], shapes.shape[0]
    anchors = np.concatenate(
        [
            np.broadcast_to(centers[:, None, :], (L, A, 2)),
            np.broadcast_to(shapes[None, :, :], (L, A, 3)),
        ],
        axis=-1,
    )  # [L, A, 5], location-major
    return anchors.reshape(L * A, 5).astype(np.float32)
