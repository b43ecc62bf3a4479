"""IntentNetCNN: two-stream residual CNN backbone + detection/intention heads.

Reference: model_cnn.py:35-150 (IntentNet paper Fig 2c downsampling).
LiDAR stream 290 -> 160(s2) -> 192(s1) -> 224(s2); map stream
9 -> 32(s2) -> 64(s1) -> 96(s2); concat at 4x downsample; fusion
2 x BasicBlock(k=3) -> 512 at stride 2 => total stride 8.

Forward contract: (lidar_bev, map_bev) -> (cls_logits [B,N,1],
box_deltas [B,N,6], intent_logits [B,N,8]) with N = (H/8)*(W/8)*A.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..configs import CNNBackboneConfig, HeadConfig
from .blocks import ResidualStage, ensure_nhwc
from .heads import DetectionHead, IntentionHead, flatten_head_outputs


class CNNBackbone(nn.Module):
    cfg: CNNBackboneConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, lidar_bev: jnp.ndarray, map_bev: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        cfg = self.cfg

        def stream(x, planes, prefix):
            for i, (p, s) in enumerate(zip(planes, cfg.stage_strides)):
                x = ResidualStage(
                    planes=p,
                    num_blocks=cfg.num_blocks_per_stage,
                    stride=s,
                    kernel_size=cfg.stream_kernel_size,
                    dtype=self.dtype,
                    name=f"{prefix}_stage{i + 1}",
                )(x, train=train)
            return x

        l_feat = stream(lidar_bev, cfg.lidar_planes, "lidar")
        m_feat = stream(map_bev, cfg.map_planes, "map")
        fused = jnp.concatenate([l_feat, m_feat], axis=-1)
        return ResidualStage(
            planes=cfg.fusion_planes,
            num_blocks=cfg.fusion_layers,
            stride=cfg.fusion_stride,
            kernel_size=cfg.fusion_kernel_size,
            dtype=self.dtype,
            name="fusion",
        )(fused, train=train)


class IntentNetCNN(nn.Module):
    """Reference model_cnn.py:125-150."""

    cfg: CNNBackboneConfig
    head_cfg: HeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, lidar_bev: jnp.ndarray, map_bev: jnp.ndarray, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        lidar_bev = ensure_nhwc(lidar_bev, self.cfg.lidar_input_channels).astype(self.dtype)
        map_bev = ensure_nhwc(map_bev, self.cfg.map_input_channels).astype(self.dtype)

        features = CNNBackbone(self.cfg, dtype=self.dtype, name="backbone")(
            lidar_bev, map_bev, train=train
        )
        cls_logits, box_preds = DetectionHead(
            num_anchors=self.head_cfg.num_anchors,
            num_box_params=self.head_cfg.num_box_params,
            dtype=self.dtype,
            name="det_head",
        )(features)
        intent_logits = IntentionHead(
            num_anchors=self.head_cfg.num_anchors,
            num_classes=self.head_cfg.num_intention_classes,
            dtype=self.dtype,
            name="intention_head",
        )(features)
        cls_f, box_f, intent_f = flatten_head_outputs(cls_logits, box_preds, intent_logits)
        # logits return in f32 regardless of compute dtype (loss stability)
        return (
            cls_f.astype(jnp.float32),
            box_f.astype(jnp.float32),
            intent_f.astype(jnp.float32),
        )
