from typing import Any

import jax.numpy as jnp

from ..configs import ExperimentConfig
from .blocks import BasicBlock, ResidualStage, ensure_nhwc
from .cnn import CNNBackbone, IntentNetCNN
from .heads import DetectionHead, IntentionHead, flatten_head_outputs
from .vit import IntentNetViT, TwoStreamViTBackbone, ViTEncoder

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(cfg: ExperimentConfig, *, train_mode: bool = False) -> Any:
    """Instantiate the configured model family (reference entry scripts pick
    IntentNetCNN vs IntentNetViT; train_cnn.py:36-40, train_vit.py:33-50)."""
    dtype = _DTYPES[cfg.train.compute_dtype] if train_mode else jnp.float32
    if cfg.model_family == "cnn":
        return IntentNetCNN(cfg.cnn, cfg.heads, dtype=dtype)
    if cfg.model_family == "vit":
        return IntentNetViT(
            cfg.vit, cfg.heads,
            remat=cfg.train.remat_vit_blocks and train_mode,
            dtype=dtype,
        )
    raise ValueError(f"unknown model family {cfg.model_family!r}")


__all__ = [
    "BasicBlock", "ResidualStage", "ensure_nhwc",
    "CNNBackbone", "IntentNetCNN",
    "DetectionHead", "IntentionHead", "flatten_head_outputs",
    "IntentNetViT", "TwoStreamViTBackbone", "ViTEncoder",
    "build_model",
]
