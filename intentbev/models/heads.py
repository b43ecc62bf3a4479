"""Detection and intention heads (Flax, NHWC).

Output-ordering contract (reference heads.py:16-25 <-> utils.py:553-562):
flattened anchor index is ``((h * Wf + w) * A + a)``. In NHWC a single 3x3
conv producing A*(1+6) (resp. A*C) channels followed by
``reshape(B, Hf, Wf, A, P)`` -> ``reshape(B, Hf*Wf*A, P)`` realises exactly
that order — torch needs the explicit permute (heads.py:22), NHWC gets it
for free.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DetectionHead(nn.Module):
    """3x3 conv -> per-anchor (objectness, 6 box deltas). Reference heads.py:6-25."""

    num_anchors: int = 5
    num_box_params: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        p = 1 + self.num_box_params
        out = nn.Conv(
            self.num_anchors * p, (3, 3), padding="SAME", dtype=self.dtype, name="conv"
        )(x)
        b, hf, wf, _ = out.shape
        out = out.reshape(b, hf, wf, self.num_anchors, p)
        cls_logits = out[..., 0]
        box_preds = out[..., 1:]
        return cls_logits, box_preds


class IntentionHead(nn.Module):
    """3x3 conv -> per-anchor intention logits. Reference heads.py:27-43."""

    num_anchors: int = 5
    num_classes: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            dtype=self.dtype, name="conv",
        )(x)
        b, hf, wf, _ = out.shape
        return out.reshape(b, hf, wf, self.num_anchors, self.num_classes)


def flatten_head_outputs(
    cls_logits: jnp.ndarray, box_preds: jnp.ndarray, intent_logits: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B,Hf,Wf,A,·) -> (B, Hf*Wf*A, ·); reference model_cnn.py:145-150."""
    b = cls_logits.shape[0]
    return (
        cls_logits.reshape(b, -1, 1),
        box_preds.reshape(b, -1, box_preds.shape[-1]),
        intent_logits.reshape(b, -1, intent_logits.shape[-1]),
    )
