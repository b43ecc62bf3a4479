"""Combined detection + intention loss with vectorised target assignment.

Semantics-parity rebuild of the reference ``DetectionIntentionLoss``
(loss.py:9-206), redesigned for XLA: the per-batch-item python loop
(loss.py:68) and the per-GT force-match loop (loss.py:101-105) become a
single vmapped, fixed-shape assignment over GT padded to ``max_gt_boxes``.
One jitted train step contains the whole loss; nothing bounces to host.

Assignment rules (loss.py:91-126):
- anchors x GT IoU (axis-aligned by default, heading ignored);
- max-IoU per anchor: < 0.45 -> negative (0), >= 0.6 -> positive (1),
  in between -> ignore (-1);
- force-match: each GT's best anchor becomes positive if its IoU with that
  GT clears 0.45 and the anchor is not already positive (the vectorised
  ``any`` over GT is equivalent to the reference's sequential loop because
  forcing is idempotent);
- every positive anchor regresses to and takes the intention of its own
  best-IoU GT (which may differ from the GT that forced it — deliberate
  reference behaviour, loss.py:108).

Loss terms (loss.py:140-188):
- sigmoid focal (alpha 0.25, gamma 2) on anchors with target >= 0, summed
  and divided by max(1, num_pos) over the whole batch;
- smooth-L1 (beta 1/9) on positive-anchor box deltas / max(1, num_pos);
- per-anchor CE on positive-anchor intentions with stochastic 85% drop of
  dominant classes {KEEP_LANE, PARKED, OTHER} and renormalisation by the
  kept count;
- total = 1.0*cls + 1.0*box + 0.5*intent; NaN/Inf guard zeroes the dict.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes.codec import encode_boxes
from .boxes.iou import axis_aligned_iou, rotated_iou
from .configs import LossConfig


class AnchorTargets(NamedTuple):
    cls_targets: jnp.ndarray     # i32[B, N]  in {-1, 0, 1}
    box_targets: jnp.ndarray     # f32[B, N, 6]
    intent_targets: jnp.ndarray  # i32[B, N]  class id or -1


def assign_targets_single(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_intentions: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: LossConfig,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Target assignment for one sample with padded GT.

    anchors f32[N, 5]; gt_boxes f32[G, 5]; gt_intentions i32[G];
    gt_valid bool[G].
    """
    n = anchors.shape[0]

    if cfg.use_rotated_iou:
        iou = rotated_iou(anchors, gt_boxes)
    else:
        iou = axis_aligned_iou(anchors[:, :4], gt_boxes[:, :4])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)  # padded GT never wins

    max_iou = jnp.max(iou, axis=1)            # f32[N]; -1 when no valid GT
    best_gt = jnp.argmax(iou, axis=1)         # i32[N]

    num_gt = jnp.sum(gt_valid.astype(jnp.int32))

    cls = jnp.full((n,), -1, dtype=jnp.int32)
    cls = jnp.where(max_iou < cfg.neg_iou_threshold, 0, cls)
    pos_by_thresh = max_iou >= cfg.iou_threshold
    cls = jnp.where(pos_by_thresh, 1, cls)

    # Force-match (loss.py:99-105): per GT, its best anchor.
    iou_gt_major = jnp.where(gt_valid[None, :], iou, -jnp.inf)
    best_anchor_per_gt = jnp.argmax(iou_gt_major, axis=0)  # i32[G]
    force_iou = jnp.take_along_axis(
        iou, best_anchor_per_gt[None, :], axis=0
    )[0]  # iou[best_anchor_per_gt[g], g]
    force_ok = gt_valid & (force_iou >= cfg.neg_iou_threshold)
    forced = (
        jnp.zeros((n,), dtype=bool)
        .at[best_anchor_per_gt]
        .max(force_ok)
    )
    forced = forced & ~pos_by_thresh
    cls = jnp.where(forced, 1, cls)

    pos = cls == 1
    # When num_gt == 0, everything is negative (loss.py:77-79); max_iou == -1
    # already drives that, but guard explicitly for clarity.
    cls = jnp.where(num_gt == 0, 0, cls)
    pos = pos & (num_gt > 0)

    assigned_boxes = gt_boxes[best_gt]         # f32[N, 5]
    assigned_intent = gt_intentions[best_gt]   # i32[N]

    box_targets = encode_boxes(assigned_boxes, anchors)
    box_targets = jnp.where(pos[:, None], box_targets, 0.0)
    intent_targets = jnp.where(pos, assigned_intent, -1).astype(jnp.int32)
    return cls, box_targets, intent_targets


def assign_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_intentions: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: LossConfig,
) -> AnchorTargets:
    """Batched assignment: gt_* have a leading batch dim."""
    cls, box, intent = jax.vmap(
        lambda b, i, v: assign_targets_single(anchors, b, i, v, cfg)
    )(gt_boxes, gt_intentions, gt_valid)
    return AnchorTargets(cls, box, intent)


def sigmoid_focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, alpha: float, gamma: float
) -> jnp.ndarray:
    """Elementwise sigmoid focal loss (torchvision semantics, loss.py:148-150)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1(diff: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Huber / smooth-L1 with threshold beta (torch F.smooth_l1_loss)."""
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-example categorical cross entropy with integer labels.

    Invalid labels (< 0) are clamped to 0; callers must mask the result.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.maximum(labels, 0)
    return -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]


def detection_intention_loss(
    cls_logits: jnp.ndarray,
    box_preds: jnp.ndarray,
    intent_logits: jnp.ndarray,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_intentions: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: LossConfig,
    rng: jax.Array,
    intention_class_weights: jnp.ndarray | None = None,
) -> dict:
    """Full batched loss. Shapes: cls [B,N,1], box [B,N,6], intent [B,N,C];
    anchors [N,5]; gt_boxes [B,G,5]; gt_intentions [B,G]; gt_valid [B,G].

    Returns {"loss", "cls_loss", "box_loss", "intent_loss",
    "num_pos_anchors"} (loss.py:200-206).
    """
    targets = assign_targets(anchors, gt_boxes, gt_intentions, gt_valid, cfg)

    cls_t = targets.cls_targets.reshape(-1)
    box_t = targets.box_targets.reshape(-1, 6)
    intent_t = targets.intent_targets.reshape(-1)

    cls_l = cls_logits.reshape(-1).astype(jnp.float32)
    box_p = box_preds.reshape(-1, 6).astype(jnp.float32)
    intent_l = intent_logits.reshape(-1, intent_logits.shape[-1]).astype(jnp.float32)

    valid_mask = cls_t >= 0
    pos_mask = cls_t == 1
    num_pos = jnp.sum(pos_mask.astype(jnp.float32))
    denom_pos = jnp.maximum(1.0, num_pos)

    # --- objectness focal loss (loss.py:140-151)
    focal = sigmoid_focal_loss(
        cls_l, cls_t.astype(jnp.float32), cfg.focal_loss_alpha, cfg.focal_loss_gamma
    )
    cls_loss = jnp.sum(jnp.where(valid_mask, focal, 0.0)) / denom_pos

    # --- box smooth-L1 (loss.py:153-159)
    box_terms = smooth_l1(box_p - box_t, cfg.smooth_l1_beta)
    box_loss = jnp.sum(jnp.where(pos_mask[:, None], box_terms, 0.0)) / denom_pos

    # --- intention CE with stochastic dominant-class drop (loss.py:161-184)
    ce = softmax_ce(intent_l, intent_t)
    if intention_class_weights is not None and not cfg.apply_intention_downsampling:
        w = intention_class_weights[jnp.maximum(intent_t, 0)]
        ce = ce * w
    if cfg.apply_intention_downsampling:
        keep_prob = 1.0 - cfg.intention_downsample_ratio
        dominant = jnp.zeros_like(intent_t, dtype=bool)
        for d in cfg.dominant_intentions:
            dominant = dominant | (intent_t == d)
        u = jax.random.uniform(rng, intent_t.shape)
        keep = jnp.where(dominant, u < keep_prob, True)
        mask = keep.astype(jnp.float32) * pos_mask.astype(jnp.float32)
        eff = jnp.sum(mask)
        intent_loss = jnp.sum(ce * mask) / jnp.maximum(1.0, eff)
    else:
        mask = pos_mask.astype(jnp.float32)
        intent_loss = jnp.sum(ce * mask) / jnp.maximum(1.0, jnp.sum(mask))
    intent_loss = jnp.where(num_pos > 0, intent_loss, 0.0)
    box_loss = jnp.where(num_pos > 0, box_loss, 0.0)

    total = (
        cfg.cls_weight * cls_loss
        + cfg.box_weight * box_loss
        + cfg.intent_weight * intent_loss
    )

    # NaN/Inf containment (loss.py:190-198): zero the whole dict.
    bad = ~jnp.isfinite(total)
    zero = jnp.zeros_like(total)
    return {
        "loss": jnp.where(bad, zero, total),
        "cls_loss": jnp.where(bad, zero, cls_loss),
        "box_loss": jnp.where(bad, zero, box_loss),
        "intent_loss": jnp.where(bad, zero, intent_loss),
        "num_pos_anchors": num_pos,
    }


def pad_gt(
    boxes_list, intentions_list, max_gt: int
):
    """Host-side helper: ragged per-sample GT -> padded batch arrays.

    Replaces the reference's ragged ``gt_list`` (dataset.py:137-150) at the
    device boundary. Returns (boxes f32[B,G,5], intents i32[B,G],
    valid bool[B,G]) numpy arrays.
    """
    import numpy as np

    b = len(boxes_list)
    boxes = np.zeros((b, max_gt, 5), dtype=np.float32)
    intents = np.zeros((b, max_gt), dtype=np.int32)
    valid = np.zeros((b, max_gt), dtype=bool)
    for i, (bx, it) in enumerate(zip(boxes_list, intentions_list)):
        k = min(len(bx), max_gt)
        if k:
            boxes[i, :k] = np.asarray(bx, dtype=np.float32)[:k]
            intents[i, :k] = np.asarray(it, dtype=np.int32)[:k]
            valid[i, :k] = True
    return boxes, intents, valid
