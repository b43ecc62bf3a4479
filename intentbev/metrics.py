"""Detection AP and intention metrics, computed on device with fixed shapes.

Metric *definitions* are the parity target and match the reference exactly
(see SURVEY.md §6 caveat):

- AP is per-sample PASCAL-VOC AP averaged over samples — NOT COCO global
  ranking (reference eval_cnn.py:199-256).
- Edge rules: no preds -> AP 1.0 if no GT else 0.0; no GT (with preds) -> 0.0
  (eval_cnn.py:217-223).
- Matching is greedy in descending score order; each prediction matches its
  single best-IoU GT; a GT can be matched once (eval_cnn.py:236-244).
- Intention metrics (accuracy / macro-F1 / weighted-F1 / per-class F1) are
  computed only over TP detections matched at IoU >= 0.5
  (eval_cnn.py:259-322).

The host variant ``calculate_ap_np`` is a line-for-line semantic port of
reference utils.py:564-575 and doubles as the test oracle for the on-device
version.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .boxes.iou import axis_aligned_iou, rotated_iou


def calculate_ap_np(recall: np.ndarray, precision: np.ndarray) -> float:
    """VOC-style AP from recall/precision step arrays (utils.py:564-575)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def _voc_ap_fixed(recall: jnp.ndarray, precision: jnp.ndarray) -> jnp.ndarray:
    """VOC AP over fixed-size recall/precision arrays (invalid tail entries
    must carry recall == final recall and precision == 0, which contribute
    nothing to the integral)."""
    n = recall.shape[0]
    mrec = jnp.concatenate([jnp.zeros((1,)), recall, jnp.ones((1,))])
    mpre = jnp.concatenate([jnp.zeros((1,)), precision, jnp.zeros((1,))])
    # precision envelope: running max from the right
    mpre = jax.lax.associative_scan(jnp.maximum, mpre[::-1])[::-1]
    diffs = mrec[1:] - mrec[:-1]
    return jnp.sum(diffs * mpre[1:])


class SampleAP(NamedTuple):
    ap: jnp.ndarray            # f32[num_iou_thresholds]
    tp_flags: jnp.ndarray      # bool[num_iou_thresholds, max_pred]
    matched_gt: jnp.ndarray    # i32[num_iou_thresholds, max_pred] (-1 = none)


def greedy_match(
    iou_matrix: jnp.ndarray,
    pred_valid: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_threshold: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy score-order matching (predictions assumed pre-sorted by score).

    Each prediction looks only at its own best-IoU GT; if that IoU clears the
    threshold and the GT is unmatched, the prediction is a TP
    (eval_cnn.py:236-244 — including the quirk that a prediction whose best
    GT is already matched is NOT given a second-best GT).

    Returns (tp_flags bool[P], matched_gt_idx i32[P] with -1 for non-TP).

    Closed form, no sequential loop: each prediction's candidate GT (its
    argmax row) is FIXED before any matching happens, so the only
    order-dependence is "was my GT taken by an earlier prediction" — and
    the earlier prediction that takes GT g is exactly the lowest-index
    eligible prediction whose argmax is g. One scatter-min over
    prediction indices computes that for every GT at once; the former
    fori_loop formulation (r3) serialized P iterations per IoU threshold
    for the same result.
    """
    num_pred, num_gt = iou_matrix.shape
    if num_gt == 0:
        return (jnp.zeros((num_pred,), dtype=bool),
                jnp.full((num_pred,), -1, dtype=jnp.int32))
    iou_masked = jnp.where(gt_valid[None, :], iou_matrix, -1.0)

    idx = jnp.arange(num_pred, dtype=jnp.int32)
    best_gt = jnp.argmax(iou_masked, axis=1)
    best_iou = jnp.take_along_axis(iou_masked, best_gt[:, None], axis=1)[:, 0]
    eligible = pred_valid & (best_iou >= iou_threshold)
    first_idx = jnp.full((num_gt,), num_pred, dtype=jnp.int32).at[best_gt].min(
        jnp.where(eligible, idx, num_pred)
    )
    tp = eligible & (first_idx[best_gt] == idx)
    match_idx = jnp.where(tp, best_gt, -1).astype(jnp.int32)
    return tp, match_idx


def sample_average_precision(
    pred_boxes: jnp.ndarray,
    pred_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9),
    use_rotated_iou: bool = False,
) -> SampleAP:
    """Per-sample AP at several IoU thresholds, fully on device.

    ``pred_boxes`` f32[P, 5] must already be sorted by descending score with
    ``pred_valid`` marking real detections; ``gt_boxes`` f32[G, 5] padded with
    ``gt_valid``.
    """
    num_pred = pred_boxes.shape[0]
    num_gt_valid = jnp.sum(gt_valid.astype(jnp.int32))
    num_pred_valid = jnp.sum(pred_valid.astype(jnp.int32))

    if use_rotated_iou:
        iou = rotated_iou(pred_boxes, gt_boxes)
    else:
        iou = axis_aligned_iou(pred_boxes[:, :4], gt_boxes[:, :4])

    def ap_at(thresh: float):
        tp, match_idx = greedy_match(iou, pred_valid, gt_valid, thresh)
        tp = tp & pred_valid
        tp_cum = jnp.cumsum(tp.astype(jnp.float32))
        rank = jnp.arange(1, num_pred + 1, dtype=jnp.float32)
        recall = tp_cum / (num_gt_valid.astype(jnp.float32) + 1e-9)
        precision = tp_cum / (rank + 1e-9)
        # Fixed-size tail handling: invalid prediction slots replicate the
        # final recall and carry zero precision (no effect on the integral).
        final_recall = jnp.where(num_pred_valid > 0, recall[jnp.maximum(num_pred_valid - 1, 0)], 0.0)
        recall = jnp.where(pred_valid, recall, final_recall)
        precision = jnp.where(pred_valid, precision, 0.0)
        ap = _voc_ap_fixed(recall, precision)
        # Edge rules (eval_cnn.py:217-223).
        ap = jnp.where(
            num_pred_valid == 0,
            jnp.where(num_gt_valid == 0, 1.0, 0.0),
            jnp.where(num_gt_valid == 0, 0.0, ap),
        )
        return ap, tp, match_idx

    aps, tps, matches = [], [], []
    for t in iou_thresholds:
        ap, tp, match_idx = ap_at(float(t))
        aps.append(ap)
        tps.append(tp)
        matches.append(match_idx)
    return SampleAP(
        ap=jnp.stack(aps),
        tp_flags=jnp.stack(tps),
        matched_gt=jnp.stack(matches),
    )


def match_intentions(
    pred_boxes: jnp.ndarray,
    pred_valid: jnp.ndarray,
    pred_intentions: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_intentions: jnp.ndarray,
    iou_threshold: float = 0.5,
    use_rotated_iou: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """TP-matched (pred_intent, gt_intent) pairs for intention metrics.

    Matching semantics as eval_cnn.py:271-302 (greedy, score order, one GT
    per prediction). Returns fixed-size (pred_intent i32[P], gt_intent
    i32[P], pair_valid bool[P]).
    """
    if use_rotated_iou:
        iou = rotated_iou(pred_boxes, gt_boxes)
    else:
        iou = axis_aligned_iou(pred_boxes[:, :4], gt_boxes[:, :4])
    tp, match_idx = greedy_match(iou, pred_valid, gt_valid, iou_threshold)
    pair_valid = tp & pred_valid
    matched_gt_intent = jnp.where(
        pair_valid, gt_intentions[jnp.maximum(match_idx, 0)], -1
    ).astype(jnp.int32)
    return pred_intentions.astype(jnp.int32), matched_gt_intent, pair_valid


class IntentionConfusion(NamedTuple):
    """Streaming confusion-matrix accumulator for intention metrics.

    Sharded-reduction friendly: per-batch updates are pure adds, so under DP
    eval the matrix can be ``psum``-reduced over the mesh before the final
    scalar metrics are derived (SURVEY.md §2.2 'on-device eval collectives').
    """

    matrix: jnp.ndarray  # i32[C, C] rows = GT class, cols = predicted class

    @staticmethod
    def zeros(num_classes: int) -> "IntentionConfusion":
        return IntentionConfusion(jnp.zeros((num_classes, num_classes), dtype=jnp.int32))

    def update(
        self, pred_intent: jnp.ndarray, gt_intent: jnp.ndarray, pair_valid: jnp.ndarray
    ) -> "IntentionConfusion":
        c = self.matrix.shape[0]
        flat = jnp.where(pair_valid, gt_intent * c + pred_intent, c * c)
        counts = jnp.zeros((c * c + 1,), dtype=jnp.int32).at[flat].add(1)
        return IntentionConfusion(self.matrix + counts[: c * c].reshape(c, c))


def confusion_to_metrics(matrix: jnp.ndarray) -> dict:
    """accuracy / macro-F1 / weighted-F1 / per-class F1 from a confusion matrix.

    Definitions identical to sklearn's with ``zero_division=0``
    (eval_cnn.py:309-318).
    """
    m = matrix.astype(jnp.float32)
    total = jnp.sum(m)
    correct = jnp.trace(m)
    accuracy = jnp.where(total > 0, correct / total, 0.0)

    tp = jnp.diag(m)
    fp = jnp.sum(m, axis=0) - tp
    fn = jnp.sum(m, axis=1) - tp
    denom = 2 * tp + fp + fn
    f1 = jnp.where(denom > 0, 2 * tp / jnp.where(denom == 0, 1.0, denom), 0.0)

    support = jnp.sum(m, axis=1)
    macro_f1 = jnp.mean(f1)
    weighted_f1 = jnp.where(total > 0, jnp.sum(f1 * support) / jnp.where(total == 0, 1.0, total), 0.0)
    return {
        "accuracy": accuracy,
        "macro_f1": macro_f1,
        "weighted_f1": weighted_f1,
        "per_class_f1": f1,
        "support": support,
    }
