"""Unit tests for anchors, box codec, IoU, NMS against independent oracles."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intentbev.configs import AnchorGridConfig, GridConfig
from intentbev.boxes import (
    axis_aligned_iou,
    box_corners,
    decode_boxes,
    encode_boxes,
    generate_anchors,
    greedy_nms_mask,
    postprocess_detections,
    rotated_iou,
)


# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------

class TestAnchors:
    def test_shape_and_layout_contract(self):
        grid = GridConfig()
        cfg = AnchorGridConfig()
        anchors = generate_anchors(grid, cfg)
        fh, fw, A = 400 // 8, 720 // 8, 5
        assert anchors.shape == (fh * fw * A, 5)
        # location-major / anchor-minor: consecutive A rows share a centre
        loc0 = anchors[:A]
        np.testing.assert_allclose(loc0[:, 0], loc0[0, 0])
        np.testing.assert_allclose(loc0[:, 1], loc0[0, 1])
        # the A shapes at each location are the configured (w, l, yaw)
        np.testing.assert_allclose(loc0[:, 2:], np.asarray(cfg.anchor_shapes), atol=1e-6)

    def test_centre_math_matches_reference_formula(self):
        # Reference utils.py:535-539: cell (h, w) centre pixel -> ego metric.
        grid = GridConfig()
        cfg = AnchorGridConfig()
        anchors = generate_anchors(grid, cfg)
        fh, fw, A = 50, 90, 5
        for (h, w) in [(0, 0), (10, 33), (49, 89)]:
            cpx = w * 8 + 4.0
            cpy = h * 8 + 4.0
            ego_y = (cpx - 360.0) * 0.2
            ego_x = (300.0 - cpy) * 0.2
            row = anchors[(h * fw + w) * A]
            np.testing.assert_allclose(row[:2], [ego_x, ego_y], atol=1e-5)

    def test_ego_origin_cell(self):
        # ego sits at pixel (row 300, col 360); the cell containing it has a
        # small positive offset from the centre convention
        grid = GridConfig()
        anchors = generate_anchors(grid, AnchorGridConfig())
        # cell h=37 (rows 296-303), w=45 (cols 360-367): centre (300, 364)
        row = anchors[(37 * 90 + 45) * 5]
        np.testing.assert_allclose(row[:2], [0.0, 0.8], atol=1e-5)


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------

class TestCodec:
    def _random_boxes(self, rng, n):
        boxes = np.stack(
            [
                rng.uniform(-20, 60, n),
                rng.uniform(-70, 70, n),
                rng.uniform(1.0, 5.0, n),
                rng.uniform(2.0, 10.0, n),
                rng.uniform(-np.pi, np.pi, n),
            ],
            axis=1,
        ).astype(np.float32)
        return boxes

    def test_roundtrip(self, rng):
        gt = self._random_boxes(rng, 64)
        anchors = self._random_boxes(rng, 64)
        deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
        rec = np.asarray(decode_boxes(deltas, jnp.asarray(anchors)))
        np.testing.assert_allclose(rec[:, :2], gt[:, :2], atol=1e-3)
        np.testing.assert_allclose(rec[:, 2:4], gt[:, 2:4], rtol=1e-3)
        # heading recovered modulo wrap
        dh = np.arctan2(np.sin(rec[:, 4] - gt[:, 4]), np.cos(rec[:, 4] - gt[:, 4]))
        np.testing.assert_allclose(dh, 0.0, atol=1e-3)

    def test_decode_formula_asymmetric_scaling(self):
        # Parity with utils.py:248-249: dx scaled by anchor *width*, dy by
        # anchor *length*.
        anchor = jnp.array([[10.0, 5.0, 2.0, 4.0, 0.0]])
        deltas = jnp.array([[1.0, 1.0, 0.0, 0.0, 0.0, 1.0]])
        out = np.asarray(decode_boxes(deltas, anchor))[0]
        np.testing.assert_allclose(out, [12.0, 9.0, 2.0, 4.0, 0.0], atol=1e-5)

    def test_decode_heading_wrap(self):
        anchor = jnp.array([[0.0, 0.0, 1.0, 1.0, 3.0]])
        # d_heading = atan2(sin, cos) of delta ~ 0.5 -> total 3.5 wraps to 3.5-2pi
        deltas = jnp.array([[0.0, 0.0, 0.0, 0.0, np.sin(0.5), np.cos(0.5)]])
        out = np.asarray(decode_boxes(deltas, anchor))[0]
        expected = np.arctan2(np.sin(3.5), np.cos(3.5))
        np.testing.assert_allclose(out[4], expected, atol=1e-5)


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------

def _np_axis_aligned_iou(b1, b2):
    """Brute-force numpy oracle for (cx, cy, w, h) IoU."""
    out = np.zeros((len(b1), len(b2)))
    for i, a in enumerate(b1):
        for j, b in enumerate(b2):
            ax1, ay1, ax2, ay2 = a[0] - a[2] / 2, a[1] - a[3] / 2, a[0] + a[2] / 2, a[1] + a[3] / 2
            bx1, by1, bx2, by2 = b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0.0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            union = a[2] * a[3] + b[2] * b[3] - inter
            out[i, j] = inter / (union + 1e-7)
    return out


def _cv2_rotated_iou(boxes1, boxes2):
    """Oracle: rotated IoU via cv2 convex polygon intersection."""
    c1 = np.asarray(box_corners(jnp.asarray(boxes1)), dtype=np.float32)
    c2 = np.asarray(box_corners(jnp.asarray(boxes2)), dtype=np.float32)
    out = np.zeros((len(boxes1), len(boxes2)), dtype=np.float32)
    for i in range(len(boxes1)):
        for j in range(len(boxes2)):
            inter, _ = cv2.intersectConvexConvex(c1[i], c2[j])
            a1 = abs(boxes1[i][2] * boxes1[i][3])
            a2 = abs(boxes2[j][2] * boxes2[j][3])
            union = a1 + a2 - inter
            if inter > 1e-7 and union > 1e-6:
                out[i, j] = inter / union
    return out


class TestIoU:
    def test_axis_aligned_vs_oracle(self, rng):
        b1 = np.stack([rng.uniform(-10, 10, 20), rng.uniform(-10, 10, 20),
                       rng.uniform(1, 6, 20), rng.uniform(1, 6, 20)], axis=1).astype(np.float32)
        b2 = np.stack([rng.uniform(-10, 10, 15), rng.uniform(-10, 10, 15),
                       rng.uniform(1, 6, 15), rng.uniform(1, 6, 15)], axis=1).astype(np.float32)
        got = np.asarray(axis_aligned_iou(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(got, _np_axis_aligned_iou(b1, b2), atol=1e-5)

    def test_rotated_identical_boxes(self):
        b = jnp.array([[1.0, 2.0, 2.0, 4.0, 0.7]])
        got = np.asarray(rotated_iou(b, b))
        np.testing.assert_allclose(got, [[1.0]], atol=1e-5)

    def test_rotated_disjoint(self):
        b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
        b2 = jnp.array([[100.0, 100.0, 2.0, 2.0, -0.5]])
        np.testing.assert_allclose(np.asarray(rotated_iou(b1, b2)), [[0.0]], atol=1e-7)

    def test_rotated_90deg_cross(self):
        # two 1x3 rects crossed at 90 deg share a 1x1 square:
        # IoU = 1 / (3 + 3 - 1) = 0.2
        b1 = jnp.array([[0.0, 0.0, 1.0, 3.0, 0.0]])
        b2 = jnp.array([[0.0, 0.0, 1.0, 3.0, np.pi / 2]])
        np.testing.assert_allclose(np.asarray(rotated_iou(b1, b2)), [[0.2]], atol=1e-5)

    def test_rotated_vs_cv2_oracle(self, rng):
        n, m = 12, 9
        def mk(k):
            return np.stack([
                rng.uniform(-5, 5, k), rng.uniform(-5, 5, k),
                rng.uniform(1, 4, k), rng.uniform(1, 8, k),
                rng.uniform(-np.pi, np.pi, k)], axis=1).astype(np.float32)
        b1, b2 = mk(n), mk(m)
        got = np.asarray(rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
        want = _cv2_rotated_iou(b1, b2)
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_rotated_matches_axis_aligned_at_zero_angle(self, rng):
        k = 10
        b = np.stack([rng.uniform(-5, 5, k), rng.uniform(-5, 5, k),
                      rng.uniform(1, 4, k), rng.uniform(1, 8, k),
                      np.zeros(k)], axis=1).astype(np.float32)
        got_rot = np.asarray(rotated_iou(jnp.asarray(b), jnp.asarray(b)))
        got_aa = np.asarray(axis_aligned_iou(jnp.asarray(b[:, :4]), jnp.asarray(b[:, :4])))
        np.testing.assert_allclose(got_rot, got_aa, atol=1e-4)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def _np_greedy_nms(boxes_xywha, scores, iou_threshold):
    """Oracle replicating torchvision.ops.nms semantics on heading-ignored
    rects (reference utils.py:259-274)."""
    b = boxes_xywha
    rects = np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                      b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(rects[i, 0], rects[j, 0]); yy1 = max(rects[i, 1], rects[j, 1])
            xx2 = min(rects[i, 2], rects[j, 2]); yy2 = min(rects[i, 3], rects[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = (rects[i, 2] - rects[i, 0]) * (rects[i, 3] - rects[i, 1])
            a2 = (rects[j, 2] - rects[j, 0]) * (rects[j, 3] - rects[j, 1])
            iou = inter / (a1 + a2 - inter + 1e-7)
            if iou > iou_threshold:
                suppressed[j] = True
    return np.array(keep, dtype=int)


class TestNMS:
    def test_greedy_mask_vs_oracle(self, rng):
        n = 50
        boxes = np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                          rng.uniform(1, 5, n), rng.uniform(2, 8, n),
                          rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        order = np.argsort(-scores)
        boxes_sorted = boxes[order]
        keep = np.asarray(
            greedy_nms_mask(jnp.asarray(boxes_sorted), jnp.ones(n, dtype=bool), 0.2)
        )
        got = np.where(keep)[0]
        want_orig = _np_greedy_nms(boxes, scores, 0.2)
        # map oracle indices into sorted order
        inv = np.argsort(order)
        want = np.sort(inv[want_orig])
        np.testing.assert_array_equal(np.sort(got), want)

    def test_postprocess_pipeline(self, rng):
        n_anchors = 200
        anchors = np.stack([rng.uniform(-20, 60, n_anchors), rng.uniform(-70, 70, n_anchors),
                            np.full(n_anchors, 2.0), np.full(n_anchors, 4.5),
                            np.zeros(n_anchors)], axis=1).astype(np.float32)
        cls_logits = rng.normal(-3, 1.5, (n_anchors, 1)).astype(np.float32)
        box_deltas = (rng.normal(0, 0.05, (n_anchors, 6))).astype(np.float32)
        intent_logits = rng.normal(0, 1, (n_anchors, 8)).astype(np.float32)

        det = postprocess_detections(
            jnp.asarray(cls_logits), jnp.asarray(box_deltas), jnp.asarray(intent_logits),
            jnp.asarray(anchors),
            confidence_threshold=0.1, nms_iou_threshold=0.2,
            max_pre_nms=64, max_detections=16,
        )
        det = jax.tree.map(np.asarray, det)
        nv = int(det.valid.sum())
        # valid slots form a prefix sorted by descending score
        assert det.valid[:nv].all() and not det.valid[nv:].any()
        assert (np.diff(det.scores[:nv]) <= 1e-6).all()
        # every surviving score clears the confidence threshold
        assert (det.scores[:nv] >= 0.1).all()
        # intentions are argmax of intent logits at surviving anchors: spot check
        # by recomputing the full reference-style host pipeline
        scores_all = 1 / (1 + np.exp(-cls_logits[:, 0]))
        keep_conf = np.where(scores_all >= 0.1)[0]
        from intentbev.boxes.codec import decode_boxes as dec
        boxes_dec = np.asarray(dec(jnp.asarray(box_deltas[keep_conf]), jnp.asarray(anchors[keep_conf])))
        keep_nms = _np_greedy_nms(boxes_dec, scores_all[keep_conf], 0.2)
        want_idx = keep_conf[keep_nms]
        order = np.argsort(-scores_all[want_idx], kind="stable")
        want_idx = want_idx[order][:16]
        np.testing.assert_allclose(np.sort(det.scores[:nv]), np.sort(scores_all[want_idx]), atol=1e-5)
        want_intent = np.argmax(intent_logits[want_idx], axis=1)
        assert sorted(det.intentions[:nv].tolist()) == sorted(want_intent.tolist())

    def test_postprocess_empty(self):
        n = 32
        det = postprocess_detections(
            jnp.full((n, 1), -20.0), jnp.zeros((n, 6)), jnp.zeros((n, 8)),
            jnp.ones((n, 5)),
            confidence_threshold=0.1, max_pre_nms=16, max_detections=8,
        )
        assert int(jnp.sum(det.valid)) == 0
        assert int(det.num_conf) == 0 and int(det.num_kept) == 0

    def test_overflow_counters(self, rng):
        """num_conf/num_kept audit the fixed-shape caps the reference's
        dynamic lists don't have (eval_cnn.py:167-183). A conf-flood must
        report num_conf > max_pre_nms; widely-spaced survivors exceeding
        max_detections must report num_kept > max_detections."""
        n = 96
        # far apart: zero pairwise IoU, NMS keeps everything
        anchors = np.stack([np.arange(n) * 50.0, np.zeros(n),
                            np.full(n, 2.0), np.full(n, 4.5),
                            np.zeros(n)], axis=1).astype(np.float32)
        cls_logits = jnp.asarray(
            rng.uniform(2.0, 4.0, (n, 1)).astype(np.float32))  # all pass conf
        det = postprocess_detections(
            cls_logits, jnp.zeros((n, 6)), jnp.zeros((n, 8)),
            jnp.asarray(anchors),
            confidence_threshold=0.1, nms_iou_threshold=0.2,
            max_pre_nms=64, max_detections=16,
        )
        assert int(det.num_conf) == n > 64          # pre-NMS cap bound
        assert int(det.num_kept) == 64 > 16         # detection cap bound
        assert int(det.valid.sum()) == 16           # output still truncates
        # no overflow when caps are generous (max_pre_nms == n == all anchors)
        det2 = postprocess_detections(
            cls_logits, jnp.zeros((n, 6)), jnp.zeros((n, 8)),
            jnp.asarray(anchors),
            confidence_threshold=0.1, nms_iou_threshold=0.2,
            max_pre_nms=n, max_detections=128,
        )
        assert int(det2.num_conf) == n
        assert int(det2.num_kept) == n
        assert int(det2.valid.sum()) == n


class TestApproxTopK:
    def test_matches_exact_when_candidates_fit(self, rng):
        """Serving-path approx_topk must equal the exact path whenever fewer
        than max_pre_nms anchors pass the confidence threshold (the common
        regime — only fill slots can differ)."""
        from intentbev.boxes.anchors import generate_anchors
        from intentbev.boxes.nms import postprocess_detections
        from intentbev.configs import GridConfig, AnchorGridConfig

        grid = GridConfig(height_px=64, width_px=96)
        anchors = jnp.asarray(generate_anchors(grid, AnchorGridConfig()))
        n = anchors.shape[0]
        cls_logits = jnp.asarray(rng.normal(-4.0, 1.0, (n, 1)).astype(np.float32))
        # boost a sparse subset above the confidence threshold
        hot = rng.choice(n, size=60, replace=False)
        cls_logits = cls_logits.at[hot, 0].set(
            jnp.asarray(rng.uniform(1.0, 4.0, 60).astype(np.float32)))
        box_deltas = jnp.asarray(rng.normal(0, 0.1, (n, 6)).astype(np.float32))
        intent_logits = jnp.asarray(rng.normal(0, 1, (n, 8)).astype(np.float32))

        exact = postprocess_detections(cls_logits, box_deltas, intent_logits,
                                       anchors, max_pre_nms=256)
        approx = postprocess_detections(cls_logits, box_deltas, intent_logits,
                                        anchors, max_pre_nms=256, approx_topk=True)
        np.testing.assert_array_equal(np.asarray(exact.valid), np.asarray(approx.valid))
        np.testing.assert_allclose(np.asarray(exact.boxes_xywha),
                                   np.asarray(approx.boxes_xywha), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(exact.intentions),
                                      np.asarray(approx.intentions))
