"""Tests for AP / matching / intention metrics vs numpy + sklearn oracles."""

import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.metrics import accuracy_score, f1_score

from intentbev.metrics import (
    IntentionConfusion,
    calculate_ap_np,
    confusion_to_metrics,
    greedy_match,
    match_intentions,
    sample_average_precision,
)


def _reference_sample_ap(pred_boxes, pred_scores, gt_boxes, iou_thresh):
    """Numpy port of the reference per-sample AP loop (eval_cnn.py:210-251)."""
    num_gt, num_pred = len(gt_boxes), len(pred_boxes)
    if num_pred == 0:
        return 1.0 if num_gt == 0 else 0.0
    if num_gt == 0:
        return 0.0
    order = np.argsort(-pred_scores, kind="stable")
    pb = pred_boxes[order]

    def iou_mat(a, b):
        out = np.zeros((len(a), len(b)))
        for i in range(len(a)):
            for j in range(len(b)):
                ax1, ay1 = a[i, 0] - a[i, 2] / 2, a[i, 1] - a[i, 3] / 2
                ax2, ay2 = a[i, 0] + a[i, 2] / 2, a[i, 1] + a[i, 3] / 2
                bx1, by1 = b[j, 0] - b[j, 2] / 2, b[j, 1] - b[j, 3] / 2
                bx2, by2 = b[j, 0] + b[j, 2] / 2, b[j, 1] + b[j, 3] / 2
                iw = max(0, min(ax2, bx2) - max(ax1, bx1))
                ih = max(0, min(ay2, by2) - max(ay1, by1))
                inter = iw * ih
                out[i, j] = inter / (a[i, 2] * a[i, 3] + b[j, 2] * b[j, 3] - inter + 1e-7)
        return out

    iou = iou_mat(pb[:, :4], gt_boxes[:, :4])
    gt_matched = np.zeros(num_gt, dtype=bool)
    tp = np.zeros(num_pred, dtype=bool)
    for p in range(num_pred):
        best = np.argmax(iou[p])
        if iou[p, best] >= iou_thresh and not gt_matched[best]:
            tp[p] = True
            gt_matched[best] = True
    tp_cum = np.cumsum(tp.astype(float))
    recall = tp_cum / (num_gt + 1e-9)
    precision = tp_cum / (np.arange(1, num_pred + 1) + 1e-9)
    return calculate_ap_np(recall, precision)


def _rand_boxes(rng, n):
    return np.stack([
        rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
        rng.uniform(2, 5, n), rng.uniform(3, 8, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)


def _pad(arr, total, width=None):
    n = len(arr)
    if width is None:
        width = arr.shape[1] if arr.ndim > 1 else None
    shape = (total, width) if width else (total,)
    out = np.zeros(shape, dtype=arr.dtype if hasattr(arr, "dtype") else np.float32)
    out[:n] = arr
    valid = np.zeros(total, dtype=bool)
    valid[:n] = True
    return out, valid


class TestCalculateAP:
    def test_perfect_pr(self):
        assert calculate_ap_np(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == pytest.approx(1.0)

    def test_known_value(self):
        recall = np.array([0.2, 0.4, 0.4, 0.6])
        precision = np.array([1.0, 1.0, 0.66, 0.75])
        # envelope: [1, 1, .75, .75]; integral = .2*1 + .2*1 + .2*.75
        assert calculate_ap_np(recall, precision) == pytest.approx(0.55, abs=1e-6)


class TestSampleAP:
    @pytest.mark.parametrize("num_pred,num_gt", [(10, 5), (0, 5), (10, 0), (0, 0), (3, 8)])
    def test_vs_reference_port(self, rng, num_pred, num_gt):
        preds = _rand_boxes(rng, num_pred)
        scores = np.sort(rng.uniform(0.1, 1, num_pred))[::-1].astype(np.float32)
        gts = _rand_boxes(rng, num_gt)
        # overlap some preds with gts to create TPs
        for i in range(min(num_pred, num_gt)):
            if rng.uniform() < 0.6:
                preds[i] = gts[i] + rng.normal(0, 0.2, 5).astype(np.float32)

        P, G = 16, 12
        pb, pv = _pad(preds, P, 5)
        gb, gv = _pad(gts, G, 5)
        got = sample_average_precision(
            jnp.asarray(pb), jnp.asarray(pv), jnp.asarray(gb), jnp.asarray(gv),
            iou_thresholds=(0.5, 0.7),
        )
        for ti, t in enumerate([0.5, 0.7]):
            want = _reference_sample_ap(preds, scores, gts, t)
            np.testing.assert_allclose(float(got.ap[ti]), want, atol=1e-5,
                                       err_msg=f"iou_thresh={t}")


class TestIntentionMetrics:
    def test_confusion_matches_sklearn(self, rng):
        C = 8
        n = 200
        gt = rng.integers(0, C, n)
        pred = np.where(rng.uniform(size=n) < 0.6, gt, rng.integers(0, C, n))
        conf = IntentionConfusion.zeros(C)
        # stream in two chunks with padding
        for lo, hi in [(0, 120), (120, 200)]:
            p, v = _pad(pred[lo:hi].astype(np.int32), 128)
            g, _ = _pad(gt[lo:hi].astype(np.int32), 128)
            conf = conf.update(jnp.asarray(p), jnp.asarray(g), jnp.asarray(v))
        m = confusion_to_metrics(conf.matrix)
        assert float(m["accuracy"]) == pytest.approx(accuracy_score(gt, pred), abs=1e-6)
        assert float(m["macro_f1"]) == pytest.approx(
            f1_score(gt, pred, labels=list(range(C)), average="macro", zero_division=0), abs=1e-6)
        assert float(m["weighted_f1"]) == pytest.approx(
            f1_score(gt, pred, labels=list(range(C)), average="weighted", zero_division=0), abs=1e-6)
        np.testing.assert_allclose(
            np.asarray(m["per_class_f1"]),
            f1_score(gt, pred, labels=list(range(C)), average=None, zero_division=0),
            atol=1e-6)

    @pytest.mark.parametrize("seed", range(5))
    def test_greedy_match_closed_form_equals_sequential(self, seed):
        """The r4 scatter-min closed form vs a literal sequential oracle
        of the reference rule (eval_cnn.py:236-244): iterate predictions
        in order, each takes its own argmax GT iff IoU clears threshold
        and the GT is free — including the quirk that a pred whose best
        GT is taken gets NO second chance. Random IoUs with deliberate
        collisions (few GTs, many preds)."""
        r = np.random.default_rng(seed)
        P, G = 32, 4
        iou = (r.uniform(0, 1, (P, G)) ** 2).astype(np.float32)
        pv = r.uniform(0, 1, P) < 0.8
        gv = r.uniform(0, 1, G) < 0.8
        thr = 0.3

        masked = np.where(gv[None, :], iou, -1.0)
        taken = np.zeros(G, bool)
        tp_ref = np.zeros(P, bool)
        mi_ref = np.full(P, -1, np.int32)
        for i in range(P):
            g = int(np.argmax(masked[i]))
            if pv[i] and masked[i, g] >= thr and not taken[g]:
                taken[g] = True
                tp_ref[i] = True
                mi_ref[i] = g
        tp, mi = greedy_match(
            jnp.asarray(iou), jnp.asarray(pv), jnp.asarray(gv), thr)
        np.testing.assert_array_equal(np.asarray(tp), tp_ref)
        np.testing.assert_array_equal(np.asarray(mi), mi_ref)

    def test_match_intentions_greedy_semantics(self, rng):
        # one gt, two overlapping preds: only the higher-scored pred matches
        gt = np.array([[0.0, 0.0, 2.0, 4.0, 0.0]], dtype=np.float32)
        preds = np.array([
            [0.1, 0.0, 2.0, 4.0, 0.0],
            [0.2, 0.1, 2.0, 4.0, 0.0],
        ], dtype=np.float32)
        pb, pv = _pad(preds, 8, 5)
        gb, gv = _pad(gt, 4, 5)
        pi, _ = _pad(np.array([3, 5], dtype=np.int32), 8)
        gi, _ = _pad(np.array([2], dtype=np.int32), 4)
        p_int, g_int, pair_valid = match_intentions(
            jnp.asarray(pb), jnp.asarray(pv), jnp.asarray(pi),
            jnp.asarray(gb), jnp.asarray(gv), jnp.asarray(gi), 0.5)
        pair_valid = np.asarray(pair_valid)
        assert pair_valid.sum() == 1
        assert pair_valid[0]  # first (highest score) pred wins
        assert int(np.asarray(p_int)[0]) == 3
        assert int(np.asarray(g_int)[0]) == 2
