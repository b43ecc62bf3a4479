"""Loss tests: vectorised assignment vs a numpy port of the reference's
sequential loop (loss.py:58-126), focal/smooth-L1 component checks, and an
overfit-one-batch sanity test."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from intentbev.configs import LossConfig
from intentbev.losses import (
    assign_targets_single,
    detection_intention_loss,
    pad_gt,
    sigmoid_focal_loss,
    smooth_l1,
)


def _np_axis_iou(a, b):
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    ix1 = np.maximum(ax1[:, None], bx1[None, :])
    iy1 = np.maximum(ay1[:, None], by1[None, :])
    ix2 = np.minimum(ax2[:, None], bx2[None, :])
    iy2 = np.minimum(ay2[:, None], by2[None, :])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None, :] - inter
    return inter / (union + 1e-7)


def _reference_assign(anchors, gt_boxes, gt_intents, pos_thr=0.6, neg_thr=0.45):
    """Numpy port of the reference per-item assignment (loss.py:68-126)."""
    N = anchors.shape[0]
    cls_t = np.full(N, -1, dtype=np.int64)
    box_t = np.zeros((N, 6), dtype=np.float32)
    int_t = np.full(N, -1, dtype=np.int64)
    num_gt = gt_boxes.shape[0]
    if num_gt == 0:
        cls_t[:] = 0
        return cls_t, box_t, int_t

    iou = _np_axis_iou(anchors[:, :4], gt_boxes[:, :4])
    max_iou = iou.max(axis=1)
    best_gt = iou.argmax(axis=1)

    cls_t[max_iou < neg_thr] = 0
    pos_mask = max_iou >= pos_thr
    cls_t[pos_mask] = 1

    best_anchor_per_gt = iou.argmax(axis=0)
    for g in range(num_gt):
        a = best_anchor_per_gt[g]
        if not pos_mask[a] and iou[a, g] >= neg_thr:
            pos_mask[a] = True
            cls_t[a] = 1

    final_pos = cls_t == 1
    idx = np.where(final_pos)[0]
    if len(idx):
        an = anchors[idx]
        gb = gt_boxes[best_gt[idx]]
        eps = 1e-6
        dx = (gb[:, 0] - an[:, 0]) / (an[:, 2] + eps)
        dy = (gb[:, 1] - an[:, 1]) / (an[:, 3] + eps)
        dw = np.log(gb[:, 2] / (an[:, 2] + eps) + eps)
        dl = np.log(gb[:, 3] / (an[:, 3] + eps) + eps)
        hs = np.sin(gb[:, 4] - an[:, 4])
        hc = np.cos(gb[:, 4] - an[:, 4])
        box_t[idx] = np.stack([dx, dy, dw, dl, hs, hc], axis=1)
        int_t[idx] = gt_intents[best_gt[idx]]
    return cls_t, box_t, int_t


def _rand_anchors(rng, n):
    return np.stack([
        rng.uniform(-20, 60, n), rng.uniform(-70, 70, n),
        rng.choice([2.0, 2.5, 1.5, 4.0], n), rng.choice([4.5, 2.5, 9.0, 2.0], n),
        rng.choice([0.0, np.pi / 2], n)], axis=1).astype(np.float32)


class TestAssignment:
    @pytest.mark.parametrize("num_gt", [0, 1, 5, 20])
    def test_vs_reference_port(self, rng, num_gt):
        n_anchors = 400
        anchors = _rand_anchors(rng, n_anchors)
        # place GT near anchors so positives exist
        gt = []
        for _ in range(num_gt):
            a = anchors[rng.integers(0, n_anchors)]
            gt.append(a[:5] + rng.normal(0, 0.3, 5))
        gt = np.asarray(gt, dtype=np.float32).reshape(num_gt, 5)
        gt_int = rng.integers(0, 8, num_gt).astype(np.int64)

        want_cls, want_box, want_int = _reference_assign(anchors, gt, gt_int)

        G = 32
        gtp = np.zeros((G, 5), np.float32)
        gtp[:num_gt] = gt
        gip = np.zeros((G,), np.int32)
        gip[:num_gt] = gt_int
        gv = np.zeros((G,), bool)
        gv[:num_gt] = True

        cfg = LossConfig(max_gt_boxes=G)
        cls_t, box_t, int_t = assign_targets_single(
            jnp.asarray(anchors), jnp.asarray(gtp), jnp.asarray(gip), jnp.asarray(gv), cfg)
        np.testing.assert_array_equal(np.asarray(cls_t), want_cls)
        np.testing.assert_allclose(np.asarray(box_t), want_box, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(int_t), want_int)

    def test_force_match_low_iou_gt(self):
        """A GT whose best anchor IoU is in [0.45, 0.6) still gets an anchor."""
        anchors = np.array([[0.0, 0.0, 2.0, 4.0, 0.0],
                            [50.0, 50.0, 2.0, 4.0, 0.0]], dtype=np.float32)
        gt = np.array([[0.7, 0.0, 2.0, 4.0, 0.0]], dtype=np.float32)
        iou = _np_axis_iou(anchors[:, :4], gt[:, :4])
        assert 0.45 <= iou[0, 0] < 0.6
        cfg = LossConfig(max_gt_boxes=4)
        gtp = np.zeros((4, 5), np.float32); gtp[0] = gt[0]
        gv = np.zeros(4, bool); gv[0] = True
        cls_t, _, int_t = assign_targets_single(
            jnp.asarray(anchors), jnp.asarray(gtp),
            jnp.zeros(4, jnp.int32), jnp.asarray(gv), cfg)
        assert int(cls_t[0]) == 1
        assert int(cls_t[1]) == 0


class TestLossComponents:
    def test_focal_matches_torch_formula(self, rng):
        import torch
        logits = rng.normal(0, 2, 100).astype(np.float32)
        targets = rng.integers(0, 2, 100).astype(np.float32)
        got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 0.25, 2.0))
        # torch oracle (torchvision formula)
        lt = torch.tensor(logits); tt = torch.tensor(targets)
        p = torch.sigmoid(lt)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(lt, tt, reduction="none")
        p_t = p * tt + (1 - p) * (1 - tt)
        want = ce * ((1 - p_t) ** 2.0)
        alpha_t = 0.25 * tt + 0.75 * (1 - tt)
        want = (alpha_t * want).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_smooth_l1_matches_torch(self, rng):
        import torch
        d = rng.normal(0, 0.3, 200).astype(np.float32)
        got = np.asarray(smooth_l1(jnp.asarray(d), 1.0 / 9.0))
        want = torch.nn.functional.smooth_l1_loss(
            torch.tensor(d), torch.zeros(200), beta=1.0 / 9.0, reduction="none").numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestFullLoss:
    def _setup(self, rng, B=2, N=200, G=8):
        anchors = _rand_anchors(rng, N)
        gt_boxes, gt_intents = [], []
        for _ in range(B):
            k = rng.integers(1, 5)
            idx = rng.integers(0, N, k)
            gt_boxes.append(anchors[idx][:, :5] + rng.normal(0, 0.2, (k, 5)))
            gt_intents.append(rng.integers(0, 8, k))
        gb, gi, gv = pad_gt(gt_boxes, gt_intents, G)
        return anchors, gb, gi, gv

    def test_loss_finite_and_structured(self, rng):
        anchors, gb, gi, gv = self._setup(rng)
        B, N = 2, 200
        out = detection_intention_loss(
            jnp.asarray(rng.normal(0, 1, (B, N, 1)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.1, (B, N, 6)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 1, (B, N, 8)).astype(np.float32)),
            jnp.asarray(anchors), jnp.asarray(gb), jnp.asarray(gi), jnp.asarray(gv),
            LossConfig(max_gt_boxes=8), jax.random.key(0))
        for k in ["loss", "cls_loss", "box_loss", "intent_loss"]:
            assert np.isfinite(float(out[k])), k
        assert float(out["num_pos_anchors"]) > 0
        total = float(out["cls_loss"]) + float(out["box_loss"]) + 0.5 * float(out["intent_loss"])
        assert float(out["loss"]) == pytest.approx(total, rel=1e-5)

    def test_nan_guard_zeroes(self, rng):
        anchors, gb, gi, gv = self._setup(rng)
        out = detection_intention_loss(
            jnp.full((2, 200, 1), jnp.nan), jnp.zeros((2, 200, 6)), jnp.zeros((2, 200, 8)),
            jnp.asarray(anchors), jnp.asarray(gb), jnp.asarray(gi), jnp.asarray(gv),
            LossConfig(max_gt_boxes=8), jax.random.key(0))
        assert float(out["loss"]) == 0.0

    def test_no_downsampling_branch(self, rng):
        anchors, gb, gi, gv = self._setup(rng)
        cfg = LossConfig(max_gt_boxes=8, apply_intention_downsampling=False)
        out = detection_intention_loss(
            jnp.zeros((2, 200, 1)), jnp.zeros((2, 200, 6)), jnp.zeros((2, 200, 8)),
            jnp.asarray(anchors), jnp.asarray(gb), jnp.asarray(gi), jnp.asarray(gv),
            cfg, jax.random.key(0))
        # uniform logits over 8 classes -> CE = log(8)
        assert float(out["intent_loss"]) == pytest.approx(np.log(8), rel=1e-4)

    def test_overfit_synthetic_batch(self, rng):
        """One optimiser on one batch must drive the loss down (SURVEY §7.4)."""
        anchors, gb, gi, gv = self._setup(rng, B=1, N=100, G=8)
        cfg = LossConfig(max_gt_boxes=8, apply_intention_downsampling=False)
        anchors_j = jnp.asarray(anchors)
        gbj, gij, gvj = jnp.asarray(gb), jnp.asarray(gi), jnp.asarray(gv)

        params = {
            "cls": jnp.zeros((1, 100, 1)),
            "box": jnp.zeros((1, 100, 6)),
            "intent": jnp.zeros((1, 100, 8)),
        }
        opt = optax.adam(0.05)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                out = detection_intention_loss(
                    p["cls"], p["box"], p["intent"], anchors_j,
                    gbj, gij, gvj, cfg, jax.random.key(0))
                return out["loss"], out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(60):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < 0.25 * losses[0], losses[::10]
