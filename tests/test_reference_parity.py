"""Direct parity tests against the ACTUAL reference implementation.

Loads /root/reference/{constants,utils,loss}.py (read-only) with torchvision
stubbed (it is not installed; the stub implements the two documented ops the
reference uses: greedy NMS and sigmoid focal loss) and checks that intentbev
reproduces the reference's numerics function-for-function: anchors, box
decode, axis-aligned IoU, VOC AP, NMS, and the full loss (target assignment
+ focal + smooth-L1 + intention CE).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_modules import load_ref


@pytest.fixture(scope="module")
def ref_utils():
    return load_ref("utils")


@pytest.fixture(scope="module")
def ref_loss():
    return load_ref("loss")


class TestAnchorsParity:
    def test_generate_anchors_identical(self, ref_utils):
        from intentbev.configs import AnchorGridConfig, GridConfig
        from intentbev.boxes import generate_anchors

        want = ref_utils.generate_anchors(feature_map_stride=8).numpy()
        got = generate_anchors(GridConfig(), AnchorGridConfig())
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestCodecParity:
    def test_decode_identical(self, ref_utils, rng):
        from intentbev.boxes import decode_boxes

        n = 200
        anchors = np.stack([
            rng.uniform(-20, 60, n), rng.uniform(-70, 70, n),
            rng.uniform(1.5, 4, n), rng.uniform(2, 9, n),
            rng.choice([0.0, np.pi / 2], n)], 1).astype(np.float32)
        deltas = rng.normal(0, 0.3, (n, 6)).astype(np.float32)
        want = ref_utils.decode_box_predictions(
            torch.tensor(deltas), torch.tensor(anchors)).numpy()
        got = np.asarray(decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)))
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestIoUParity:
    def test_axis_aligned_identical(self, ref_utils, rng):
        from intentbev.boxes import axis_aligned_iou

        a = rng.uniform(1, 10, (30, 4)).astype(np.float32)
        b = rng.uniform(1, 10, (20, 4)).astype(np.float32)
        want = ref_utils.compute_axis_aligned_iou(
            torch.tensor(a), torch.tensor(b)).numpy()
        got = np.asarray(axis_aligned_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestAPParity:
    def test_calculate_ap_identical(self, ref_utils, rng):
        from intentbev.metrics import calculate_ap_np

        for _ in range(10):
            n = rng.integers(1, 30)
            recall = np.sort(rng.uniform(0, 1, n))
            precision = rng.uniform(0, 1, n)
            want = ref_utils.calculate_ap(recall, precision)
            got = calculate_ap_np(recall, precision)
            assert got == pytest.approx(want, abs=1e-9)


class TestNMSParity:
    def test_apply_nms_identical(self, ref_utils, rng):
        from intentbev.boxes import greedy_nms_mask

        n = 60
        boxes = np.stack([
            rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
            rng.uniform(1, 6, n), rng.uniform(2, 8, n),
            rng.uniform(-np.pi, np.pi, n)], 1).astype(np.float32)
        scores = rng.uniform(0.1, 1, n).astype(np.float32)
        want_idx = ref_utils.apply_nms(
            torch.tensor(boxes), torch.tensor(scores), 0.2).numpy()
        order = np.argsort(-scores, kind="stable")
        keep = np.asarray(greedy_nms_mask(
            jnp.asarray(boxes[order]), jnp.ones(n, bool), 0.2))
        got_idx = order[np.where(keep)[0]]
        assert sorted(got_idx.tolist()) == sorted(want_idx.tolist())


class TestLossParity:
    def test_full_loss_identical(self, ref_loss, rng):
        """End-to-end loss vs the reference DetectionIntentionLoss on random
        predictions + GT (downsampling off — its RNG streams differ)."""
        from intentbev.configs import LossConfig
        from intentbev.losses import detection_intention_loss, pad_gt

        B, N, C = 2, 400, 8
        anchors = np.stack([
            rng.uniform(-20, 60, N), rng.uniform(-70, 70, N),
            rng.choice([2.0, 2.5], N), rng.choice([4.5, 2.5], N),
            rng.choice([0.0, np.pi / 2], N)], 1).astype(np.float32)
        cls_logits = rng.normal(0, 1, (B, N, 1)).astype(np.float32)
        box_preds = rng.normal(0, 0.2, (B, N, 6)).astype(np.float32)
        int_logits = rng.normal(0, 1, (B, N, C)).astype(np.float32)

        gt_boxes, gt_intents, gt_list = [], [], []
        for b in range(B):
            k = int(rng.integers(2, 6))
            idx = rng.integers(0, N, k)
            boxes = anchors[idx][:, :5] + rng.normal(0, 0.25, (k, 5)).astype(np.float32)
            intents = rng.integers(0, C, k)
            gt_boxes.append(boxes)
            gt_intents.append(intents)
            gt_list.append({
                "boxes_xywha": torch.tensor(boxes, dtype=torch.float32),
                "intentions": torch.tensor(intents, dtype=torch.long),
            })

        ref = ref_loss.DetectionIntentionLoss(
            apply_intention_downsampling=False)
        want = ref(
            torch.tensor(cls_logits), torch.tensor(box_preds),
            torch.tensor(int_logits), torch.tensor(anchors), gt_list)

        gb, gi, gv = pad_gt(gt_boxes, gt_intents, 16)
        got = detection_intention_loss(
            jnp.asarray(cls_logits), jnp.asarray(box_preds), jnp.asarray(int_logits),
            jnp.asarray(anchors), jnp.asarray(gb), jnp.asarray(gi), jnp.asarray(gv),
            LossConfig(max_gt_boxes=16, apply_intention_downsampling=False),
            jax.random.key(0))

        for key in ["loss", "cls_loss", "box_loss", "intent_loss"]:
            assert float(got[key]) == pytest.approx(
                float(want[key]), rel=2e-4), key
        assert float(got["num_pos_anchors"]) == want["num_pos_anchors"]
