"""Edge cases: rotated-IoU eval matching, batch padding, GT overflow."""

import numpy as np
import jax.numpy as jnp

from intentbev.metrics import match_intentions, sample_average_precision
from intentbev.data.pipeline import Batch, pad_batch


class TestRotatedIoUEval:
    def test_rotated_matching_differs_from_axis_aligned(self):
        # a thin box rotated 45 deg barely overlaps its axis-aligned twin's
        # AABB footprint: axis-aligned matching says TP, rotated says FP
        gt = np.zeros((4, 5), np.float32)
        gt[0] = [0.0, 0.0, 1.0, 6.0, 0.0]
        gv = np.zeros(4, bool); gv[0] = True
        pred = np.zeros((8, 5), np.float32)
        pred[0] = [0.0, 0.0, 1.0, 6.0, np.pi / 2]
        pv = np.zeros(8, bool); pv[0] = True

        aa = sample_average_precision(
            jnp.asarray(pred), jnp.asarray(pv), jnp.asarray(gt), jnp.asarray(gv),
            iou_thresholds=(0.5,), use_rotated_iou=False)
        rot = sample_average_precision(
            jnp.asarray(pred), jnp.asarray(pv), jnp.asarray(gt), jnp.asarray(gv),
            iou_thresholds=(0.5,), use_rotated_iou=True)
        # axis-aligned IoU of identical (cx,cy,w,l) = 1.0 -> AP 1;
        # rotated IoU of crossed rectangles = (1*1)/(6+6-1) ~ 0.09 -> AP 0
        assert float(aa.ap[0]) == 1.0
        assert float(rot.ap[0]) == 0.0

    def test_rotated_match_intentions(self):
        gt = np.zeros((4, 5), np.float32)
        gt[0] = [0.0, 0.0, 2.0, 4.0, 0.7]
        gv = np.zeros(4, bool); gv[0] = True
        pred = np.zeros((4, 5), np.float32)
        pred[0] = [0.05, 0.0, 2.0, 4.0, 0.7]
        pv = np.zeros(4, bool); pv[0] = True
        _, _, pair_valid = match_intentions(
            jnp.asarray(pred), jnp.asarray(pv), jnp.zeros(4, jnp.int32),
            jnp.asarray(gt), jnp.asarray(gv), jnp.zeros(4, jnp.int32),
            iou_threshold=0.5, use_rotated_iou=True)
        assert bool(np.asarray(pair_valid)[0])


class TestPadBatch:
    def _batch(self, b):
        return Batch(
            points=np.ones((b, 2, 4, 4), np.float32),
            points_valid=np.ones((b, 2, 4), bool),
            map_bev=np.ones((b, 8, 8, 9), np.float32),
            gt_boxes=np.ones((b, 3, 5), np.float32),
            gt_intentions=np.ones((b, 3), np.int32),
            gt_valid=np.ones((b, 3), bool),
            aug_params=np.tile(np.array([[1.0, 0.0, 1.0]], np.float32), (b, 1)),
        )

    def test_pads_to_size(self):
        padded, valid = pad_batch(self._batch(3), 8)
        assert padded.points.shape[0] == 8
        assert valid.tolist() == [True] * 3 + [False] * 5
        # padding carries zero GT
        assert padded.gt_valid[3:].sum() == 0

    def test_full_batch_passthrough(self):
        b = self._batch(4)
        padded, valid = pad_batch(b, 4)
        assert padded is b
        assert valid.all()
