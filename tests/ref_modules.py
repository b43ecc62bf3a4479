"""Load the ACTUAL reference modules from /root/reference for differential tests.

The reference stack (constants/utils/loss/dataset/heuristic_labeling) is pure
Python over torch/pandas/pyarrow/scipy/cv2 — all installed here — except:

- torchvision is absent; a stub implements the two documented ops the
  reference uses (greedy NMS, sigmoid focal loss) with their published
  semantics.
- shapely and av2 are absent; the reference degrades by design
  (constants.py:4-15): rotated IoU -> axis-aligned, heuristic labeling ->
  kinematics-only. Those are exactly the code paths the differential tests
  compare.
- Two latent defects (SURVEY.md §2 "known latent defects") break imports on
  Python 3.12's eager annotation evaluation: ``utils.py``'s
  ``-> Polygon | None`` and ``heuristic_labeling.py``'s
  ``ArgoverseStaticMap | None`` reference names that are never imported when
  the optional deps are missing. ``_PRESEED`` injects placeholder objects so
  the modules load with their runtime behaviour unchanged.
"""

import importlib.util
import sys
import types

import numpy as np
import torch
from scipy.spatial.transform import Rotation as _Rotation

REF = "/root/reference"


class _RotationShim:
    """pandas 3.0 copy-on-write hands out READ-ONLY ``.values`` arrays and
    scipy's cython ``Rotation.from_quat`` rejects read-only buffers
    (ValueError: buffer source array is read-only). The reference was
    written against pandas 1.x/2.x where those arrays were writable; without
    this shim every pose lookup silently ValueErrors into the reference's
    skip paths (dataset.py:330-334) and __getitem__ returns None for every
    sample. Copying the input restores the original behaviour; genuinely
    invalid quaternions (zero norm) still raise ValueError as before."""

    @staticmethod
    def from_quat(quat, **kwargs):
        return _Rotation.from_quat(np.array(quat, dtype=np.float64), **kwargs)

# names each module's def-time annotations dereference but never imports
_PRESEED = {
    "utils": {"Polygon": object},
    "heuristic_labeling": {"ArgoverseStaticMap": object},
}

# import-order dependencies between the reference's flat modules
_DEPS = {
    "utils": ["constants"],
    "loss": ["constants", "utils"],
    "heuristic_labeling": ["constants"],
    "dataset": ["constants", "utils", "heuristic_labeling"],
    "heads": ["constants"],
    "model_cnn": ["constants", "heads"],
}


def install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True)
        keep = []
        suppressed = torch.zeros(len(scores), dtype=torch.bool)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            xx1 = torch.maximum(boxes[i, 0], boxes[:, 0])
            yy1 = torch.maximum(boxes[i, 1], boxes[:, 1])
            xx2 = torch.minimum(boxes[i, 2], boxes[:, 2])
            yy2 = torch.minimum(boxes[i, 3], boxes[:, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (areas[i] + areas - inter + 1e-7)
            suppressed |= iou > iou_threshold
        return torch.tensor(keep, dtype=torch.long)

    def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2.0, reduction="none"):
        p = torch.sigmoid(inputs)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "sum":
            return loss.sum()
        if reduction == "mean":
            return loss.mean()
        return loss

    ops.nms = nms
    ops.sigmoid_focal_loss = sigmoid_focal_loss
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def load_ref(name: str):
    """Import /root/reference/<name>.py (read-only) as module ``name``."""
    install_torchvision_stub()
    if name in sys.modules:
        return sys.modules[name]
    for dep in _DEPS.get(name, []):
        load_ref(dep)
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    for attr, val in _PRESEED.get(name, {}).items():
        setattr(mod, attr, val)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    if getattr(mod, "R", None) is _Rotation:
        mod.R = _RotationShim
    return mod
