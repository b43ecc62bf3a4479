"""Import reference PyTorch checkpoints into intentbev Flax parameter trees.

The migration path for users of the reference repo: a checkpoint saved by
``train_cnn.py`` (``{epoch, model_state_dict, optimizer_state_dict,
backbone_cfg}``, reference train_cnn.py:188-197) converts into an intentbev
orbax checkpoint that ``intentbev-eval`` consumes directly. The mapping is
exact — ``tests/test_weight_import.py`` asserts the imported IntentNetCNN
forward matches the reference network's output (rtol 1e-3 — f32
accumulation-order noise only) on shared weights.

Layout conversions:
- torch Conv2d weight [out, in, kh, kw]  -> flax Conv kernel [kh, kw, in, out]
- torch Linear weight [out, in]          -> flax Dense kernel [in, out]
- torch BatchNorm2d weight/bias          -> flax BatchNorm scale/bias (params)
  running_mean/running_var               -> flax batch_stats mean/var
- torch LayerNorm weight/bias            -> scale/bias

Name map (reference model tree -> intentbev param tree):
- ``backbone.{lidar,map}_stage{k}.{i}.*`` -> ``backbone/{lidar,map}_stage{k}/block{i}/*``
- ``....downsample.0/1``                  -> ``..../proj_conv, proj_bn``
- ``backbone.fusion_block.{i}.*``         -> ``backbone/fusion/block{i}/*``
- ``det_head.conv``, ``intention_head.conv`` -> same names
- ViT non-timm parts (model_vit.py:82-92): ``adapter_{lidar,map}.0/1`` ->
  ``backbone/adapter_{lidar,map}_norm / _proj``; ``fusion_block.{i}`` ->
  ``backbone/fusion/block{i}``.

The per-anchor channel order needs NO permutation: torch's
``view(B, A, P, H, W)`` (heads.py:22) and intentbev's NHWC
``reshape(B, H, W, A, P)`` both read conv output channel ``a * P + p``.

Timm ViT backbones cannot be imported in this environment (timm absent),
and the full ViT interior is intentbev-native anyway (Pallas attention);
``import_vit_nontimm`` covers every reference-defined ViT component.
"""

from __future__ import annotations

import argparse
from typing import Any, Mapping

import numpy as np

from .configs import CNNBackboneConfig, ExperimentConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def conv_kernel(w) -> np.ndarray:
    """torch [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return np.transpose(_np(w), (2, 3, 1, 0))


def dense_kernel(w) -> np.ndarray:
    """torch [out, in] -> flax [in, out]."""
    return np.transpose(_np(w), (1, 0))


def _bn(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]).astype(np.float32),
        "var": _np(sd[f"{prefix}.running_var"]).astype(np.float32),
    }
    return params, stats


def _basic_block(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """One reference BasicBlock (model_cnn.py:14-33) -> flax BasicBlock."""
    params: dict = {}
    stats: dict = {}
    params["conv1"] = {"kernel": conv_kernel(sd[f"{prefix}.conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.bn1")
    params["conv2"] = {"kernel": conv_kernel(sd[f"{prefix}.conv2.weight"])}
    params["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.bn2")
    if f"{prefix}.downsample.0.weight" in sd:
        params["proj_conv"] = {
            "kernel": conv_kernel(sd[f"{prefix}.downsample.0.weight"])
        }
        params["proj_bn"], stats["proj_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return params, stats


def _stage(sd: Mapping[str, Any], prefix: str, num_blocks: int) -> tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    for i in range(num_blocks):
        params[f"block{i}"], stats[f"block{i}"] = _basic_block(sd, f"{prefix}.{i}")
    return params, stats


def _head_conv(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "conv": {
            "kernel": conv_kernel(sd[f"{prefix}.conv.weight"]),
            "bias": _np(sd[f"{prefix}.conv.bias"]).astype(np.float32),
        }
    }


def import_cnn_state_dict(
    sd: Mapping[str, Any],
    cfg: CNNBackboneConfig = CNNBackboneConfig(),
) -> dict:
    """Reference ``IntentNetCNN.state_dict()`` -> ``{"params", "batch_stats"}``
    for :class:`intentbev.models.IntentNetCNN` (model_cnn.py:125-150)."""
    backbone_p: dict = {}
    backbone_s: dict = {}
    for stream in ("lidar", "map"):
        for k in range(1, 4):
            name = f"{stream}_stage{k}"
            backbone_p[name], backbone_s[name] = _stage(
                sd, f"backbone.{name}", cfg.num_blocks_per_stage
            )
    backbone_p["fusion"], backbone_s["fusion"] = _stage(
        sd, "backbone.fusion_block", cfg.fusion_layers
    )
    params = {
        "backbone": backbone_p,
        "det_head": _head_conv(sd, "det_head"),
        "intention_head": _head_conv(sd, "intention_head"),
    }
    return {"params": params, "batch_stats": {"backbone": backbone_s}}


def import_vit_nontimm(sd: Mapping[str, Any], fusion_layers: int = 2) -> dict:
    """The ViT model's reference-defined (non-timm) components
    (model_vit.py:82-92, heads.py:6-43): adapters, fusion stage, heads.

    Returns partial ``{"params", "batch_stats"}`` trees to be merged over an
    intentbev ``IntentNetViT`` init (the ViT encoder interiors stay
    intentbev-native; timm weights have no counterpart here).
    """
    backbone_p: dict = {}
    backbone_s: dict = {}
    for stream in ("lidar", "map"):
        ln_w = _np(sd[f"backbone.adapter_{stream}.0.weight"]).astype(np.float32)
        ln_b = _np(sd[f"backbone.adapter_{stream}.0.bias"]).astype(np.float32)
        backbone_p[f"adapter_{stream}_norm"] = {"scale": ln_w, "bias": ln_b}
        backbone_p[f"adapter_{stream}_proj"] = {
            "kernel": dense_kernel(sd[f"backbone.adapter_{stream}.1.weight"]),
            "bias": _np(sd[f"backbone.adapter_{stream}.1.bias"]).astype(np.float32),
        }
    backbone_p["fusion"], backbone_s["fusion"] = _stage(
        sd, "backbone.fusion_block", fusion_layers
    )
    params = {
        "backbone": backbone_p,
        "det_head": _head_conv(sd, "det_head"),
        "intention_head": _head_conv(sd, "intention_head"),
    }
    return {"params": params, "batch_stats": {"backbone": backbone_s}}


def merge_trees(base: dict, overlay: dict) -> dict:
    """Deep-merge ``overlay`` into a copy of ``base`` (leaves replaced)."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_trees(out[k], v)
        else:
            out[k] = v
    return out


def import_reference_checkpoint(
    ckpt_path: str,
    out_dir: str,
    model_family: str = "cnn",
) -> str:
    """Convert a reference ``torch.save`` checkpoint file into an intentbev
    orbax checkpoint directory consumable by ``intentbev-eval``."""
    import torch

    from .checkpoint import save_checkpoint

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("model_state_dict", raw)
    epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0

    cfg = ExperimentConfig(model_family=model_family)
    if model_family == "cnn":
        state = import_cnn_state_dict(sd, cfg.cnn)
    else:
        raise SystemExit(
            "Only --model cnn checkpoints import fully: the reference ViT's "
            "interior is a timm model whose weights have no counterpart in "
            "the intentbev Pallas ViT. Use import_vit_nontimm for the "
            "adapter/fusion/head components."
        )
    path = save_checkpoint(out_dir, step=epoch, state=state, config=cfg)
    return str(path)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Import a reference PyTorch checkpoint into an "
        "intentbev orbax checkpoint (see docs/MIGRATION.md)."
    )
    p.add_argument("ckpt", help="reference .pth file (train_cnn.py output)")
    p.add_argument("out_dir", help="intentbev checkpoint directory to create")
    p.add_argument("--model", default="cnn", choices=["cnn"])
    args = p.parse_args(argv)
    path = import_reference_checkpoint(args.ckpt, args.out_dir, args.model)
    print(f"imported -> {path}")


if __name__ == "__main__":
    main()
