"""Hand-written torch twin of timm's ``VisionTransformer`` for import tests.

timm is absent in this environment, but the reference's flagship trained
artifact is a timm ViT (reference model_vit.py:62-74 builds
``vit_small_patch8_224`` with ``in_chans``=290/9, ``img_size``=(400,720)).
This twin reproduces timm's documented block math with timm's exact
state_dict key schema (``patch_embed.proj``, ``cls_token``, ``pos_embed``,
``blocks.N.{norm1, attn.qkv, attn.proj, norm2, mlp.fc1, mlp.fc2}``,
``norm``), so ``intentbev.import_torch.import_vit_encoder`` consumes its
``state_dict()`` exactly as it would a real timm checkpoint, and the
differential in tests/test_weight_import.py proves the mapping end to end.

The math, per timm vision_transformer.py (inference; DropPath = identity,
LayerScale/q-norm/k-norm = identity in the vit_small family):

  tokens = flatten(conv_{p x p, stride p}(x)).transpose -> [B, N, D]
  tokens = cat([cls, tokens]) + pos_embed
  for each block:  x = x + attn(norm1(x));  x = x + mlp(norm2(x))
  attn: packed qkv -> (3, heads, head_dim) split, scaled dot-product
        softmax, merge heads, linear proj
  mlp:  fc1 -> GELU(exact) -> fc2
  out = norm(x)      # LayerNorm eps 1e-6 throughout
"""

from __future__ import annotations

import torch
import torch.nn as nn


class TwinAttention(nn.Module):
    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        b, n, d = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b, n, 3, self.num_heads, self.head_dim)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(x)


class TwinMlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()  # exact erf GELU, like timm's default
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return self.fc2(self.act(self.fc1(x)))


class TwinBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float = 4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TwinAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TwinMlp(dim, int(dim * mlp_ratio))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(nn.Module):
    """Key schema twin of timm PatchEmbed: the conv lives at ``proj``."""

    def __init__(self, in_chans: int, embed_dim: int, patch: int):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, embed_dim, patch, stride=patch)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return self.proj(x).flatten(2).transpose(1, 2)  # [B, N, D]


class TwinViT(nn.Module):
    """timm ``VisionTransformer.forward_features`` twin (CLS + pos-embed,
    pre-LN blocks, final LN; returns ALL tokens [B, 1+N, D])."""

    def __init__(
        self,
        img_size: tuple[int, int],
        patch: int,
        in_chans: int,
        embed_dim: int,
        depth: int,
        num_heads: int,
        mlp_ratio: float = 4.0,
    ):
        super().__init__()
        gh, gw = img_size[0] // patch, img_size[1] // patch
        self.patch_embed = _PatchEmbed(in_chans, embed_dim, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + gh * gw, embed_dim))
        self.blocks = nn.ModuleList(
            [TwinBlock(embed_dim, num_heads, mlp_ratio) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)

    def forward_features(self, x: torch.Tensor) -> torch.Tensor:
        t = self.patch_embed(x)
        cls = self.cls_token.expand(t.shape[0], -1, -1)
        t = torch.cat([cls, t], dim=1) + self.pos_embed
        for blk in self.blocks:
            t = blk(t)
        return self.norm(t)

    forward = forward_features


def build_twin_intentnet_vit(
    ref_cnn,
    ref_heads,
    *,
    img_size: tuple[int, int],
    patch: int,
    lidar_chans: int,
    map_chans: int,
    embed_dim: int,
    depth: int,
    num_heads: int,
    adapter_out: int,
    fusion_planes: int,
    fusion_layers: int = 2,
    fusion_stride: int = 1,
    mlp_ratio: float = 4.0,
) -> nn.Module:
    """Full IntentNetViT twin: two TwinViTs + the reference-defined tail
    assembled from the ACTUAL reference modules (adapters per
    model_vit.py:82-83, fusion per model_vit.py:125-132, heads per
    heads.py:6-43, forward per model_vit.py:116-142,179-185). Its
    state_dict has exactly the key schema of a reference
    ``IntentNetViT.state_dict()``."""
    gh, gw = img_size[0] // patch, img_size[1] // patch

    class TwinIntentNetViT(nn.Module):
        def __init__(self):
            super().__init__()
            bb = nn.Module()
            bb.vit_lidar = TwinViT(
                img_size, patch, lidar_chans, embed_dim, depth, num_heads,
                mlp_ratio)
            bb.vit_map = TwinViT(
                img_size, patch, map_chans, embed_dim, depth, num_heads,
                mlp_ratio)
            bb.adapter_lidar = nn.Sequential(
                nn.LayerNorm(embed_dim), nn.Linear(embed_dim, adapter_out),
                nn.GELU())
            bb.adapter_map = nn.Sequential(
                nn.LayerNorm(embed_dim), nn.Linear(embed_dim, adapter_out),
                nn.GELU())
            bb.fusion_block = ref_cnn.CNNBackbone._make_layer(
                None, ref_cnn.BasicBlock, fusion_planes, fusion_layers,
                stride=fusion_stride, current_inplanes=2 * adapter_out,
                kernel_size_for_block=3)
            self.backbone = bb
            self.det_head = ref_heads.DetectionHead(in_channels=fusion_planes)
            self.intention_head = ref_heads.IntentionHead(
                in_channels=fusion_planes)

        def forward(self, lidar_bev, map_bev):
            def stream(x, vit, adapter):
                tokens = vit.forward_features(x)[:, 1:]  # strip CLS
                at = adapter(tokens)
                b_, n_, c_ = at.shape
                return at.permute(0, 2, 1).contiguous().view(b_, c_, gh, gw)

            fused = torch.cat(
                [stream(lidar_bev, self.backbone.vit_lidar,
                        self.backbone.adapter_lidar),
                 stream(map_bev, self.backbone.vit_map,
                        self.backbone.adapter_map)], dim=1)
            feats = self.backbone.fusion_block(fused)
            cls_l, box_p = self.det_head(feats)
            int_l = self.intention_head(feats)
            b_ = feats.shape[0]
            return (cls_l.reshape(b_, -1, 1), box_p.reshape(b_, -1, 6),
                    int_l.reshape(b_, -1, 8))

    return TwinIntentNetViT()
