"""Torch->Flax weight import differentials against the ACTUAL reference nets.

The strongest parity proof available in this environment (VERDICT r3 item 2):
random-initialise the reference's own torch models, import their weights via
``intentbev.import_torch``, and assert the intentbev forward reproduces the
torch forward numerically.

- IntentNetCNN (model_cnn.py:125-150) is pure torch: full-model forward
  differential, default channel widths.
- IntentNetViT's interior is timm (absent here), but everything the
  reference DEFINES — adapter LN->Linear->GELU (model_vit.py:82-83), fusion
  BasicBlock stack (model_vit.py:125-132), detection/intention heads
  (heads.py:6-43), and the token->feature-map reshape (model_vit.py:116-122)
  — is assembled from the reference's modules and compared end to end.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import flax.linen as nn

from ref_modules import load_ref

from intentbev.configs import CNNBackboneConfig, HeadConfig
from intentbev.import_torch import (
    import_cnn_state_dict,
    import_vit_nontimm,
)


def _randomize_torch_model(model: torch.nn.Module, seed: int) -> None:
    """Perturb every parameter and BN running stat so constant-init params
    (BN scale=1/bias=0, head biases) can't mask mapping mistakes."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=gen))
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(0.3 * torch.randn(b.shape, generator=gen))
            elif name.endswith("running_var"):
                b.copy_(0.5 + torch.rand(b.shape, generator=gen))


SMALL_CNN = dict(
    lidar_input_channels=12,
    map_input_channels=9,
    lidar_planes=(16, 24, 32),
    map_planes=(8, 8, 16),
    fusion_planes=48,
)


def _build_pair(cfg: CNNBackboneConfig, seed: int):
    """(reference torch IntentNetCNN, imported flax variables)."""
    ref_cnn = load_ref("model_cnn")
    torch.manual_seed(seed)
    tmodel = ref_cnn.IntentNetCNN(backbone_cfg=dict(
        lidar_input_channels=cfg.lidar_input_channels,
        map_input_channels=cfg.map_input_channels,
        lidar_s1_planes=cfg.lidar_planes[0],
        lidar_s2_planes=cfg.lidar_planes[1],
        lidar_s3_planes=cfg.lidar_planes[2],
        map_s1_planes=cfg.map_planes[0],
        map_s2_planes=cfg.map_planes[1],
        map_s3_planes=cfg.map_planes[2],
        fusion_block_planes=cfg.fusion_planes,
        fusion_block_layers=cfg.fusion_layers,
        num_blocks_per_stage=cfg.num_blocks_per_stage,
        res_block2_kernel_size=cfg.stream_kernel_size,
        fusion_block_kernel_size=cfg.fusion_kernel_size,
    ))
    _randomize_torch_model(tmodel, seed + 1)
    tmodel.eval()
    variables = import_cnn_state_dict(tmodel.state_dict(), cfg)
    return tmodel, variables


class TestCNNImport:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_full_model_forward_parity(self, seed, rng):
        """Imported IntentNetCNN forward == reference forward (rtol 1e-3)."""
        from intentbev.models import IntentNetCNN

        cfg = CNNBackboneConfig(**SMALL_CNN)
        tmodel, variables = _build_pair(cfg, seed)

        b, h, w = 2, 64, 96
        lidar = rng.normal(0, 1, (b, cfg.lidar_input_channels, h, w)).astype(np.float32)
        mapb = (rng.uniform(0, 1, (b, cfg.map_input_channels, h, w)) > 0.7).astype(np.float32)

        with torch.inference_mode():
            want = tmodel(torch.tensor(lidar), torch.tensor(mapb))

        model = IntentNetCNN(cfg, HeadConfig())
        # imported tree must be structurally identical to a fresh init
        init = model.init(jax.random.key(0), jnp.asarray(lidar), jnp.asarray(mapb))
        assert jax.tree.structure(init) == jax.tree.structure(
            jax.tree.map(jnp.asarray, variables))

        got = model.apply(variables, jnp.asarray(lidar), jnp.asarray(mapb))
        for g, t, name in zip(got, want, ["cls", "box", "intent"]):
            t = t.numpy()
            assert g.shape == t.shape, name
            np.testing.assert_allclose(
                np.asarray(g), t, rtol=1e-3, atol=2e-4, err_msg=name)

    def test_default_widths_forward_parity(self, rng):
        """Same differential at the reference's real channel widths
        (290/9 in, 160/192/224 + 32/64/96, fusion 512) on a small grid."""
        from intentbev.models import IntentNetCNN

        cfg = CNNBackboneConfig()
        tmodel, variables = _build_pair(cfg, 11)

        b, h, w = 1, 32, 48
        lidar = rng.normal(0, 1, (b, 290, h, w)).astype(np.float32)
        mapb = (rng.uniform(0, 1, (b, 9, h, w)) > 0.7).astype(np.float32)
        with torch.inference_mode():
            want = tmodel(torch.tensor(lidar), torch.tensor(mapb))
        got = IntentNetCNN(cfg, HeadConfig()).apply(
            variables, jnp.asarray(lidar), jnp.asarray(mapb))
        for g, t, name in zip(got, want, ["cls", "box", "intent"]):
            np.testing.assert_allclose(
                np.asarray(g), t.numpy(), rtol=1e-3, atol=2e-4, err_msg=name)


class _ViTTail(nn.Module):
    """intentbev's post-encoder pipeline (the reference-defined, non-timm
    part of IntentNetViT): per-stream adapter LN->Linear->GELU, token->map
    reshape, concat, fusion ResidualStage, heads, flatten. Mirrors
    models/vit.py process_stream tail with the same param names so
    ``import_vit_nontimm`` trees load directly."""

    adapter_out: int = 48
    fusion_planes: int = 96
    grid_hw: tuple = (6, 8)

    @nn.compact
    def __call__(self, tokens_lidar, tokens_map):
        from intentbev.models.blocks import ResidualStage
        from intentbev.models.heads import (
            DetectionHead,
            IntentionHead,
            flatten_head_outputs,
        )
        from intentbev.models.vit import FastLayerNorm

        gh, gw = self.grid_hw
        adapter_out, fusion_planes = self.adapter_out, self.fusion_planes

        class _Backbone(nn.Module):
            @nn.compact
            def __call__(self, tl, tm):
                def stream(tokens, name):
                    h = FastLayerNorm(name=f"adapter_{name}_norm")(tokens)
                    h = nn.Dense(adapter_out, name=f"adapter_{name}_proj")(h)
                    h = nn.gelu(h, approximate=False)
                    return h.reshape(h.shape[0], gh, gw, adapter_out)

                fused = jnp.concatenate(
                    [stream(tl, "lidar"), stream(tm, "map")], axis=-1)
                return ResidualStage(
                    planes=fusion_planes, num_blocks=2,
                    stride=1, kernel_size=3, name="fusion",
                )(fused, train=False)

        feats = _Backbone(name="backbone")(tokens_lidar, tokens_map)
        cls_l, box_p = DetectionHead(name="det_head")(feats)
        int_l = IntentionHead(name="intention_head")(feats)
        return flatten_head_outputs(cls_l, box_p, int_l)


class TestViTNonTimmImport:
    def test_adapter_fusion_heads_parity(self, rng):
        """Reference-assembled torch tail (adapter per model_vit.py:82-83,
        token reshape per model_vit.py:116-122, fusion per
        model_vit.py:125-132, heads per heads.py) vs intentbev's blocks on
        imported weights."""
        ref_cnn = load_ref("model_cnn")
        ref_heads = load_ref("heads")

        gh, gw, d, a_out, fus = 6, 8, 64, 48, 96
        torch.manual_seed(5)

        class RefTail(torch.nn.Module):
            def __init__(self):
                super().__init__()
                bb = torch.nn.Module()
                bb.adapter_lidar = torch.nn.Sequential(
                    torch.nn.LayerNorm(d), torch.nn.Linear(d, a_out),
                    torch.nn.GELU())
                bb.adapter_map = torch.nn.Sequential(
                    torch.nn.LayerNorm(d), torch.nn.Linear(d, a_out),
                    torch.nn.GELU())
                # reference _make_fusion_layer == _make_layer semantics
                bb.fusion_block = ref_cnn.CNNBackbone._make_layer(
                    None, ref_cnn.BasicBlock, fus, 2, stride=1,
                    current_inplanes=2 * a_out, kernel_size_for_block=3)
                self.backbone = bb
                self.det_head = ref_heads.DetectionHead(in_channels=fus)
                self.intention_head = ref_heads.IntentionHead(in_channels=fus)

            def forward(self, tl, tm):
                def stream(t, adapter):
                    at = adapter(t)  # [B, N, C]
                    b_, n_, c_ = at.shape
                    return at.permute(0, 2, 1).contiguous().view(b_, c_, gh, gw)

                fused = torch.cat(
                    [stream(tl, self.backbone.adapter_lidar),
                     stream(tm, self.backbone.adapter_map)], dim=1)
                feats = self.backbone.fusion_block(fused)
                cls_l, box_p = self.det_head(feats)
                int_l = self.intention_head(feats)
                b_ = feats.shape[0]
                return (cls_l.reshape(b_, -1, 1), box_p.reshape(b_, -1, 6),
                        int_l.reshape(b_, -1, 8))

        tmodel = RefTail()
        _randomize_torch_model(tmodel, 6)
        tmodel.eval()

        variables = import_vit_nontimm(tmodel.state_dict(), fusion_layers=2)

        b, n = 2, gh * gw
        tl = rng.normal(0, 1, (b, n, d)).astype(np.float32)
        tm = rng.normal(0, 1, (b, n, d)).astype(np.float32)
        with torch.inference_mode():
            want = tmodel(torch.tensor(tl), torch.tensor(tm))

        tail = _ViTTail(adapter_out=a_out, fusion_planes=fus, grid_hw=(gh, gw))
        init = tail.init(jax.random.key(0), jnp.asarray(tl), jnp.asarray(tm))
        assert jax.tree.structure(init) == jax.tree.structure(
            jax.tree.map(jnp.asarray, variables))

        got = tail.apply(variables, jnp.asarray(tl), jnp.asarray(tm))
        for g, t, name in zip(got, want, ["cls", "box", "intent"]):
            np.testing.assert_allclose(
                np.asarray(g), t.numpy(), atol=1e-4, err_msg=name)


class TestMergeIntoViT:
    def test_vit_nontimm_overlay_on_real_model(self, rng):
        """``import_vit_nontimm`` + ``merge_trees`` over a real IntentNetViT
        init: the reference-defined params land at the right paths and the
        full model still runs."""
        from intentbev.configs import tiny_test_config
        from intentbev.models import build_model
        from intentbev.import_torch import merge_trees

        ref_cnn = load_ref("model_cnn")
        ref_heads = load_ref("heads")
        cfg = tiny_test_config()
        v = cfg.vit  # embed 32, adapter_out 16, fusion 32, fusion_layers 1

        torch.manual_seed(9)
        tail = torch.nn.Module()
        bb = torch.nn.Module()
        bb.adapter_lidar = torch.nn.Sequential(
            torch.nn.LayerNorm(v.embed_dim),
            torch.nn.Linear(v.embed_dim, v.adapter_out_channels),
            torch.nn.GELU())
        bb.adapter_map = torch.nn.Sequential(
            torch.nn.LayerNorm(v.embed_dim),
            torch.nn.Linear(v.embed_dim, v.adapter_out_channels),
            torch.nn.GELU())
        bb.fusion_block = ref_cnn.CNNBackbone._make_layer(
            None, ref_cnn.BasicBlock, v.fusion_planes, v.fusion_layers,
            stride=v.fusion_stride, current_inplanes=2 * v.adapter_out_channels,
            kernel_size_for_block=v.fusion_kernel_size)
        tail.backbone = bb
        tail.det_head = ref_heads.DetectionHead(in_channels=v.fusion_planes)
        tail.intention_head = ref_heads.IntentionHead(in_channels=v.fusion_planes)
        _randomize_torch_model(tail, 10)

        overlay = import_vit_nontimm(tail.state_dict(),
                                     fusion_layers=v.fusion_layers)

        model = build_model(cfg)
        g = cfg.grid
        lidar = jnp.asarray(rng.normal(
            0, 1, (1, g.height_px, g.width_px, g.lidar_total_channels)), jnp.float32)
        mapb = jnp.zeros((1, g.height_px, g.width_px, g.map_channels), jnp.float32)
        init = model.init(jax.random.key(0), lidar, mapb)

        merged = {
            "params": merge_trees(dict(init["params"]), overlay["params"]),
            "batch_stats": merge_trees(
                dict(init.get("batch_stats", {})), overlay["batch_stats"]),
        }
        # same structure as the init; adapter weights actually replaced
        assert jax.tree.structure(init) == jax.tree.structure(
            jax.tree.map(jnp.asarray, merged))
        np.testing.assert_allclose(
            np.asarray(merged["params"]["backbone"]["adapter_lidar_proj"]["kernel"]),
            tail.backbone.adapter_lidar[1].weight.detach().numpy().T, atol=1e-6)

        out = model.apply(merged, lidar, mapb)
        assert all(np.isfinite(np.asarray(o)).all() for o in out)


class TestImportCLI:
    def test_reference_checkpoint_roundtrip(self, tmp_path, rng):
        """reference torch.save file -> intentbev-import-torch -> orbax
        checkpoint that load_checkpoint restores with the same weights."""
        from intentbev.checkpoint import load_checkpoint
        from intentbev.import_torch import main as import_main

        cfg = CNNBackboneConfig()
        tmodel, variables = _build_pair(cfg, 21)
        pth = tmp_path / "intentnet_cnn_final.pth"
        torch.save({
            "epoch": 9,
            "model_state_dict": tmodel.state_dict(),
            "optimizer_state_dict": {},
            "backbone_cfg": {},
        }, pth)

        out_dir = tmp_path / "imported"
        import_main([str(pth), str(out_dir), "--model", "cnn"])

        state, exp_cfg = load_checkpoint(out_dir)
        assert exp_cfg.model_family == "cnn"
        np.testing.assert_allclose(
            state["params"]["backbone"]["lidar_stage1"]["block0"]["conv1"]["kernel"],
            variables["params"]["backbone"]["lidar_stage1"]["block0"]["conv1"]["kernel"],
            atol=0)
        np.testing.assert_allclose(
            state["batch_stats"]["backbone"]["fusion"]["block1"]["bn2"]["var"],
            variables["batch_stats"]["backbone"]["fusion"]["block1"]["bn2"]["var"],
            atol=0)
