"""Int8 serving path: quantized dense, int8 flash attention, full model.

The reference has no quantized inference (torch fp32, model_vit.py); this
path is a new serving capability — tests bound the W8A8 quantization error
against the float oracles.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.attention import reference_attention
from intentbev.ops.experimental.flash_int8 import flash_attention_packed_int8
from intentbev.ops.int8 import int8_dense, quantize_cols, quantize_rows


class TestInt8Primitives:
    def test_quantize_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(0, 2, (64, 384)).astype(np.float32))
        q, s = quantize_rows(x)
        back = np.asarray(q, np.float32) * np.asarray(s)
        err = np.abs(back - np.asarray(x)).max()
        assert err <= np.abs(np.asarray(x)).max() / 127.0 + 1e-6
        assert q.dtype == jnp.int8

    def test_int8_dense_close_to_f32(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (256, 384)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (384, 1536)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.1, (1536,)).astype(np.float32))
        got = np.asarray(int8_dense(x, w, b))
        want = np.asarray(x @ w + b)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.02, rel

    def test_per_channel_weight_scales(self, rng):
        w = np.zeros((8, 4), np.float32)
        w[:, 0] = 100.0
        w[:, 1] = 0.001
        q, s = quantize_cols(jnp.asarray(w))
        # both channels survive at full int8 resolution
        assert int(np.abs(np.asarray(q))[:, 0].max()) == 127
        assert int(np.abs(np.asarray(q))[:, 1].max()) == 127


class TestInt8Flash:
    @pytest.mark.parametrize("t,seq_len", [(384, None), (768, 700)])
    def test_matches_float_reference(self, rng, t, seq_len):
        b, h, dh = 1, 2, 64
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                flash_attention_packed_int8(q, k, v, h, seq_len=seq_len))

        def to_bhtd(x):
            return jnp.transpose(x.reshape(b, t, h, dh), (0, 2, 1, 3))
        o = reference_attention(to_bhtd(q), to_bhtd(k), to_bhtd(v), kv_len=seq_len)
        want = np.asarray(jnp.transpose(o, (0, 2, 1, 3)).reshape(b, t, dm))
        if seq_len is not None:
            got, want = got[:, :seq_len], want[:, :seq_len]
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.05, rel
        # and well-correlated overall, not just bounded
        cos = np.sum(got * want) / (np.linalg.norm(got) * np.linalg.norm(want))
        assert cos > 0.999


class TestInt8Model:
    def test_tiny_vit_int8_close_to_f32(self, rng):
        from intentbev.configs import tiny_test_config
        from intentbev.models import build_model

        cfg = tiny_test_config()
        g = cfg.grid
        lidar = jnp.asarray(
            rng.normal(0, 1, (1, g.height_px, g.width_px, g.lidar_total_channels))
            .astype(np.float32))
        mp = jnp.asarray(
            rng.normal(0, 1, (1, g.height_px, g.width_px, g.map_channels))
            .astype(np.float32))
        model = build_model(cfg)
        variables = model.init(jax.random.key(0), lidar, mp)
        cls_f, box_f, int_f = model.apply(variables, lidar, mp)

        cfg8 = dataclasses.replace(
            cfg, vit=dataclasses.replace(cfg.vit, serving_int8=True))
        model8 = build_model(cfg8)
        cls_8, box_8, int_8 = model8.apply(variables, lidar, mp)

        for a, b_ in [(cls_f, cls_8), (box_f, box_8), (int_f, int_8)]:
            a, b_ = np.asarray(a).ravel(), np.asarray(b_).ravel()
            cos = np.sum(a * b_) / (np.linalg.norm(a) * np.linalg.norm(b_) + 1e-9)
            assert cos > 0.99, cos


class TestFusedMlpInt8:
    def test_matches_f32_mlp(self, rng):
        from intentbev.ops.fused_mlp_int8 import fused_mlp_int8

        n, d, dh = 300, 128, 512
        x = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.05, (d, dh)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(0, 0.02, dh).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.05, (dh, d)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(0, 0.02, d).astype(np.float32))
        r = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp_int8(x, w1, b1, w2, b2, r))
        want = np.asarray(
            jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2 + r)
        cos = np.sum(got * want) / (
            np.linalg.norm(got) * np.linalg.norm(want) + 1e-9)
        assert cos > 0.999, cos
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.1, rel

    def test_gate(self, rng):
        from intentbev.ops.fused_mlp_int8 import fused_mlp_int8

        n, d, dh = 256, 128, 256
        x = jnp.asarray(rng.normal(0, 1, (1, n, d)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.05, (d, dh)).astype(np.float32))
        b1 = jnp.zeros((dh,), jnp.float32)
        w2 = jnp.asarray(rng.normal(0, 0.05, (dh, d)).astype(np.float32))
        b2 = jnp.zeros((d,), jnp.float32)
        r = jnp.asarray(rng.normal(0, 1, (1, n, d)).astype(np.float32))
        gate = jnp.zeros((1, n), jnp.float32)  # gate 0 -> pure residual
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp_int8(x, w1, b1, w2, b2, r, gate=gate))
        np.testing.assert_allclose(got, np.asarray(r), atol=1e-6)
