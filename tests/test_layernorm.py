"""Fused Pallas LayerNorm numerics (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.layernorm import fused_layernorm


class TestFusedLayerNorm:
    def _ref(self, x, gamma, beta, eps=1e-6):
        xf = np.asarray(x, dtype=np.float64)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return (xf - mu) / np.sqrt(var + eps) * np.asarray(gamma) + np.asarray(beta)

    def test_forward_matches_reference(self, rng):
        x = jnp.asarray(rng.normal(0, 2, (3, 700, 384)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1, 0.1, 384).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.1, 384).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_layernorm(x, gamma, beta))
        want = self._ref(x, gamma, beta)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_grads_match_flax(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (2, 512, 128)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1, 0.1, 128).astype(np.float32))
        beta = jnp.zeros(128)

        def loss_fused(x, g, b):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(fused_layernorm(x, g, b)))

        ln = nn.LayerNorm(epsilon=1e-6)
        p = {"params": {"scale": gamma, "bias": beta}}

        def loss_flax(x, g, b):
            return jnp.sum(jnp.sin(ln.apply({"params": {"scale": g, "bias": b}}, x)))

        with pltpu.force_tpu_interpret_mode():
            gx, gg, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
        rx, rg, rb = jax.grad(loss_flax, argnums=(0, 1, 2))(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), atol=2e-3)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=2e-3)

    def test_bf16_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (1, 1024, 256)).astype(np.float32)).astype(jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            y = fused_layernorm(x, jnp.ones(256), jnp.zeros(256))
        assert y.dtype == jnp.bfloat16
        yf = np.asarray(y, dtype=np.float32)
        np.testing.assert_allclose(yf.mean(-1), 0.0, atol=0.05)
        np.testing.assert_allclose(yf.std(-1), 1.0, atol=0.05)
