"""Pallas fused patch-embed vs lax.conv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.patch_embed import patch_embed_matmul


def _conv_ref(x, kernel, bias, patch):
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    b, gh, gw, d = y.shape
    return y.reshape(b, gh * gw, d)


class TestPatchEmbed:
    def _check(self, rng, b, h, w, c, d, patch):
        x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 0.05, (patch, patch, c, d)).astype(np.float32))
        bias = jnp.asarray(rng.normal(0, 0.02, d).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(patch_embed_matmul(x, k, bias, patch))
        want = np.asarray(_conv_ref(x, k, bias, patch))
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_single_row_band(self, rng):
        # gh=2 not divisible by 5 -> rows_per_program falls back to 1
        self._check(rng, b=1, h=16, w=24, c=5, d=32, patch=8)

    def test_multi_row_band(self, rng):
        # gh=5 -> the production 5-patch-row band path
        self._check(rng, b=2, h=40, w=16, c=3, d=16, patch=8)

    def test_bf16(self, rng):
        b, h, w, c, d, patch = 1, 40, 16, 6, 16, 8
        x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 0.05, (patch, patch, c, d)).astype(np.float32))
        bias = jnp.asarray(rng.normal(0, 0.02, d).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(patch_embed_matmul(
                x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), bias, patch)
            ).astype(np.float32)
        want = np.asarray(_conv_ref(x, k, bias, patch))
        np.testing.assert_allclose(got, want, atol=0.1, rtol=0.05)


class TestConvParamCompat:
    """_ConvParams('patch_embed') creates the identical tree AND values as
    nn.Conv('patch_embed') — the fused-embed and conv paths share
    checkpoints."""

    def test_tree_and_values(self, rng):
        import flax.linen as nn
        from intentbev.models.vit import _ConvParams, _dense_init

        class ViaConv(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(16, (8, 8), strides=(8, 8), padding="VALID",
                               kernel_init=_dense_init, name="patch_embed")(x)

        class ViaParams(nn.Module):
            @nn.compact
            def __call__(self, x):
                w, b = _ConvParams(8, x.shape[-1], 16, name="patch_embed")()
                return jax.lax.conv_general_dilated(
                    x, w, (8, 8), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

        x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 4)).astype(np.float32))
        v1 = ViaConv().init(jax.random.key(7), x)
        v2 = ViaParams().init(jax.random.key(7), x)
        assert (jax.tree_util.tree_structure(v1)
                == jax.tree_util.tree_structure(v2))
        for a, b in zip(jax.tree_util.tree_leaves(v1),
                        jax.tree_util.tree_leaves(v2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        y1 = np.asarray(ViaConv().apply(v1, x))
        y2 = np.asarray(ViaParams().apply(v1, x))
        np.testing.assert_allclose(y1.reshape(y2.shape), y2, atol=1e-5)
