"""Flash-attention kernel numerics vs the XLA reference (interpret mode on
CPU; the same kernels compile for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.attention import reference_attention
from intentbev.ops.flash_attention import flash_attention


def _qkv(rng, b=1, h=2, t=300, d=64, dtype=np.float32):
    def mk():
        return jnp.asarray(rng.normal(0, 1, (b, h, t, d)).astype(dtype))
    return mk(), mk(), mk()


class TestFlashForward:
    @pytest.mark.parametrize("t", [128, 300, 512, 700])
    def test_matches_reference(self, rng, t):
        q, k, v = _qkv(rng, t=t)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention(q, k, v))
        want = np.asarray(reference_attention(q, k, v))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_bf16_inputs(self, rng):
        q, k, v = _qkv(rng, t=256)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention(qb, kb, vb)).astype(np.float32)
        want = np.asarray(reference_attention(q, k, v))
        np.testing.assert_allclose(got, want, atol=3e-2)


class TestFlashBackward:
    def test_grads_match_reference(self, rng):
        q, k, v = _qkv(rng, t=300, h=1)

        def loss_flash(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                o = flash_attention(q, k, v)
            return jnp.sum(jnp.sin(o))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(reference_attention(q, k, v)))

        with pltpu.force_tpu_interpret_mode():
            gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)

    def test_grads_prepadded_block_aligned(self, rng):
        """seq_len < T with T block-aligned: no internal pad/slice hides the
        kernel outputs, so masked-key dk/dv rows must be exactly zero and
        real rows must match the dense oracle even with nonzero dO on
        padded query rows (loss sums over ALL rows)."""
        t, real = 512, 450
        q, k, v = _qkv(rng, t=t, h=2)

        def loss_flash(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(flash_attention(q, k, v, seq_len=real)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(reference_attention(q, k, v, kv_len=real)))

        with pltpu.force_tpu_interpret_mode():
            gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)
        assert np.all(np.asarray(gk)[:, :, real:] == 0.0)
        assert np.all(np.asarray(gv)[:, :, real:] == 0.0)
