"""Fused LN+Dense kernel vs the eager reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.fused_ln_dense import fused_ln_dense


def _ref(x, gamma, beta, w, bias, eps=1e-6, gelu=False):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * gamma + beta
    y = xn @ w.astype(jnp.float32) + bias
    if gelu:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(x.dtype)


class TestForward:
    @pytest.mark.parametrize("gelu", [False, True])
    @pytest.mark.parametrize("n,d,dout", [(256, 128, 384), (300, 128, 256)])
    def test_matches_reference(self, rng, gelu, n, d, dout):
        x = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1, 0.1, (d,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.1, (d,)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (d, dout)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.05, (dout,)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_ln_dense(x, gamma, beta, w, b, gelu=gelu))
        want = np.asarray(_ref(x, gamma, beta, w, b, gelu=gelu))
        atol = 2e-5 if not gelu else 2e-4  # erf approximation in-kernel
        np.testing.assert_allclose(got, want, atol=atol)


class TestBackward:
    @pytest.mark.parametrize("gelu", [False, True])
    def test_grads_match_reference(self, rng, gelu):
        n, d, dout = 300, 128, 256
        x = jnp.asarray(rng.normal(0, 1, (1, n, d)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1, 0.1, (d,)).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.1, (d,)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (d, dout)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.05, (dout,)).astype(np.float32))

        def loss_fused(x, gamma, beta, w, b):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(fused_ln_dense(x, gamma, beta, w, b, gelu=gelu)))

        def loss_ref(x, gamma, beta, w, b):
            return jnp.sum(jnp.sin(_ref(x, gamma, beta, w, b, gelu=gelu)))

        with pltpu.force_tpu_interpret_mode():
            gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
        for name, a, b_ in zip(["dx", "dgamma", "dbeta", "dw", "dbias"], gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-4, err_msg=name
            )

    def test_padded_rows_zero_grad(self, rng):
        """n not a multiple of the row block: padding rows must not leak
        into dW/dgamma (they go through LN of a zero row)."""
        n, d, dout = 200, 128, 128
        x = jnp.asarray(rng.normal(0, 1, (1, n, d)).astype(np.float32))
        gamma = jnp.ones((d,), jnp.float32)
        beta = jnp.zeros((d,), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.05, (d, dout)).astype(np.float32))
        b = jnp.zeros((dout,), jnp.float32)

        def loss(x, w):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(fused_ln_dense(x, gamma, beta, w, b) ** 2)

        def loss_ref(x, w):
            return jnp.sum(_ref(x, gamma, beta, w, b) ** 2)

        with pltpu.force_tpu_interpret_mode():
            dxf, dwf = jax.grad(loss, argnums=(0, 1))(x, w)
        dxr, dwr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dxf), np.asarray(dxr), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dwf), np.asarray(dwr), atol=2e-3)
