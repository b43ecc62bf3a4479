"""Fused Pallas MLP numerics vs the plain jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.fused_mlp import fused_mlp


def _ref(x, w1, b1, w2, b2, r):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    return h @ w2 + b2 + r


class TestFusedMlp:
    def _inputs(self, rng, n=300, d=128, dh=512):
        x = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.05, (d, dh)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(0, 0.02, dh).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.05, (dh, d)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(0, 0.02, d).astype(np.float32))
        r = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        return x, w1, b1, w2, b2, r

    def test_forward_matches(self, rng):
        x, w1, b1, w2, b2, r = self._inputs(rng)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp(x, w1, b1, w2, b2, r))
        want = np.asarray(_ref(x, w1, b1, w2, b2, r))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_grads_match(self, rng):
        x, w1, b1, w2, b2, r = self._inputs(rng, n=256, d=128, dh=256)

        def loss_fused(x, w1, b1, w2, b2, r):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(fused_mlp(x, w1, b1, w2, b2, r)))

        def loss_ref(x, w1, b1, w2, b2, r):
            return jnp.sum(jnp.sin(_ref(x, w1, b1, w2, b2, r)))

        with pltpu.force_tpu_interpret_mode():
            gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(x, w1, b1, w2, b2, r)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(x, w1, b1, w2, b2, r)
        names = ["dx", "dw1", "db1", "dw2", "db2", "dr"]
        for name, a, b in zip(names, gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name)

    def test_bf16(self, rng):
        x, w1, b1, w2, b2, r = self._inputs(rng, n=256)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_mlp(
                x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), b1,
                w2.astype(jnp.bfloat16), b2, r.astype(jnp.bfloat16)
            )).astype(np.float32)
        want = np.asarray(_ref(x, w1, b1, w2, b2, r))
        np.testing.assert_allclose(got, want, atol=0.25, rtol=0.05)
