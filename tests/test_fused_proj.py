"""Fused residual projection numerics (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.experimental.fused_proj import fused_dense_residual


def _ref(x, w, b, r, gate=None):
    y = x @ w + b
    if gate is not None:
        y = y * gate[..., None]
    return y + r


class TestFusedProj:
    def _inputs(self, rng, n=300, d=128):
        x = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.05, (d, d)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.02, d).astype(np.float32))
        r = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        return x, w, b, r

    def test_forward(self, rng):
        x, w, b, r = self._inputs(rng)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_dense_residual(x, w, b, r))
        np.testing.assert_allclose(got, np.asarray(_ref(x, w, b, r)), atol=5e-5)

    def test_forward_gated(self, rng):
        x, w, b, r = self._inputs(rng)
        gate = jnp.asarray((rng.uniform(size=(2, x.shape[1])) < 0.7).astype(np.float32) / 0.7)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_dense_residual(x, w, b, r, gate=gate))
        np.testing.assert_allclose(got, np.asarray(_ref(x, w, b, r, gate)), atol=5e-5)

    def test_grads(self, rng):
        x, w, b, r = self._inputs(rng, n=256)
        gate = jnp.asarray(np.ones((2, 256), np.float32) * 1.25)

        def loss_fused(x, w, b, r):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(fused_dense_residual(x, w, b, r, gate=gate)))

        def loss_ref(x, w, b, r):
            return jnp.sum(jnp.sin(_ref(x, w, b, r, gate)))

        with pltpu.force_tpu_interpret_mode():
            gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, b, r)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, b, r)
        for name, a, bb in zip(["dx", "dw", "db", "dr"], gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=2e-4,
                                       err_msg=name)
