"""Fused Pallas MLP numerics vs the plain jnp reference (interpret mode)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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

class TestGeluModes:
    """The INTENTBEV_GELU knob (fused_mlp._GELU_MODE): default is the exact
    erf GELU; "sigmoid" is a serving-only perf experiment whose deviation
    from exact GELU is bounded (~0.020 abs near |x|~2.3)."""

    def test_default_matches_exact_gelu(self):
        fm = importlib.import_module("intentbev.ops.fused_mlp")
        x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(fm._gelu(x)),
            np.asarray(jax.nn.gelu(x, approximate=False)), atol=2e-6)

    def test_sigmoid_mode_blocks_differentiation(self, monkeypatch):
        """Backward kernels pair _gelu with the erf derivative, so grads under
        sigmoid mode would be silently mismatched — the VJP must refuse."""
        fm = importlib.import_module("intentbev.ops.fused_mlp")
        monkeypatch.setattr(fm, "_GELU_MODE", "sigmoid")
        d, dh = 128, 256
        x = jnp.ones((256, d))
        w1, b1 = jnp.ones((d, dh)) * 0.01, jnp.zeros(dh)
        w2, b2 = jnp.ones((dh, d)) * 0.01, jnp.zeros(d)
        with pytest.raises(RuntimeError, match="serving-only"):
            jax.grad(lambda x: jnp.sum(fm.fused_mlp(x, w1, b1, w2, b2, x)))(x)

    def test_sigmoid_mode_bounded_deviation(self, monkeypatch):
        fm = importlib.import_module("intentbev.ops.fused_mlp")
        monkeypatch.setattr(fm, "_GELU_MODE", "sigmoid")
        x = jnp.linspace(-8.0, 8.0, 8001, dtype=jnp.float32)
        dev = np.abs(np.asarray(fm._gelu(x))
                     - np.asarray(jax.nn.gelu(x, approximate=False)))
        assert dev.max() < 0.021, dev.max()
