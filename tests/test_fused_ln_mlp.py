"""Fused Pallas LN+MLP block-tail numerics vs plain jnp (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.fused_ln_mlp import fused_ln_mlp


def _ref(x, gamma, beta, w1, b1, w2, b2, gate=None, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps) * gamma + beta
    h = jax.nn.gelu(xn @ w1 + b1, approximate=False)
    y = h @ w2 + b2
    if gate is not None:
        y = y * gate[..., None]
    return y + x


class TestFusedLnMlp:
    def _inputs(self, rng, n=300, d=128, dh=512):
        x = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1, 0.1, d).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.1, d).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.05, (d, dh)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(0, 0.02, dh).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.05, (dh, d)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(0, 0.02, d).astype(np.float32))
        return x, gamma, beta, w1, b1, w2, b2

    def test_forward_matches(self, rng):
        args = self._inputs(rng)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_ln_mlp(*args))
        want = np.asarray(_ref(*args))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_forward_hidden_chunked_matches(self, rng, monkeypatch):
        # INTENTBEV_MLP_HCHUNK serving path (two 256-chunks of dh=512):
        # fc2 distributes over hidden slices, so the chunked body must
        # match the monolithic kernel up to f32 partial-sum rounding
        import intentbev.ops.fused_ln_mlp as m

        args = self._inputs(rng)
        monkeypatch.setattr(m, "MLP_HCHUNK", 256)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_ln_mlp(*args))
        want = np.asarray(_ref(*args))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_forward_with_gate(self, rng):
        x, gamma, beta, w1, b1, w2, b2 = self._inputs(rng, n=256)
        gate = jnp.asarray(
            rng.choice([0.0, 1.25], size=x.shape[:2]).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                fused_ln_mlp(x, gamma, beta, w1, b1, w2, b2, gate=gate))
        want = np.asarray(_ref(x, gamma, beta, w1, b1, w2, b2, gate=gate))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_grads_match(self, rng):
        args = self._inputs(rng, n=256, d=128, dh=256)

        def loss_fused(*a):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(fused_ln_mlp(*a)))

        def loss_ref(*a):
            return jnp.sum(jnp.sin(_ref(*a)))

        argnums = tuple(range(7))
        with pltpu.force_tpu_interpret_mode():
            gf = jax.grad(loss_fused, argnums=argnums)(*args)
        gr = jax.grad(loss_ref, argnums=argnums)(*args)
        names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
        for name, a, b in zip(names, gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, err_msg=name)

    def test_bf16(self, rng):
        x, gamma, beta, w1, b1, w2, b2 = self._inputs(rng, n=256)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_ln_mlp(
                x.astype(jnp.bfloat16), gamma, beta,
                w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2,
            )).astype(np.float32)
        want = np.asarray(_ref(x, gamma, beta, w1, b1, w2, b2))
        np.testing.assert_allclose(got, want, atol=0.25, rtol=0.05)


class TestEncoderBlockFusedTail:
    """The fused-tail EncoderBlock keeps the same param tree and (on the
    eager fallback path) the same outputs as the separate norm2+mlp
    structure."""

    def test_param_tree_and_output(self, rng):
        import flax.linen as nn
        from intentbev.models.vit import EncoderBlock

        x = jnp.asarray(rng.normal(0, 1, (2, 64, 96)).astype(np.float32))
        blk_fused = EncoderBlock(
            dim=96, num_heads=6, mlp_ratio=4.0, qkv_bias=True,
            drop_path_rate=0.0, use_flash=False, fused_ln=True, fused_mlp=True)
        blk_plain = EncoderBlock(
            dim=96, num_heads=6, mlp_ratio=4.0, qkv_bias=True,
            drop_path_rate=0.0, use_flash=False, fused_ln=False, fused_mlp=False)
        v_fused = blk_fused.init(jax.random.key(0), x)
        v_plain = blk_plain.init(jax.random.key(0), x)
        tf = jax.tree_util.tree_structure(v_fused)
        tp = jax.tree_util.tree_structure(v_plain)
        assert tf == tp, f"param trees differ:\n{tf}\n{tp}"
        yf = np.asarray(blk_fused.apply(v_plain, x))
        yp = np.asarray(blk_plain.apply(v_plain, x))
        np.testing.assert_allclose(yf, yp, atol=2e-5)


class TestLnOutEpilogue:
    """fused_ln_mlp(..., ln_out=(g, b)) -> (y, LN(y)) — the serving LN
    chain's building block (block i's tail emits block i+1's norm1)."""

    def test_forward_pair_matches(self, rng):
        n, d, dh = 300, 128, 512
        x = jnp.asarray(rng.normal(0, 1, (2, n, d)).astype(np.float32))
        gamma = jnp.asarray(rng.normal(1, 0.1, d).astype(np.float32))
        beta = jnp.asarray(rng.normal(0, 0.1, d).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.05, (d, dh)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(0, 0.02, dh).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.05, (dh, d)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(0, 0.02, d).astype(np.float32))
        gn = jnp.asarray(rng.normal(1, 0.1, d).astype(np.float32))
        bn = jnp.asarray(rng.normal(0, 0.1, d).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            y, yn = fused_ln_mlp(x, gamma, beta, w1, b1, w2, b2,
                                 ln_out=(gn, bn))
        y_want = _ref(x, gamma, beta, w1, b1, w2, b2)
        mu = jnp.mean(y_want, axis=-1, keepdims=True)
        yc = y_want - mu
        var = jnp.mean(yc * yc, axis=-1, keepdims=True)
        yn_want = yc * jax.lax.rsqrt(var + 1e-6) * gn + bn
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_want), atol=5e-5)
        np.testing.assert_allclose(np.asarray(yn), np.asarray(yn_want), atol=5e-5)


class TestServingLnChain:
    """ViTEncoder's serving LN chain (fuse_ln_chain): identical params and
    outputs to the unchained path. CPU exercises the wiring + eager
    fallbacks; kernel numerics are covered by TestLnOutEpilogue and the
    on-chip bench."""

    def _enc(self, chain: bool):
        import dataclasses
        from intentbev.configs import ViTBackboneConfig
        from intentbev.models.vit import ViTEncoder

        cfg = ViTBackboneConfig(
            embed_dim=64, depth=3, num_heads=2, patch_size=8,
            fuse_ln_chain=chain, fuse_ln_dense=False)
        return ViTEncoder(cfg=cfg, in_channels=3, use_flash=False)

    def test_params_and_outputs_match(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (2, 32, 40, 3)).astype(np.float32))
        enc_c = self._enc(True)
        enc_p = self._enc(False)
        v_c = enc_c.init(jax.random.key(0), x)       # deterministic init
        v_p = enc_p.init(jax.random.key(0), x)
        assert (jax.tree_util.tree_structure(v_c)
                == jax.tree_util.tree_structure(v_p))
        y_c = np.asarray(enc_c.apply(v_p, x, True))   # deterministic -> chain
        y_p = np.asarray(enc_p.apply(v_p, x, True))
        np.testing.assert_allclose(y_c, y_p, atol=2e-5)

    def test_train_path_unchained_and_differentiable(self, rng):
        x = jnp.asarray(rng.normal(0, 1, (1, 32, 40, 3)).astype(np.float32))
        enc = self._enc(True)
        v = enc.init(jax.random.key(0), x)

        def loss(v):
            y = enc.apply(v, x, False,                # train -> unchained
                          rngs={"dropout": jax.random.key(1)})
            return jnp.sum(y * y)

        g = jax.grad(loss)(v)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
