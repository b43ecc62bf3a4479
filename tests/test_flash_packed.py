"""Packed (transpose-free) flash attention vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from intentbev.ops.attention import reference_attention
from intentbev.ops.flash_packed import flash_attention_packed


def _packed_via_reference(q, k, v, num_heads):
    b, t, dm = q.shape
    dh = dm // num_heads

    def to_bhtd(x):
        return jnp.transpose(x.reshape(b, t, num_heads, dh), (0, 2, 1, 3))

    o = reference_attention(to_bhtd(q), to_bhtd(k), to_bhtd(v))
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(b, t, dm)


class TestPackedForward:
    @pytest.mark.parametrize("t", [256, 300, 700])
    def test_matches_reference(self, rng, t):
        b, h, dh = 2, 4, 64
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention_packed(q, k, v, h))
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_seq_len_mask_prepadded(self, rng):
        """Pre-padded input + seq_len must equal unpadded attention."""
        b, h, dh, t = 1, 2, 64, 200
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        qp = jnp.pad(q, ((0, 0), (0, 312), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 312), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 312), (0, 0)))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention_packed(qp, kp, vp, h, seq_len=t))[:, :t]
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_six_heads_wide_lane_block(self, rng):
        """dm=384 (flagship ViT-S layout) takes the FWD_LANE_BLOCK=384 path:
        all 6 heads unrolled in one program over the shared score scratch."""
        b, h, dh, t = 1, 6, 64, 300
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention_packed(q, k, v, h, seq_len=t))
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_twelve_heads_two_lane_blocks(self, rng):
        """dm=768 (n_pairs=2): two FWD_LANE_BLOCK=384 head groups per batch
        row, exercising the non-trivial head-group index map. Interpret mode
        validates indexing/math only — Mosaic lane/layout constraints of the
        384-lane block are covered on real hardware by bench.py / the v5e
        runs logged in docs/PERF.md."""
        b, h, dh, t = 1, 12, 64, 300
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention_packed(q, k, v, h, seq_len=t))
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPackedFallback:
    def test_odd_head_count_falls_back(self, rng):
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu
        b, h, dh, t = 1, 3, 64, 256
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(flash_attention_packed(q, k, v, h))
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPackedBackward:
    def test_grads_match_reference(self, rng):
        b, h, dh, t = 1, 2, 64, 300
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))

        def loss_packed(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(flash_attention_packed(q, k, v, h)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(_packed_via_reference(q, k, v, h)))

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

    def test_grads_prepadded_block_aligned(self, rng):
        """seq_len < T with T already block-aligned (the flagship regime).

        T = 768 = lcm(BLOCK_Q_PK, BLOCK_BWD_PK) means no internal pad/slice
        happens, so the kernels' own outputs ARE the gradients: padded KEY
        rows of dk/dv must be exactly zero and real rows must match the
        dense oracle even when dO is nonzero on padded QUERY rows (the loss
        below sums over ALL T rows on purpose).
        """
        b, h, dh, t, real = 1, 2, 64, 768, 700
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))

        def loss_packed(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(flash_attention_packed(q, k, v, h, seq_len=real)))

        def loss_ref(q, k, v):
            def to_bhtd(x):
                return jnp.transpose(x.reshape(b, t, h, dh), (0, 2, 1, 3))
            o = reference_attention(to_bhtd(q), to_bhtd(k), to_bhtd(v), kv_len=real)
            return jnp.sum(jnp.sin(jnp.transpose(o, (0, 2, 1, 3)).reshape(b, t, dm)))

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        names = ["dq", "dk", "dv"]
        for name, a, b_ in zip(names, gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, err_msg=name)
        # masked keys must get EXACTLY zero gradient
        assert np.all(np.asarray(gp[1])[:, real:] == 0.0)
        assert np.all(np.asarray(gp[2])[:, real:] == 0.0)


class TestChunkedForward:
    """Online-softmax chunked forward vs the monolithic kernel/reference."""

    @pytest.mark.parametrize("t,chunk", [(256, 128), (768, 256), (300, 128)])
    def test_matches_reference(self, rng, t, chunk):
        import intentbev.ops.flash_packed as fp
        b, h, dh = 1, 6, 64
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        old = fp.FWD_KV_CHUNK
        fp.FWD_KV_CHUNK = chunk
        try:
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(fp.flash_attention_packed(q, k, v, h, seq_len=t))
        finally:
            fp.FWD_KV_CHUNK = old
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_grads_flow_through_chunked_forward(self, rng):
        """The custom VJP's backward consumes the chunked forward's lse."""
        import intentbev.ops.flash_packed as fp
        b, h, dh, t = 1, 2, 64, 256
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        old = fp.FWD_KV_CHUNK
        fp.FWD_KV_CHUNK = 128
        try:
            def loss(q, k, v):
                with pltpu.force_tpu_interpret_mode():
                    return jnp.sum(jnp.sin(fp.flash_attention_packed(q, k, v, h)))
            with pltpu.force_tpu_interpret_mode():
                gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fp.FWD_KV_CHUNK = old
        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(_packed_via_reference(q, k, v, h)))
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


class TestUnsafeSoftmax:
    """FWD_UNSAFE_SOFTMAX (fixed-max) forward: exact for range-bounded
    scores, in both monolithic and chunked kernels, including the padded-key
    -1e30 bias path and the lse handed to the (unchanged) backward."""

    @pytest.mark.parametrize("chunk", [0, 128])
    def test_matches_reference(self, rng, chunk):
        import intentbev.ops.flash_packed as fp
        b, h, dh, t = 1, 6, 64, 300  # t < t_pad -> padded-key bias active
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        old_c, old_u = fp.FWD_KV_CHUNK, fp.FWD_UNSAFE_SOFTMAX
        fp.FWD_KV_CHUNK, fp.FWD_UNSAFE_SOFTMAX = chunk, True
        try:
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(fp.flash_attention_packed(q, k, v, h, seq_len=t))
        finally:
            fp.FWD_KV_CHUNK, fp.FWD_UNSAFE_SOFTMAX = old_c, old_u
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=3e-5)

    def test_lse_feeds_backward(self, rng):
        """The unsafe forward's lse = log(sum exp(s)) is the same quantity
        the safe path stores (m + log sum exp(s-m)); gradients must match
        the reference."""
        import intentbev.ops.flash_packed as fp
        b, h, dh, t = 1, 2, 64, 256
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        old_u = fp.FWD_UNSAFE_SOFTMAX
        fp.FWD_UNSAFE_SOFTMAX = True
        try:
            def loss(q, k, v):
                with pltpu.force_tpu_interpret_mode():
                    return jnp.sum(jnp.sin(fp.flash_attention_packed(q, k, v, h)))
            with pltpu.force_tpu_interpret_mode():
                gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fp.FWD_UNSAFE_SOFTMAX = old_u
        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(_packed_via_reference(q, k, v, h)))
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


class TestChunkedVariants:
    """Env-gated chunked-unsafe forward variants (pipeline lookahead,
    exp2-folded scores) are exact vs the reference path."""

    @pytest.mark.parametrize("pipeline,exp2", [(True, False), (False, True),
                                               (True, True)])
    def test_matches_reference(self, rng, pipeline, exp2):
        import intentbev.ops.flash_packed as fp
        b, h, dh, t = 1, 6, 64, 300   # t < t_pad -> padded-key bias active
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        old = (fp.FWD_PIPELINE, fp.FWD_EXP2)
        fp.FWD_PIPELINE, fp.FWD_EXP2 = pipeline, exp2
        try:
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(fp.flash_attention_packed(
                    q, k, v, h, seq_len=t, kv_chunk=128, unsafe_softmax=True))
        finally:
            fp.FWD_PIPELINE, fp.FWD_EXP2 = old
        want = np.asarray(_packed_via_reference(q, k, v, h))
        np.testing.assert_allclose(got, want, atol=3e-5)


class TestChunkedBackward:
    """BWD_KV_CHUNK tiled dq/dkv kernels vs the dense oracle (exact path:
    the backward has no softmax-safety tradeoff — tiling only reorders f32
    partial sums)."""

    @pytest.mark.parametrize("t,chunk", [(256, 128), (768, 256)])
    def test_grads_match_reference(self, rng, t, chunk):
        import intentbev.ops.flash_packed as fp
        b, h, dh = 1, 2, 64
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        old = fp.BWD_KV_CHUNK
        fp.BWD_KV_CHUNK = chunk
        try:
            def loss(q, k, v):
                with pltpu.force_tpu_interpret_mode():
                    return jnp.sum(jnp.sin(fp.flash_attention_packed(q, k, v, h)))
            with pltpu.force_tpu_interpret_mode():
                gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fp.BWD_KV_CHUNK = old

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(_packed_via_reference(q, k, v, h)))

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        names = ["dq", "dk", "dv"]
        for name, a, b_ in zip(names, gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, err_msg=name)

    def test_grads_prepadded_masked_keys_zero(self, rng):
        """seq_len < T: padded KEY rows still get exactly-zero dk/dv, and
        real rows match, with the chunked kernels active."""
        import intentbev.ops.flash_packed as fp
        b, h, dh, t, real = 1, 2, 64, 768, 700
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        old = fp.BWD_KV_CHUNK
        fp.BWD_KV_CHUNK = 256
        try:
            def loss(q, k, v):
                with pltpu.force_tpu_interpret_mode():
                    return jnp.sum(jnp.sin(
                        fp.flash_attention_packed(q, k, v, h, seq_len=real)))
            with pltpu.force_tpu_interpret_mode():
                gp = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fp.BWD_KV_CHUNK = old

        def loss_ref(q, k, v):
            def to_bhtd(x):
                return jnp.transpose(x.reshape(b, t, h, dh), (0, 2, 1, 3))
            o = reference_attention(to_bhtd(q), to_bhtd(k), to_bhtd(v), kv_len=real)
            return jnp.sum(jnp.sin(jnp.transpose(o, (0, 2, 1, 3)).reshape(b, t, dm)))

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip(["dq", "dk", "dv"], gp, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, err_msg=name)
        assert np.all(np.asarray(gp[1])[:, real:] == 0.0)
        assert np.all(np.asarray(gp[2])[:, real:] == 0.0)


class TestFusedBackward:
    """One-pass fused dq/dk/dv kernel (BWD_FUSED) vs the split kernels."""

    def test_fused_matches_split(self, rng):
        import intentbev.ops.flash_packed as fp
        b, h, dh, t, real = 1, 2, 64, 768, 700
        dm = h * dh
        q = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (b, t, dm)).astype(np.float32))

        def loss(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(jnp.sin(
                    fp.flash_attention_packed(q, k, v, h, seq_len=real)))

        old = fp.BWD_FUSED
        try:
            fp.BWD_FUSED = True
            with pltpu.force_tpu_interpret_mode():
                gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            fp.BWD_FUSED = False
            with pltpu.force_tpu_interpret_mode():
                gs = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        finally:
            fp.BWD_FUSED = old
        for name, a, b_ in zip(["dq", "dk", "dv"], gf, gs):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-5, err_msg=name)
        # padded keys exactly zero through the fused path too
        assert np.all(np.asarray(gf[1])[:, real:] == 0.0)
        assert np.all(np.asarray(gf[2])[:, real:] == 0.0)
