"""Int8 packed flash attention (serving/forward-only Pallas TPU kernel).

Same pair-blocked, transpose-free structure as ``flash_packed`` (two D=64
heads share one 128-lane panel; grid over (batch, head-pairs, row-blocks))
but with the score and value matmuls on the int8 MXU (394 TOPS on v5e —
measured 2.02x the bf16 peak on this chip):

- Q and K are quantized symmetrically PER TOKEN ROW per head (scales ride
  in [B, H, T_pad, 1] tensors, delivered to the kernel exactly like the
  bf16 kernel's logsumexp); the score tile is
  ``int32(q8 k8^T) * qscale_row * kscale_col * softmax_scale + key_bias``;
- V is quantized per (batch, head) — its scale must factor OUT of the
  P V^T sum, so it cannot be per-row — and enters through SMEM;
- the probability tile P in (0, 1] is quantized in-kernel with the fixed
  scale 127 (pq = round(P * 127)) and hits the MXU again for P V^T; the
  row denominator divides the int32 result in f32.

No VJP — training stays bf16 (quantization noise in gradients is not worth
it); this is the serving path behind ``ViTBackboneConfig.serving_int8``.
The reference has no quantized inference at all (torch fp32, model_vit.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _key_bias, _pad_len
from .flash_packed import BLOCK_Q_PK, LANE_BLOCK, _COMPILER_PARAMS, _heads_per_block


def _fwd_kernel_int8(sv_ref, q_ref, k_ref, v_ref, qs_ref, ks_ref, bias_ref,
                     o_ref, s_buf, *, heads_in_block: int, scale: float):
    # refs: sv [1,1,hp] f32 (per-head V scale, SMEM), q [1, BQ, 128] i8,
    # k/v [1, T_pad, 128] i8, qs [1, hp, BQ, 1] f32, ks [1, hp, T_pad, 1]
    # f32, bias [1, T_pad] f32, o [1, BQ, 128], s_buf scratch [BQ, T_pad].
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // heads_in_block
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        s32 = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        qs = qs_ref[0, h] * scale            # [BQ, 1]
        ks = ks_ref[0, h][:, 0][None, :]     # [1, T_pad]
        s_buf[:] = s32.astype(jnp.float32) * qs * ks + bias
        m = jnp.max(s_buf[:], axis=-1, keepdims=True)
        s_buf[:] = jnp.exp(s_buf[:] - m)
        denom = jnp.sum(s_buf[:], axis=-1, keepdims=True)
        pq = jnp.round(s_buf[:] * 127.0).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            pq, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        oh = o32.astype(jnp.float32) * (sv_ref[0, 0, h] / 127.0) / denom
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)


def _quantize_per_row(x: jnp.ndarray, num_heads: int):
    """[B, T, H*D] -> (int8 same shape, f32 row scales [B, H, T, 1])."""
    b, t, dm = x.shape
    dh = dm // num_heads
    x4 = x.reshape(b, t, num_heads, dh)
    absmax = jnp.max(jnp.abs(x4).astype(jnp.float32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0  # [B, T, H, 1]
    q = jnp.clip(jnp.round(x4.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q.reshape(b, t, dm), jnp.transpose(scale, (0, 2, 1, 3))


def _quantize_per_head(x: jnp.ndarray, num_heads: int):
    """[B, T, H*D] -> (int8 same shape, f32 head scales [B, H])."""
    b, t, dm = x.shape
    dh = dm // num_heads
    x4 = x.reshape(b, t, num_heads, dh)
    absmax = jnp.max(jnp.abs(x4).astype(jnp.float32), axis=(1, 3))
    scale = jnp.maximum(absmax, 1e-8) / 127.0  # [B, H]
    q = jnp.clip(
        jnp.round(x4.astype(jnp.float32) / scale[:, None, :, None]), -127, 127
    ).astype(jnp.int8)
    return q.reshape(b, t, dm), scale


def flash_attention_packed_int8(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    num_heads: int, seq_len: int | None = None,
) -> jnp.ndarray:
    """Int8 attention over Dense-layout [B, T, H*D]; output in q.dtype."""
    b, t, dm = q.shape
    dh = dm // num_heads
    hp = _heads_per_block(dh)
    assert num_heads % hp == 0, "head count must be pair-blockable"
    n_pairs = num_heads // hp
    scale = 1.0 / (dh ** 0.5)
    real_len = t if seq_len is None else int(seq_len)
    t_pad = _pad_len(t, BLOCK_Q_PK)

    q8, qs = _quantize_per_row(q, num_heads)
    k8, ks = _quantize_per_row(k, num_heads)
    v8, sv = _quantize_per_head(v, num_heads)
    sv = sv.reshape(b, n_pairs, hp)

    def prep(x):
        if t_pad != t:
            return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    def prep_scale(s):  # [B, H, T, 1]
        if t_pad != t:
            return jnp.pad(s, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        return s

    q8, k8, v8 = prep(q8), prep(k8), prep(v8)
    qs, ks = prep_scale(qs), prep_scale(ks)
    bias = _key_bias(t_pad, real_len)
    nq = t_pad // BLOCK_Q_PK
    o = pl.pallas_call(
        functools.partial(_fwd_kernel_int8, heads_in_block=hp, scale=scale),
        grid=(b, n_pairs, nq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, 1, hp), lambda i, p, j: (i, p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLOCK_Q_PK, LANE_BLOCK), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, LANE_BLOCK), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, LANE_BLOCK), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, BLOCK_Q_PK, 1), lambda i, p, j: (i, p, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, t_pad, 1), lambda i, p, j: (i, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, BLOCK_Q_PK, LANE_BLOCK), lambda i, p, j: (i, j, p),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, dm), q.dtype),
        scratch_shapes=[pltpu.VMEM((BLOCK_Q_PK, t_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * t_pad * dm,
            bytes_accessed=b * t_pad * dm * 3,
            transcendentals=b * t_pad * t_pad * num_heads,
        ),
    )(sv, q8, k8, v8, qs, ks, bias)
    return o[:, :t, :]
