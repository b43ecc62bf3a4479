"""Packed (transpose-free) Pallas flash attention over [B, T, H*D] tensors.

The BHTD kernels in ``flash_attention.py`` require physically transposing
Q/K/V from the Dense output layout [B, T, H*D] to [B, H, T, D] — profiled
at ~16 ms/step of pure copies on the full twin-ViT. These kernels consume
the Dense layout directly: each program owns one batch element's row-block
and loops over the heads with static lane slices, so the only data
movement around attention is the qkv split (contiguous channel chunks).

Same panel-resident design as flash_attention.py: full K/V (or Q/dO)
panels for one batch element live in VMEM ([T_pad, H*D] bf16 ~ 3.5 MB at
flagship geometry), row-blocks kept small enough that the per-head f32
score tile fits beside them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _key_bias, _pad_len

# Row-block sizes sized to VMEM: a full K/V (or Q/dO) panel pair for one
# batch element is ~7 MB bf16 at flagship geometry, and each resident f32
# score tile costs BLOCK * 4608 * 4 B.
BLOCK_Q_PK = 128      # fwd row-block (2 tiles live: ~12 MB total)
BLOCK_BWD_PK = 64     # bwd row-blocks (4 tiles live: ~12 MB total)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref,
                *, num_heads: int, scale: float):
    q = q_ref[0]  # [BQ, H*D]
    k = k_ref[0]  # [T_pad, H*D]
    v = v_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl] * jnp.asarray(scale, q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)
        l_ref[0, :, h] = (m + jnp.log(denom))[:, 0]


def _fwd(q3, k3, v3, num_heads: int, scale: float, seq_len: int):
    b, t_pad, dm = q3.shape
    nq = t_pad // BLOCK_Q_PK
    bias = _key_bias(t_pad, seq_len)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q_PK, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dm), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dm), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q_PK, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q_PK, num_heads), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dm), q3.dtype),
            jax.ShapeDtypeStruct((b, t_pad, num_heads), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * t_pad * dm,
            bytes_accessed=b * t_pad * dm * 2 * 4,
            transcendentals=b * t_pad * t_pad * num_heads,
        ),
    )(q3, k3, v3, bias)
    return o, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, bias_ref,
                   dq_ref, *, num_heads: int, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            (q[:, sl] * jnp.asarray(scale, q.dtype)), k[:, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        s = s + bias
        p = jnp.exp(s - l_ref[0, :, h][:, None])
        dp = jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, :, h][:, None])
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, bias_ref,
                    dk_ref, dv_ref, *, num_heads: int, scale: float):
    q = q_ref[0]          # [T_pad, H*D] full panel
    k = k_ref[0]          # [BK, H*D]
    v = v_ref[0]
    do = do_ref[0]        # [T_pad, H*D]
    bias = bias_ref[0]    # masks padded QUERY columns
    dh = q.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        st = jax.lax.dot_general(
            k[:, sl], (q[:, sl] * jnp.asarray(scale, q.dtype)),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        st = st + bias
        pt = jnp.exp(st - l_ref[0, :, h][None, :])
        dv = jax.lax.dot_general(
            pt.astype(do.dtype), do[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v[:, sl], do[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dst = pt * (dpt - delta_ref[0, :, h][None, :])
        dk = jax.lax.dot_general(
            dst.astype(q.dtype), q[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # note: q panel is unscaled here; scale applied below
        dk_ref[0, :, sl] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _bwd(num_heads: int, scale: float, seq_len: int, res, g):
    q3, k3, v3, o3, lse = res
    do3 = g[0] if isinstance(g, tuple) else g
    b, t_pad, dm = q3.shape
    dh = dm // num_heads
    # delta per head: rowsum over that head's channels
    delta = jnp.sum(
        (do3.astype(jnp.float32) * o3.astype(jnp.float32)).reshape(
            b, t_pad, num_heads, dh
        ),
        axis=-1,
    )  # [B, T_pad, H]
    bias = _key_bias(t_pad, seq_len)

    bq = BLOCK_BWD_PK
    nq = t_pad // bq
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, num_heads=num_heads, scale=scale),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, bq, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dm), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dm), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, num_heads), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, num_heads), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, dm), q3.dtype),
    )(q3, k3, v3, do3, lse, delta, bias)

    nk = t_pad // bq
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, num_heads=num_heads, scale=scale),
        grid=(b, nk),
        in_specs=[
            pl.BlockSpec((1, t_pad, dm), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dm), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, num_heads), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, num_heads), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dm), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dm), k3.dtype),
            jax.ShapeDtypeStruct((b, t_pad, dm), v3.dtype),
        ),
    )(q3, k3, v3, do3, lse, delta, bias)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_packed(q3, k3, v3, num_heads: int, scale: float, seq_len: int):
    o, _ = _fwd(q3, k3, v3, num_heads, scale, seq_len)
    return o


def _fp_fwd(q3, k3, v3, num_heads, scale, seq_len):
    o, lse = _fwd(q3, k3, v3, num_heads, scale, seq_len)
    return o, (q3, k3, v3, o, lse)


_flash_packed.defvjp(_fp_fwd, _bwd)


def flash_attention_packed(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    num_heads: int, seq_len: int | None = None,
) -> jnp.ndarray:
    """Attention over Dense-layout [B, T, H*D] tensors; no transposes."""
    b, t, dm = q.shape
    dh = dm // num_heads
    scale = 1.0 / (dh ** 0.5)
    real_len = t if seq_len is None else int(seq_len)
    t_pad = _pad_len(t, BLOCK_Q_PK)

    def prep(x):
        if t_pad != t:
            return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    o = _flash_packed(prep(q), prep(k), prep(v), num_heads, scale, real_len)
    return o[:, :t, :]
