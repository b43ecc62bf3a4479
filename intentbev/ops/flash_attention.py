"""Pallas TPU flash attention (forward + custom-VJP backward).

Replaces timm's dense MHSA — which materialises the full T x T attention
matrix in HBM per head (reference model_vit.py:119; T = 4501 tokens per
stream) — with blockwise kernels: HBM traffic is O(T * D) per head, the
T x T score tile only ever lives in VMEM, and the MXU sees large
[BLOCK_Q, D] x [D, T] matmuls.

Geometry for the flagship ViT-S/8 at 400x720: T = 4501 -> padded to 4608
(36 x 128 lanes), D = head_dim = 64. At this size a whole K (or Q) panel
for one (batch, head) is 4608 x 64 x 2B ~ 0.6 MB bf16, so each kernel
keeps the full opposite-side panel resident in VMEM and blocks only over
its own rows — a "panel-resident" flash variant that needs no running
max/denominator loop while keeping the same O(T) memory guarantee.

VPU economy: the softmax scale is folded into Q outside the kernel (one
pass over a [T, 64] tile instead of [T, T]), and the padded-key mask is a
precomputed additive bias row (one broadcast add instead of
iota+compare+select over the score tile).

Backward uses the standard flash recomputation:
  P = exp(S - L); dP = dO V^T; dS = P * (dP - delta); delta = rowsum(dO * O)
  dQ = dS K ; dK = dS^T Q ; dV = P^T dO     (scale folded into Q/dQ)
split into a dQ kernel (blocked over Q rows) and a dK/dV kernel (blocked
over K rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic import kernel_params

# VMEM limit + optional megacore dimension_semantics (see ops/mosaic.py);
# all grids here are (batch*head, row/key-block) — fully parallel.
_COMPILER_PARAMS = kernel_params(2)

BLOCK_Q = 512        # forward q-block
BLOCK_Q_BWD = 256    # backward dq q-block (f32 score tiles, tighter VMEM)
BLOCK_K_BWD = 256    # backward dk/dv k-block
_NEG_INF = -1e30


def _pad_len(t: int, block: int) -> int:
    return ((t + block - 1) // block) * block


def _key_bias(t_pad: int, seq_len: int) -> jnp.ndarray:
    """f32[1, t_pad]: 0 for real positions, -inf for the padded tail."""
    import numpy as np

    bias = np.zeros((1, t_pad), dtype=np.float32)
    bias[0, seq_len:] = _NEG_INF
    return jnp.asarray(bias)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref):
    q = q_ref[0]  # [BLOCK_Q, D] (pre-scaled)
    k = k_ref[0]  # [T_pad, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BLOCK_Q, T_pad]
    s = s + bias_ref[0]  # masks padded keys
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)
    l_ref[0] = (m + jnp.log(denom))  # logsumexp per row, [BLOCK_Q, 1]


def _fwd(q3, k3, v3, seq_len: int):
    """q3 (pre-scaled)/k3/v3: [BH, T_pad, D]. Returns (o3, lse)."""
    bh, t_pad, d = q3.shape
    nq = t_pad // BLOCK_Q
    bias = _key_bias(t_pad, seq_len)
    out_shape = (
        jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
        jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
    )
    o3, lse = pl.pallas_call(
        _fwd_kernel,
        grid=(bh, nq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=bh * t_pad * d * 2 * 4,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(q3, k3, v3, bias)
    return o3, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, bias_ref,
                   dq_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = l_ref[0]        # [BLOCK_Q, 1]
    delta = delta_ref[0]  # [BLOCK_Q, 1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias_ref[0]
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref,
                    dk_ref, dv_ref):
    q = q_ref[0]          # [T_pad, D] (full, pre-scaled)
    k = k_ref[0]          # [BLOCK_K, D]
    v = v_ref[0]
    do = do_ref[0]        # [T_pad, D]
    lse = l_ref[0][:, 0]        # [T_pad]
    delta = delta_ref[0][:, 0]
    # S^T tile: [BLOCK_K, T_pad] = K Q^T. No query-axis mask: every query
    # row (padded ones included) produces a forward output, so all columns
    # legitimately contribute to dK/dV whenever their dO is nonzero. The
    # KEY-axis mask (rows >= seq_len, whose forward contribution was zeroed
    # by the -inf key bias) is applied after the pallas_call by zeroing the
    # padded dk/dv rows — exp(S^T - lse) for those rows is O(1) nonzero
    # here, so they MUST be discarded outside.
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pt = jnp.exp(st - lse[None, :])          # P^T [BLOCK_K, T_pad]
    # dV = P^T dO
    dv = jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP^T = V dO^T ; dS^T = P^T * (dP^T - delta^T)
    dpt = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dst = pt * (dpt - delta[None, :])
    dk = jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(seq_len: int, res, g):
    q3, k3, v3, o3, lse = res
    do3 = g[0] if isinstance(g, tuple) else g
    bh, t_pad, d = q3.shape
    delta = jnp.sum(do3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1,
                    keepdims=True)
    bias = _key_bias(t_pad, seq_len)

    bq = BLOCK_Q_BWD
    nq = t_pad // bq
    dq = pl.pallas_call(
        _bwd_dq_kernel,
        grid=(bh, nq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
    )(q3, k3, v3, do3, lse, delta, bias)

    bk = BLOCK_K_BWD
    nk = t_pad // bk
    dk, dv = pl.pallas_call(
        _bwd_dkv_kernel,
        grid=(bh, nk),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v3.dtype),
        ),
    )(q3, k3, v3, do3, lse, delta)
    if seq_len < t_pad:
        # Padded KEY rows were masked (-inf) in the forward: their true
        # gradient is exactly zero, but the dkv kernel computes garbage for
        # them (see _bwd_dkv_kernel docnote). seq_len is static, so this is
        # a cheap fused update.
        dk = dk.at[:, seq_len:].set(0)
        dv = dv.at[:, seq_len:].set(0)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash3(q3, k3, v3, seq_len: int):
    o3, _ = _fwd(q3, k3, v3, seq_len)
    return o3


def _flash3_fwd(q3, k3, v3, seq_len: int):
    o3, lse = _fwd(q3, k3, v3, seq_len)
    return o3, (q3, k3, v3, o3, lse)


_flash3.defvjp(_flash3_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, seq_len: int | None = None
) -> jnp.ndarray:
    """softmax(QK^T / sqrt(D)) V over [B, H, T, D] via Pallas TPU kernels.

    ``seq_len``: number of real (unpadded) tokens; keys beyond it are
    masked. When T is already a multiple of the block size (caller pre-pads
    once for the whole encoder) no pad/slice copies happen here.
    """
    b, h, t, d = q.shape
    scale = 1.0 / (d ** 0.5)
    real_len = t if seq_len is None else int(seq_len)
    t_pad = _pad_len(t, BLOCK_Q)

    def prep(x):
        x3 = x.reshape(b * h, t, d)
        if t_pad != t:
            x3 = jnp.pad(x3, ((0, 0), (0, t_pad - t), (0, 0)))
        return x3

    # Fold the softmax scale into q: one VPU pass over a [T, D] tile instead
    # of the [T, T] score tile; autodiff of this multiply restores the scale
    # factor in dq automatically.
    q_scaled = q * jnp.asarray(scale, dtype=q.dtype)
    o3 = _flash3(prep(q_scaled), prep(k), prep(v), real_len)
    return o3[:, :t, :].reshape(b, h, t, d)
