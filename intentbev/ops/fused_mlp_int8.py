"""Fused W8A8 Pallas transformer MLP (serving/forward-only).

The unfused int8 MLP (two ``ops.int8.int8_dense`` calls) is SLOWER than the
fused bf16 kernel (``ops.fused_mlp``): it re-materialises the [rows, 4D]
hidden activation in HBM and runs the exact-erf GELU as a separate f32
elementwise pass — measured +37 ms/step on the flagship twin ViT. This
kernel keeps the whole int8 pipeline in VMEM per row-block:

    xq  = quantize_rows(x)              (in-kernel, symmetric per-token)
    g   = (xq @ w1q) * xs * s1 + b1     (int8 MXU, f32 rescale)
    h   = gelu(g)                       (exact erf, f32, in VMEM)
    hq  = quantize_rows(h)
    y   = (hq @ w2q) * hs * s2 + b2     (int8 MXU)
    out = y * gate + residual

Weights are pre-quantized OUTSIDE (symmetric per-output-channel,
``ops.int8.quantize_cols``) — XLA computes them once per forward from the
bf16 params; they are tiny next to the activations.

No VJP — training stays bf16 (``ops.fused_mlp``); this is the serving path
behind ``ViTBackboneConfig.serving_int8``. The reference has no quantized
inference at all (torch fp32, model_vit.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _COMPILER_PARAMS, _gelu
from .int8 import quantize_cols

BLOCK_ROWS_MLP_I8 = 256


def _pad_rows(n: int) -> int:
    return ((n + BLOCK_ROWS_MLP_I8 - 1) // BLOCK_ROWS_MLP_I8) * BLOCK_ROWS_MLP_I8


def _fwd_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                res_ref, gate_ref, y_ref):
    x = x_ref[:].astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    g = jax.lax.dot_general(
        xq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    g = g * xs * s1_ref[:] + b1_ref[:].astype(jnp.float32)
    h = _gelu(g)
    hs = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True), 1e-8) / 127.0
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        hq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * hs * s2_ref[:] + b2_ref[:].astype(jnp.float32)
    y_ref[:] = (y * gate_ref[:] + res_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def fused_mlp_int8(x, w1, b1, w2, b2, residual, gate=None):
    """y = gate * (gelu(x W1 + b1) W2 + b2) + residual, W8A8 on the int8 MXU.

    Same contract as ``ops.fused_mlp.fused_mlp``; forward-only.
    """
    shape = x.shape
    d = shape[-1]
    dh = w1.shape[1]
    x2 = x.reshape(-1, d)
    r2 = residual.reshape(-1, d)
    n = x2.shape[0]
    if gate is None:
        gate2 = jnp.ones((n, 1), jnp.float32)
    else:
        gate2 = jnp.broadcast_to(
            gate.astype(jnp.float32)[..., None], shape[:-1] + (1,)
        ).reshape(n, 1)
    n_pad = _pad_rows(n)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
        r2 = jnp.pad(r2, ((0, n_pad - n), (0, 0)))
        gate2 = jnp.pad(gate2, ((0, n_pad - n), (0, 0)))

    w1q, s1 = quantize_cols(w1)
    w2q, s2 = quantize_cols(w2)
    nb = n_pad // BLOCK_ROWS_MLP_I8
    R = BLOCK_ROWS_MLP_I8
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d * dh,
            bytes_accessed=2 * n_pad * d * 2 + 2 * d * dh,
            transcendentals=n_pad * dh,
        ),
    )(x2, w1q, s1, b1.reshape(1, -1).astype(jnp.float32), w2q, s2,
      b2.reshape(1, -1).astype(jnp.float32), r2, gate2)
    return y[:n].reshape(shape)
