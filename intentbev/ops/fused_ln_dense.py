"""Fused Pallas LayerNorm + Dense: y = LN(x)*gamma+beta @ W + b [+ GELU].

Round-2 profile (docs/PERF.md): after norm2 was folded into the MLP block
tail (ops/fused_ln_mlp), ~6 ms/step of STANDALONE Pallas LayerNorm remained
— norm1 before every qkv projection (24 calls) plus the adapter norms. A
standalone LN is pure HBM traffic (read x, write xn, then the consumer
dense reads xn again: 3 activation passes); folding the LN into the
consumer matmul's input load makes HBM see x once and the dense output
once, with the LN arithmetic hidden under the MXU contraction.

Used for:
- the qkv projection: qkv = LN(x) @ Wqkv + bqkv    (models/vit.py Attention)
- the stream adapters: a = gelu(LN(x) @ Wa + ba)   (models/vit.py backbone,
  reference model_vit.py:82-83 "LayerNorm -> Linear -> GELU")

Backward (custom VJP, recompute per row-block; dW/db accumulate across the
sequential row grid in one revisited VMEM block like ops/fused_mlp.py):
    xhat, inv, xn = LN(x);  g = xn W + b;  y = gelu? (g)
    dg   = dy * gelu'(g)           (or dy)
    dW  += xn^T dg ; db += sum dg
    dxn  = dg W^T
    dgamma += sum dxn * xhat ; dbeta += sum dxn
    dyg  = dxn * gamma
    dx   = inv * (dyg - mean(dyg) - xhat * mean(dyg * xhat))
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import (_COMPILER_PARAMS, _COMPILER_PARAMS_SEQ, _dgelu,
                        _gelu, _require_exact_gelu_for_grad)

BLOCK_ROWS_LND = 256


def _pad_rows(n: int) -> int:
    return ((n + BLOCK_ROWS_LND - 1) // BLOCK_ROWS_LND) * BLOCK_ROWS_LND


def _ln(x, g_ref, b_ref, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    xn = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    return xhat, inv, xn


def _fwd_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, y_ref, *,
                eps: float, gelu: bool):
    x = x_ref[:].astype(jnp.float32)
    _, _, xn = _ln(x, g_ref, b_ref, eps)
    y = jax.lax.dot_general(
        xn.astype(x_ref.dtype), w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    if gelu:
        y = _gelu(y)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd(x2, gamma, beta, w, bias, eps, gelu):
    n, d = x2.shape
    dout = w.shape[1]
    R = BLOCK_ROWS_LND
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, gelu=gelu),
        grid=(n // R,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, dout), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * dout,
            bytes_accessed=n * d * 2 + n * dout * 2 + d * dout * 2,
            transcendentals=n * dout if gelu else 0,
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d), w, bias.reshape(1, -1))


def _bwd_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, dy_ref,
                dx_ref, dgamma_ref, dbeta_ref, dw_ref, dbias_ref, *,
                eps: float, gelu: bool):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    x = x_ref[:].astype(jnp.float32)
    xhat, inv, xn = _ln(x, g_ref, b_ref, eps)
    xn_lp = xn.astype(x_ref.dtype)
    dy = dy_ref[:].astype(jnp.float32)
    if gelu:
        g = jax.lax.dot_general(
            xn_lp, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[:].astype(jnp.float32)
        dg = dy * _dgelu(g)
    else:
        dg = dy
    dw_ref[:] += jax.lax.dot_general(
        xn_lp, dg.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbias_ref[:] += jnp.sum(dg, axis=0, keepdims=True)
    dxn = jax.lax.dot_general(
        dg.astype(x_ref.dtype), w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgamma_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dbeta_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dyg = dxn * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (inv * (dyg - m1 - xhat * m2)).astype(dx_ref.dtype)


def _bwd_call(x2, gamma, beta, w, bias, dy2, eps, gelu):
    n, d = x2.shape
    dout = w.shape[1]
    R = BLOCK_ROWS_LND
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    dx, dgamma, dbeta, dw, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, gelu=gelu),
        grid=(n // R,),
        compiler_params=_COMPILER_PARAMS_SEQ,
        in_specs=[
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, dout), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dout), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, dout), jnp.float32),
            jax.ShapeDtypeStruct((1, dout), jnp.float32),
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d), w, bias.reshape(1, -1), dy2)
    return dx, dgamma[0], dbeta[0], dw, dbias[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_ln_dense2(x2, gamma, beta, w, bias, eps, gelu):
    return _fwd(x2, gamma, beta, w, bias, eps, gelu)


def _fld_fwd(x2, gamma, beta, w, bias, eps, gelu):
    if gelu:
        _require_exact_gelu_for_grad()
    y = _fwd(x2, gamma, beta, w, bias, eps, gelu)
    return y, (x2, gamma, beta, w, bias)


def _fld_bwd(eps, gelu, res, dy):
    x2, gamma, beta, w, bias = res
    dx, dgamma, dbeta, dw, dbias = _bwd_call(x2, gamma, beta, w, bias, dy, eps, gelu)
    return (
        dx,
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        dw.astype(w.dtype),
        dbias.astype(bias.dtype),
    )


_fused_ln_dense2.defvjp(_fld_fwd, _fld_bwd)


def fused_ln_dense(x, gamma, beta, w, bias, eps: float = 1e-6,
                   gelu: bool = False):
    """y = [gelu]( (LN(x)*gamma + beta) @ w + bias ) over x[..., D].

    ``w`` [D, Dout]; output [..., Dout] in x.dtype. f32 row statistics.
    """
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    n_pad = _pad_rows(n)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    y = _fused_ln_dense2(x2, gamma, beta, w, bias, eps, gelu)
    return y[:n].reshape(shape[:-1] + (w.shape[1],))
