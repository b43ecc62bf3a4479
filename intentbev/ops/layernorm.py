"""Fused Pallas LayerNorm for TPU (forward + custom-VJP backward).

XLA lowers each LayerNorm over [*, D] activations into convert+reduce
fusions that profiled at ~0.5 ms per call on the full twin-ViT shapes
(~26 ms/step across the ~52 LN call sites) — an order of magnitude over
the read+write bandwidth bound. This kernel reads a bf16 row-block once,
computes mean/variance in f32 on-chip, and writes bf16 once.

Backward (standard LN gradients, row-wise):
  xhat = (x - mu) * inv
  dbeta  = sum_rows dy            dgamma = sum_rows dy * xhat
  dx = inv * (dy*g - mean(dy*g) - xhat * mean(dy*g*xhat))
dgamma/dbeta accumulate per row-block into partial sums that are reduced
outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic import kernel_params

# VMEM limit + optional megacore dimension_semantics (see ops/mosaic.py);
# all grids here are 1-D over independent row blocks.
_COMPILER_PARAMS = kernel_params(1)

BLOCK_ROWS = 1024


def _pad_rows(n: int) -> int:
    return ((n + BLOCK_ROWS - 1) // BLOCK_ROWS) * BLOCK_ROWS


def _fwd_infer_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    # Inference-only forward: y alone. The residual-producing kernel below
    # also writes xhat (a full-size bf16 tensor) for the backward — unused
    # outputs of a pallas_call are NOT dead-code-eliminated by XLA, so the
    # serving path was paying a 3rd full-tensor HBM stream for nothing.
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = xc * inv * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, xhat_ref, inv_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    y = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    xhat_ref[:] = xhat.astype(xhat_ref.dtype)
    inv_ref[:] = inv


def _bwd_kernel(dy_ref, xhat_ref, inv_ref, g_ref, dx_ref, dg_ref, db_ref):
    dy = dy_ref[:].astype(jnp.float32)
    xhat = xhat_ref[:].astype(jnp.float32)
    inv = inv_ref[:]
    g = g_ref[:].astype(jnp.float32)
    dyg = dy * g
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx = inv * (dyg - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dg_ref[0] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[0] = jnp.sum(dy, axis=0, keepdims=True)


def _fwd_infer(x2, gamma, beta, eps: float):
    n, d = x2.shape
    return pl.pallas_call(
        functools.partial(_fwd_infer_kernel, eps=eps),
        grid=(n // BLOCK_ROWS,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d))


def _fwd(x2, gamma, beta, eps: float):
    n, d = x2.shape
    grid = (n // BLOCK_ROWS,)
    y, xhat, inv = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d))
    return y, xhat, inv


def _bwd_call(dy2, xhat, inv, gamma):
    n, d = dy2.shape
    nb = n // BLOCK_ROWS
    dx, dg_part, db_part = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), dy2.dtype),
            jax.ShapeDtypeStruct((nb, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, d), jnp.float32),
        ),
    )(dy2, xhat, inv, gamma.reshape(1, d))
    return dx, jnp.sum(dg_part, axis=(0, 1)), jnp.sum(db_part, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm_2d(x2, gamma, beta, eps: float = 1e-6):
    """LayerNorm over the last dim of x2 [N, D]; N must be a multiple of
    BLOCK_ROWS (use :func:`fused_layernorm` for arbitrary shapes)."""
    # primal (not being differentiated): inference kernel, no residuals
    return _fwd_infer(x2, gamma, beta, eps)


def _fl_fwd(x2, gamma, beta, eps):
    y, xhat, inv = _fwd(x2, gamma, beta, eps)
    return y, (xhat, inv, gamma)


def _fl_bwd(eps, res, dy):
    xhat, inv, gamma = res
    dx, dg, db = _bwd_call(dy, xhat, inv, gamma)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


fused_layernorm_2d.defvjp(_fl_fwd, _fl_bwd)


def fused_layernorm(x, gamma, beta, eps: float = 1e-6):
    """LayerNorm over the last axis of arbitrary-rank x via the Pallas
    kernel; rows padded to the block multiple (padded rows are dead)."""
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    n_pad = _pad_rows(n)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    y = fused_layernorm_2d(x2, gamma, beta, eps)
    return y[:n].reshape(shape)
