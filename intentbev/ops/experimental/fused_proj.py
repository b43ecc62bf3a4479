"""Fused Pallas residual projection: y = gate * (x W + b) + residual.

Used for the attention output projection: folding the residual add (and the
stochastic-depth gate) into the matmul epilogue removes one full read+write
of the [B*T, D] activation per block — the residual adds profiled at
~22 ms/step across the twin ViT. Same accumulating-dW backward pattern as
ops/fused_mlp.py.

MEASURED NEGATIVE RESULT (v5e, 2026-08): wiring this into the attention
projection made the full model slightly slower (52.3 -> 51.7 fps inference,
720 -> 722 ms training) — XLA already fuses the residual add into the
Dense matmul's epilogue there. Kept as a library op (tested) for cases
where XLA's fusion does not apply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

BLOCK_ROWS_PROJ = 512


def _pad_rows(n: int) -> int:
    return ((n + BLOCK_ROWS_PROJ - 1) // BLOCK_ROWS_PROJ) * BLOCK_ROWS_PROJ


def _fwd_kernel(x_ref, w_ref, b_ref, res_ref, gate_ref, y_ref):
    y = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    y_ref[:] = (y * gate_ref[:] + res_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, dy_ref, gate_ref, dx_ref, dw_ref, db_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dyg = dy_ref[:].astype(jnp.float32) * gate_ref[:]
    dyg_c = dyg.astype(x_ref.dtype)
    dx = jax.lax.dot_general(
        dyg_c, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dw_ref[:] += jax.lax.dot_general(
        x_ref[:], dyg_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[:] += jnp.sum(dyg, axis=0, keepdims=True)


def _fwd(x2, w, b, res2, gate2):
    n, d_in = x2.shape
    d_out = w.shape[1]
    nb = n // BLOCK_ROWS_PROJ
    return pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS_PROJ, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_PROJ, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_PROJ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS_PROJ, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d_out), x2.dtype),
    )(x2, w, b.reshape(1, -1), res2, gate2)


def _bwd_call(x2, w, dy2, gate2):
    n, d_in = x2.shape
    d_out = w.shape[1]
    nb = n // BLOCK_ROWS_PROJ
    dx, dw, db = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS_PROJ, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_PROJ, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_PROJ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS_PROJ, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d_in), x2.dtype),
            jax.ShapeDtypeStruct((d_in, d_out), jnp.float32),
            jax.ShapeDtypeStruct((1, d_out), jnp.float32),
        ),
    )(x2, w, dy2, gate2)
    return dx, dw, db[0]


@jax.custom_vjp
def _fused_proj2(x2, w, b, res2, gate2):
    return _fwd(x2, w, b, res2, gate2)


def _fp_fwd(x2, w, b, res2, gate2):
    return _fwd(x2, w, b, res2, gate2), (x2, w, gate2)


def _fp_bwd(resid, dy):
    x2, w, gate2 = resid
    dx, dw, db = _bwd_call(x2, w, dy, gate2)
    return dx, dw.astype(w.dtype), db, dy, jnp.zeros_like(gate2)


_fused_proj2.defvjp(_fp_fwd, _fp_bwd)


def fused_dense_residual(x, w, b, residual, gate=None):
    """y = gate * (x W + b) + residual over [..., D_in] activations."""
    shape = x.shape
    d_in = shape[-1]
    d_out = w.shape[1]
    x2 = x.reshape(-1, d_in)
    r2 = residual.reshape(-1, d_out)
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
    y = _fused_proj2(x2, w, b, r2, gate2)
    return y[:n].reshape(shape[:-1] + (d_out,))
