"""Fused Pallas transformer MLP: fc1 -> GELU -> fc2 (+ residual epilogue).

The ViT MLP materialises a [B*T, 4*D] hidden activation in HBM
(~113 MB bf16 per layer at flagship geometry; ~11 ms/step of elementwise
fusions across 24 layers). This kernel keeps the hidden tile in VMEM:
per row-block it computes h = gelu(x W1 + b1), y = h W2 + b2 (+ residual),
so HBM sees only x once and y once. Weight panels (W1 [D, 4D], W2 [4D, D])
stay resident across the row grid.

Backward recomputes h per block and accumulates dW/db partial sums per
row-block (reduced outside), like ops/layernorm.py:
  g  = x W1 + b1 ;  h = gelu(g)
  dh = dy W2^T ;  dg = dh * gelu'(g)
  dx = dg W1^T ; dW1 = x^T dg ; db1 = sum dg ; dW2 = h^T dy ; db2 = sum dy
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic import kernel_params, sequential_params

# VMEM limit + optional megacore dimension_semantics (see ops/mosaic.py);
# all grids in this file (and its importers) are 1-D over independent
# row blocks. Also imported by fused_ln_mlp / fused_ln_dense /
# fused_mlp_int8, whose grids are 1-D row blocks too.
_COMPILER_PARAMS = kernel_params(1)
# the backward kernels accumulate dW/db into a revisited constant-index
# block — their grid must stay sequential even under INTENTBEV_MEGACORE
_COMPILER_PARAMS_SEQ = sequential_params()

import os as _os

# Row-block sweep knob for on-chip tuning; 256 is the validated default.
BLOCK_ROWS_MLP = int(_os.environ.get("INTENTBEV_MLP_BLOCK", "256"))

_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf(x):
    """erf via the Abramowitz-Stegun 7.1.26 rational approximation
    (max abs error 1.5e-7): Mosaic has no erf primitive, and this keeps the
    kernel numerically faithful to the exact-GELU reference (timm uses
    nn.GELU, not the tanh approximation)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


# Serving-only GELU variant knob (default "erf" = exact, always used by
# training/backward). "sigmoid" swaps the forward nonlinearity for
# x*sigmoid(1.702x) — one exp + one reciprocal instead of the A&S erf's
# reciprocal + exp + 5-term Horner + sign/select chain. NOT numerically
# faithful (max abs dev ~0.020 vs exact GELU near |x|~2.3): a perf
# experiment knob; adopt only if e2e fps gains AND eval metrics on a
# trained checkpoint are unchanged (docs/PERF.md records the outcome).
_GELU_MODE = _os.environ.get("INTENTBEV_GELU", "erf")


def _gelu(x):
    """Forward GELU: exact (erf), matching jax.nn.gelu(approximate=False),
    unless INTENTBEV_GELU=sigmoid (serving perf experiment, see above)."""
    if _GELU_MODE == "sigmoid":
        return x / (1.0 + jnp.exp(-1.702 * x))
    return 0.5 * x * (1.0 + _erf(x / _SQRT_2))


def _dgelu(x):
    return 0.5 * (1.0 + _erf(x / _SQRT_2)) + x * _INV_SQRT_2PI * jnp.exp(
        -0.5 * x * x
    )


def _require_exact_gelu_for_grad():
    """Trace-time guard called by every custom-VJP fwd that recomputes GELU
    in its backward: the backward kernels pair the forward ``_gelu`` with the
    exact-erf derivative ``_dgelu``, so differentiating under
    INTENTBEV_GELU=sigmoid would silently produce mismatched grads. The knob
    is serving-only; fail loudly if a training step reaches a VJP with it on."""
    if _GELU_MODE != "erf":
        raise RuntimeError(
            "INTENTBEV_GELU=%s is a serving-only forward variant; "
            "differentiation requires the exact erf GELU (unset the env var "
            "for training)." % _GELU_MODE
        )


def _pad_rows(n: int) -> int:
    return ((n + BLOCK_ROWS_MLP - 1) // BLOCK_ROWS_MLP) * BLOCK_ROWS_MLP


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, res_ref, gate_ref,
                y_ref):
    # gate: per-row drop-path factor (0 or 1/keep_prob; ones in eval) —
    # stochastic depth runs inside the kernel so training keeps the fusion
    x = x_ref[:]
    g = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    h = _gelu(g)
    y = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    y_ref[:] = (y * gate_ref[:] + res_ref[:].astype(jnp.float32)).astype(y_ref.dtype)


def _fwd(x2, w1, b1, w2, b2, res2, gate2):
    n, d = x2.shape
    dh = w1.shape[1]
    nb = n // BLOCK_ROWS_MLP
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(nb,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS_MLP, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_MLP, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_MLP, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS_MLP, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * dh,
            bytes_accessed=2 * n * d * 2 + 2 * d * dh * 2,
            transcendentals=n * dh,
        ),
    )(x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1), res2, gate2)
    return y


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref, gate_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    # dW/db outputs use a constant index map: every grid step revisits the
    # same block, which stays resident in VMEM — the kernel accumulates
    # into it across the (sequential) row grid instead of writing per-block
    # partials to HBM (which would be ~340 MB at flagship shapes).
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:]
    dy = dy_ref[:].astype(jnp.float32) * gate_ref[:]
    g = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    h = _gelu(g)
    dh = jax.lax.dot_general(
        dy.astype(x.dtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg = dh * _dgelu(g)
    dx = jax.lax.dot_general(
        dg.astype(x.dtype), w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dw1_ref[:] += jax.lax.dot_general(
        x, dg.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] += jnp.sum(dg, axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        h.astype(x.dtype), dy.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2_ref[:] += jnp.sum(dy, axis=0, keepdims=True)


def _bwd_call(x2, w1, b1, w2, dy2, gate2):
    n, d = x2.shape
    dh = w1.shape[1]
    nb = n // BLOCK_ROWS_MLP
    dx, dw1_p, db1_p, dw2_p, db2_p = pl.pallas_call(
        _bwd_kernel,
        grid=(nb,),
        compiler_params=_COMPILER_PARAMS_SEQ,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS_MLP, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_MLP, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS_MLP, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_ROWS_MLP, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((d, dh), jnp.float32),
            jax.ShapeDtypeStruct((1, dh), jnp.float32),
            jax.ShapeDtypeStruct((dh, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
    )(x2, w1, b1.reshape(1, -1), w2, dy2, gate2)
    return dx, dw1_p, db1_p[0], dw2_p, db2_p[0]


@jax.custom_vjp
def _fused_mlp2(x2, w1, b1, w2, b2, res2, gate2):
    return _fwd(x2, w1, b1, w2, b2, res2, gate2)


def _fm_fwd(x2, w1, b1, w2, b2, res2, gate2):
    _require_exact_gelu_for_grad()
    y = _fwd(x2, w1, b1, w2, b2, res2, gate2)
    return y, (x2, w1, b1, w2, gate2)


def _fm_bwd(resid, dy):
    x2, w1, b1, w2, gate2 = resid
    dx, dw1, db1, dw2, db2 = _bwd_call(x2, w1, b1, w2, dy, gate2)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b1.dtype),
        dy,                        # residual passthrough gradient
        jnp.zeros_like(gate2),     # gate is a non-diff rng mask
    )


_fused_mlp2.defvjp(_fm_fwd, _fm_bwd)


def fused_mlp(x, w1, b1, w2, b2, residual, gate=None):
    """y = gate * (gelu(x W1 + b1) W2 + b2) + residual over [..., D].

    ``gate``: optional per-row stochastic-depth factor broadcastable to
    x.shape[:-1] (0 or 1/keep_prob); defaults to ones (plain residual MLP).
    """
    shape = x.shape
    d = shape[-1]
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
    y = _fused_mlp2(x2, w1, b1, w2, b2, r2, gate2)
    return y[:n].reshape(shape)
