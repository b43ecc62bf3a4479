"""Fused Pallas LayerNorm + transformer MLP (+ residual) in one kernel.

The pre-LN block tail ``x + drop_path(mlp(norm2(x)))`` as separate kernels
moves each [rows, D] activation through HBM five times per layer (LN read +
write, MLP read + residual read + write). This kernel computes the whole
tail per row-block in VMEM:

    xn  = LN(x) * gamma + beta        (f32 row stats)
    h   = gelu(xn W1 + b1)            (exact erf, hidden never leaves VMEM)
    out = (h W2 + b2) * gate + x      (residual is the SAME x just read)

so HBM sees x once and out once — measured ~-5 ms/step forward over the
separate ``PallasLayerNorm`` + ``fused_mlp`` pair at flagship twin-ViT
shapes, more on the training step (the backward fuses the LN backward and
dW/db accumulation the same way).

Backward (recompute, per row-block; accumulators revisit one VMEM block
across the sequential row grid like ops/fused_mlp.py):
    recompute mu/inv/xhat, xn, g, h
    dy_eff = dy * gate
    dh = dy_eff W2^T ; dg = dh * gelu'(g)
    dxn = dg W1^T
    dgamma += sum dxn * xhat ; dbeta += sum dxn
    dyg = dxn * gamma
    dx = inv * (dyg - mean(dyg) - xhat * mean(dyg * xhat)) + dy
    dW1 += xn^T dg ; db1 += sum dg ; dW2 += h^T dy_eff ; db2 += sum dy_eff

Replaces the reference's ``norm2``/``mlp`` block tail (model_vit.py via
timm Block) — semantics identical, scheduling TPU-native.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import (_COMPILER_PARAMS, _COMPILER_PARAMS_SEQ, _gelu,
                        _dgelu, _require_exact_gelu_for_grad)

import os as _os

# Row-block sweep knob for on-chip tuning (docs/PERF.md: the fused tails
# run at ~126 TFLOPS eff.; larger blocks amortize per-program overhead at
# the cost of VMEM working set). 256 is the validated default.
BLOCK_ROWS_LNMLP = int(_os.environ.get("INTENTBEV_LNMLP_BLOCK", "256"))

# Hidden-dim chunk for the FORWARD kernels (0 = monolithic). The
# monolithic kernel serializes fc1(MXU) -> gelu(VPU) -> fc2(MXU) per row
# block, pinning the step at ~126 TFLOPS eff.; slicing the 4D hidden into
# chunks makes each chunk's fc1/gelu/fc2 an independent chain so Mosaic
# can overlap chunk c's GELU with chunk c+1's matmuls — the same
# restructuring that took the packed-attention forward from 3.51 to
# 2.80 ms/call (ops/flash_packed.py chunked KV, docs/PERF.md). Exact:
# fc2 distributes over hidden slices, so partial-sum accumulation in f32
# matches the monolithic dot bit-for-bit up to f32 add reassociation.
MLP_HCHUNK = int(_os.environ.get("INTENTBEV_MLP_HCHUNK", "0"))

# Row block for the BACKWARD kernel only (0 = same as BLOCK_ROWS_LNMLP).
# The bwd recomputes the forward per row block and accumulates dw1/dw2 in
# VMEM, so its working set and its per-program overhead both differ from
# the forward's — it earns its own sweep knob (VERDICT r3 item 5). Falls
# back when the padded row count isn't divisible.
LNMLP_BWD_BLOCK = int(_os.environ.get("INTENTBEV_LNMLP_BWD_BLOCK", "0"))


def _pad_rows(n: int) -> int:
    return ((n + BLOCK_ROWS_LNMLP - 1) // BLOCK_ROWS_LNMLP) * BLOCK_ROWS_LNMLP


def _ln(x, g_ref, b_ref, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    xn = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    return xhat, inv, xn


def _mlp_body(xn_lp, w1_ref, b1_ref, w2_ref):
    """f32 fc2(gelu(fc1(xn))) WITHOUT bias2 — monolithic or hidden-chunked
    (MLP_HCHUNK), see the knob comment above. Chunks are static slices so
    each fc1/gelu/fc2 triplet is an independent chain Mosaic can pipeline.
    """
    dh = w1_ref.shape[1]
    ck = MLP_HCHUNK
    if ck <= 0 or ck >= dh or dh % ck != 0:
        g = jax.lax.dot_general(
            xn_lp, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:].astype(jnp.float32)
        h = _gelu(g)
        return jax.lax.dot_general(
            h.astype(xn_lp.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = None
    for c in range(dh // ck):
        g = jax.lax.dot_general(
            xn_lp, w1_ref[:, c * ck:(c + 1) * ck], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[:, c * ck:(c + 1) * ck].astype(jnp.float32)
        h = _gelu(g)
        part = jax.lax.dot_general(
            h.astype(xn_lp.dtype), w2_ref[c * ck:(c + 1) * ck, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _fwd_ln_out_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       gate_ref, gn_ref, bn_ref, y_ref, yn_ref, *, eps: float):
    """Block tail + LN epilogue: y = x + gate*mlp(LN2(x)); yn = LN(y)*gn+bn.

    ``yn`` is the NEXT consumer's pre-LN (the next block's norm1, or the
    stack's final norm) computed while y is still in VMEM — the serving
    path's standalone LN kernel (a full HBM read + write of y per block)
    disappears. Forward-only: the serving/eval path never differentiates;
    training keeps the standalone-norm1 structure."""
    x = x_ref[:].astype(jnp.float32)
    _, _, xn = _ln(x, g_ref, b_ref, eps)
    y = _mlp_body(xn.astype(x_ref.dtype), w1_ref, b1_ref, w2_ref) \
        + b2_ref[:].astype(jnp.float32)
    y = y * gate_ref[:] + x
    y_ref[:] = y.astype(y_ref.dtype)
    _, _, yn = _ln(y, gn_ref, bn_ref, eps)
    yn_ref[:] = yn.astype(yn_ref.dtype)


def _fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                gate_ref, y_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    _, _, xn = _ln(x, g_ref, b_ref, eps)
    y = _mlp_body(xn.astype(x_ref.dtype), w1_ref, b1_ref, w2_ref) \
        + b2_ref[:].astype(jnp.float32)
    y_ref[:] = (y * gate_ref[:] + x).astype(y_ref.dtype)


def _fwd(x2, gamma, beta, w1, b1, w2, b2, gate2, eps):
    n, d = x2.shape
    dh = w1.shape[1]
    R = BLOCK_ROWS_LNMLP
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n // R,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * dh,
            bytes_accessed=2 * n * d * 2 + 2 * d * dh * 2,
            transcendentals=n * dh,
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1), gate2)
    return y


def _fwd_ln_out(x2, gamma, beta, w1, b1, w2, b2, gate2, gamma_n, beta_n, eps):
    n, d = x2.shape
    dh = w1.shape[1]
    R = BLOCK_ROWS_LNMLP
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    y, yn = pl.pallas_call(
        functools.partial(_fwd_ln_out_kernel, eps=eps),
        grid=(n // R,),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((n, d), x2.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * dh,
            bytes_accessed=3 * n * d * 2 + 2 * d * dh * 2,
            transcendentals=n * dh,
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1), gate2, gamma_n.reshape(1, d),
      beta_n.reshape(1, d))
    return y, yn


def _bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, gate_ref, dy_ref,
                dx_ref, dgamma_ref, dbeta_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, *, eps: float):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_ref[:] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[:].astype(jnp.float32)
    xhat, inv, xn = _ln(x, g_ref, b_ref, eps)
    xn_lp = xn.astype(x_ref.dtype)
    g = jax.lax.dot_general(
        xn_lp, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h = _gelu(g)
    dy = dy_ref[:].astype(jnp.float32)
    dy_eff = dy * gate_ref[:]
    dh = jax.lax.dot_general(
        dy_eff.astype(x_ref.dtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg = dh * _dgelu(g)
    dxn = jax.lax.dot_general(
        dg.astype(x_ref.dtype), w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgamma_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dbeta_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dyg = dxn * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (inv * (dyg - m1 - xhat * m2) + dy).astype(dx_ref.dtype)
    dw1_ref[:] += jax.lax.dot_general(
        xn_lp, dg.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_ref[:] += jnp.sum(dg, axis=0, keepdims=True)
    dw2_ref[:] += jax.lax.dot_general(
        h.astype(x_ref.dtype), dy_eff.astype(x_ref.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    db2_ref[:] += jnp.sum(dy_eff, axis=0, keepdims=True)


def _bwd_call(x2, gamma, beta, w1, b1, w2, gate2, dy2, eps):
    n, d = x2.shape
    dh = w1.shape[1]
    R = (LNMLP_BWD_BLOCK
         if LNMLP_BWD_BLOCK and n % LNMLP_BWD_BLOCK == 0
         else BLOCK_ROWS_LNMLP)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    dx, dgamma, dbeta, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(n // R,),
        compiler_params=_COMPILER_PARAMS_SEQ,
        in_specs=[
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, dh), jnp.float32),
            jax.ShapeDtypeStruct((1, dh), jnp.float32),
            jax.ShapeDtypeStruct((dh, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
    )(x2, gamma.reshape(1, d), beta.reshape(1, d), w1, b1.reshape(1, -1),
      w2, gate2, dy2)
    return dx, dgamma[0], dbeta[0], dw1, db1[0], dw2, db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_ln_mlp2(x2, gamma, beta, w1, b1, w2, b2, gate2, eps):
    return _fwd(x2, gamma, beta, w1, b1, w2, b2, gate2, eps)


def _flm_fwd(x2, gamma, beta, w1, b1, w2, b2, gate2, eps):
    _require_exact_gelu_for_grad()
    y = _fwd(x2, gamma, beta, w1, b1, w2, b2, gate2, eps)
    return y, (x2, gamma, beta, w1, b1, w2, gate2)


def _flm_bwd(eps, res, dy):
    x2, gamma, beta, w1, b1, w2, gate2 = res
    dx, dgamma, dbeta, dw1, db1, dw2, db2 = _bwd_call(
        x2, gamma, beta, w1, b1, w2, gate2, dy, eps
    )
    return (
        dx,
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b1.dtype),
        jnp.zeros_like(gate2),     # gate is a non-diff rng mask
    )


_fused_ln_mlp2.defvjp(_flm_fwd, _flm_bwd)


def fused_ln_mlp(x, gamma, beta, w1, b1, w2, b2, gate=None, eps: float = 1e-6,
                 ln_out=None):
    """out = gate * mlp(layernorm(x) * gamma + beta) + x over [..., D].

    The residual is implicitly ``x`` (pre-LN transformer block tail).
    ``gate``: optional per-row stochastic-depth factor broadcastable to
    x.shape[:-1] (0 or 1/keep_prob); defaults to ones.

    ``ln_out``: optional (scale, bias) of a LayerNorm applied to the OUTPUT
    as an in-VMEM epilogue; returns ``(out, ln(out))``. Forward-only (no
    custom VJP — differentiating it fails loudly); used by the serving LN
    chain in models/vit.py where consecutive blocks hand norm1 of block
    i+1 (and the final norm) to block i's tail.
    """
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
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
        gate2 = jnp.pad(gate2, ((0, n_pad - n), (0, 0)))
    if ln_out is not None:
        y, yn = _fwd_ln_out(x2, gamma, beta, w1, b1, w2, b2, gate2,
                            ln_out[0], ln_out[1], eps)
        return y[:n].reshape(shape), yn[:n].reshape(shape)
    y = _fused_ln_mlp2(x2, gamma, beta, w1, b1, w2, b2, gate2, eps)
    return y[:n].reshape(shape)
