"""Int8 packed flash attention (serving/forward-only Pallas TPU kernel).

Same pair-blocked, transpose-free structure as ``flash_packed`` (two D=64
heads share one 128-lane panel; grid over (batch, head-pairs, row-blocks))
but with the score and value matmuls on the int8 MXU (394 TOPS on v5e —
measured 2.02x the bf16 peak on this chip).

Quantization happens IN-KERNEL from the same bf16 panels the bf16 kernel
consumes — symmetric per-token-row for Q and K, per-panel for V, and the
probability tile P in (0, 1] with the fixed scale 127. A first version
quantized Q/K/V outside with XLA ops; that cost ~45 ms/step of separate
absmax/round/clip fusions, scale transposes, and int8 materialisation —
more than the MXU win. In-kernel the absmax/round run on the VPU overlapped
with the MXU and touch only VMEM-resident tiles (the K/V panel re-quantize
per row-block step is redundant work but costs microseconds).

**Status: kept measured-NEGATIVE result — not wired into the model.** On
v5e at the flagship shape ([8, 4608, 384], D=64 heads) this kernel runs
6.06 ms vs 4.83 ms for the bf16 ``flash_packed`` sublayer: QK^T is a
64-deep contraction, so the MXU cannot reach the 2x int8 rate, and the
in-kernel quantization of Q/K/V plus the P tile costs more than the P@V
int8 win. ``serving_int8`` therefore keeps attention entirely bf16
(models/vit.py Attention docstring). Kept (with tests) as the documented
experiment so the next person doesn't re-derive it; see docs/PERF.md
"Measured dead ends". No VJP — it was only ever a serving-path candidate.
The reference has no quantized inference at all (torch fp32, model_vit.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..flash_attention import _key_bias, _pad_len
from ..flash_packed import BLOCK_Q_PK, LANE_BLOCK, _COMPILER_PARAMS, _heads_per_block


def _quant_rows(x32: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 of an f32 tile: (q, scale[rows, 1])."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _fwd_kernel_int8(q_ref, k_ref, v_ref, bias_ref, o_ref, s_buf,
                     *, heads_in_block: int, scale: float):
    # refs: q [1, BQ, 128] bf16, k/v [1, T_pad, 128] bf16, bias [1, T_pad]
    # f32, o [1, BQ, 128], s_buf scratch [BQ, T_pad] f32. Same layout as the
    # bf16 kernel (flash_packed._fwd_kernel) — this is a drop-in sibling.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // heads_in_block
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        qq, qs = _quant_rows(q[:, sl].astype(jnp.float32))
        kq, ks = _quant_rows(k[:, sl].astype(jnp.float32))
        vh = v[:, sl].astype(jnp.float32)
        sv = jnp.maximum(jnp.max(jnp.abs(vh)), 1e-8) / 127.0
        vq = jnp.clip(jnp.round(vh / sv), -127, 127).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            qq, kq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s_buf[:] = (
            s32.astype(jnp.float32) * (qs * scale) * ks[:, 0][None, :] + bias
        )
        m = jnp.max(s_buf[:], axis=-1, keepdims=True)
        s_buf[:] = jnp.exp(s_buf[:] - m)
        denom = jnp.sum(s_buf[:], axis=-1, keepdims=True)
        pq = jnp.round(s_buf[:] * 127.0).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            pq, vq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        oh = o32.astype(jnp.float32) * (sv / 127.0) / denom
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)


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

    def prep(x):
        if t_pad != t:
            return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    q3, k3, v3 = prep(q), prep(k), prep(v)
    bias = _key_bias(t_pad, real_len)
    nq = t_pad // BLOCK_Q_PK
    o = pl.pallas_call(
        functools.partial(_fwd_kernel_int8, heads_in_block=hp, scale=scale),
        grid=(b, n_pairs, nq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q_PK, LANE_BLOCK), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, LANE_BLOCK), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, LANE_BLOCK), lambda i, p, j: (i, 0, p),
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
    )(q3, k3, v3, bias)
    return o[:, :t, :]
