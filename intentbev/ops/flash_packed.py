"""Packed (transpose-free) Pallas flash attention over [B, T, H*D] tensors.

The BHTD kernels in ``flash_attention.py`` require physically transposing
Q/K/V from the Dense output layout [B, T, H*D] to [B, H, T, D] — profiled
at ~16 ms/step of pure copies on the full twin-ViT. These kernels consume
the Dense layout directly.

Lane-blocking trick: Mosaic requires the last block dim to be 128-divisible
(or the full array dim), so per-64-lane head slices can't be blocked — a
128-lane block covers exactly TWO heads (D=64). The grid runs over
(batch, head-groups, row-blocks), each program unrolling its group's heads
over an explicitly reused VMEM score scratch. The FORWARD widens the head
group to the full 384 lanes (all 6 heads per program — measured 52.3 ->
54.4 fps e2e): the scratch is reused per head, so tripling the per-program
work amortizes grid/DMA overhead without growing the working set; the
backward kernels keep the 128-lane pair block (their two scratches and
full-panel operands are already VMEM-heavy).

logsumexp is stored as [B, H, T_pad, 1] so its blocks satisfy the same
lane constraints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic import kernel_params, revisit_params

# VMEM limit + optional megacore dimension_semantics (see ops/mosaic.py);
# every grid here is (batch, head-group, row/key-block) — fully parallel.
_COMPILER_PARAMS = kernel_params(3)

from .flash_attention import _key_bias, _pad_len

LANE_BLOCK = 128          # bwd channel block = LANE_BLOCK // head_dim heads
FWD_LANE_BLOCK = 384      # fwd channel block: all 6 heads in one program —
                          # the [BQ, T_pad] f32 score scratch is reused per
                          # head, so widening the head block amortizes the
                          # per-program overhead (DMA windows, grid launch)
                          # without growing the VMEM working set the way a
                          # larger row block does
BLOCK_Q_PK = 384          # fwd row-block (512/768 measured slower, also with wide lanes)
import os as _os

# bwd row-block (env-tunable for on-chip sweeps; 256 is the r3-validated
# default, 384 measured no better under the 128-lane pair block)
BLOCK_BWD_PK = int(_os.environ.get("INTENTBEV_BWD_BLOCK", "256"))
# bwd channel (head-group) block: 128 = two D=64 heads per program.
# Widening to 384 puts all 6 heads in one program — the same
# amortization the FORWARD adopted (FWD_LANE_BLOCK) — at the cost of 3x
# wider q/k/v/do panels in VMEM; feasible under the raised
# vmem_limit_bytes (ops/mosaic.py). Falls back to 128 when the model
# width isn't divisible.
BWD_LANE_BLOCK = int(_os.environ.get("INTENTBEV_BWD_LANE_BLOCK", "128"))
# Chunked backward (``_bwd_dq_kernel_chunked``/``_bwd_dkv_kernel_chunked``):
# stream the contraction axis (keys for dq, queries for dkv) in tiles so
# MXU matmuls of tile j+1 overlap the VPU exp/mult of tile j — the same
# restructuring as the serving forward's FWD_KV_CHUNK win, but EXACT here
# with no softmax-safety tradeoff: the backward reconstructs p as
# exp(s - lse) with no running max, so tiling is pure accumulation (f32
# partial-sum order is the only difference vs the monolithic kernels).
# 0 = monolithic (default until measured on-chip).
# PRECEDENCE: only consulted on the SPLIT backward path — BWD_FUSED
# (default 1) takes the fused kernel early-return, so sweeping
# INTENTBEV_BWD_KV_CHUNK requires INTENTBEV_BWD_FUSED=0 (a warning is
# emitted otherwise).
BWD_KV_CHUNK = int(_os.environ.get("INTENTBEV_BWD_KV_CHUNK", "0"))
# Fused one-pass backward (``_bwd_fused_kernel``): ONE kernel computes
# dq, dk, dv per row-block, accumulating dk/dv into constant-index-map
# f32 output blocks across the sequential row-block grid axis (the same
# revisit pattern as the MLP-family dW accumulators). Eliminates the
# split kernels' duplicated work: the score matmul p = exp(qK^T - lse)
# and the t = do.V^T matmul are computed ONCE instead of once per kernel
# — 2 of the 4 slow D=64-contraction matmuls and half the exp volume.
# The replacement dv/dk matmuls contract over the row block (256+), the
# MXU-friendly axis. 1 = fused (measured faster on v5e, see
# docs/PERF.md "Training step"); 0 = split dq/dkv kernels.
BWD_FUSED = _os.environ.get("INTENTBEV_BWD_FUSED", "1") == "1"
if BWD_FUSED and BWD_KV_CHUNK:
    import warnings as _warnings

    _warnings.warn(
        "INTENTBEV_BWD_KV_CHUNK is set but INTENTBEV_BWD_FUSED=1 (the "
        "default) takes precedence: the chunked split backward will not "
        "run. Set INTENTBEV_BWD_FUSED=0 to sweep the chunked kernels.",
        stacklevel=1,
    )
# Online-softmax chunked forward (``_fwd_kernel_chunked``): KV tile size,
# 0 = monolithic kernel. Env-tunable for on-chip experiments.
FWD_KV_CHUNK = int(_os.environ.get("INTENTBEV_FWD_KV_CHUNK", "0"))
# Fixed-max ("unsafe") softmax: skip the row-max VPU pass and use exp(s)
# directly. Exact (identical output in real arithmetic, and the lse
# returned to the backward is the same quantity) whenever every score
# stays within f32 exp range: |s| < ~88, guaranteed for LN-bounded q/k at
# this model's scale (measured |s|_max ~= 30 on trained checkpoints; see
# tools/score_range.py). In the chunked kernel this also deletes the
# running-max rescale (corr) work, leaving pure accumulation.
FWD_UNSAFE_SOFTMAX = _os.environ.get("INTENTBEV_FWD_SOFTMAX", "safe") == "unsafe"
# Chunked-unsafe forward experiments (env-gated; parity-tested):
# FWD_PIPELINE: double-buffer the score scratch and issue chunk j+1's
# qK^T matmul BEFORE chunk j's exp/sum — the profile shows the kernel at
# ~(MXU floor + exp cost), i.e. the units are serialized; the lookahead
# gives the scheduler an independent MXU op to overlap with the VPU exp.
# FWD_EXP2: fold log2(e) into the query scale and use exp2 — same
# function (exp(s) = exp2(s*log2e) exactly in f32), one fewer VPU mul if
# the hardware exp lowers via exp2.
FWD_PIPELINE = _os.environ.get("INTENTBEV_FWD_PIPELINE", "0") == "1"
FWD_EXP2 = _os.environ.get("INTENTBEV_FWD_EXP2", "0") == "1"


def _heads_per_block(dh: int, lane_block: int = LANE_BLOCK) -> int:
    assert lane_block % dh == 0, f"head_dim {dh} must divide {lane_block}"
    return lane_block // dh


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref, s_buf,
                *, heads_in_block: int, scale: float, safe: bool = True):
    # refs: q [1, BQ, 128], k/v [1, T_pad, 128], bias [1, T_pad],
    # o [1, BQ, 128], l [1, hp, BQ, 1], s_buf scratch [BQ, T_pad] f32.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // heads_in_block
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl] * jnp.asarray(scale, q.dtype)
        s_buf[:] = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        if safe:
            m = jnp.max(s_buf[:], axis=-1, keepdims=True)
            s_buf[:] = jnp.exp(s_buf[:] - m)
        else:
            # FWD_UNSAFE_SOFTMAX: scores are range-bounded, skip the max
            # pass. The -1e30 padded-key bias must not reach exp (it would
            # produce 0 anyway, but -1e30 + finite stays ~-1e30 and exp
            # underflows to 0 exactly as intended).
            m = jnp.zeros((s_buf.shape[0], 1), jnp.float32)
            s_buf[:] = jnp.exp(s_buf[:])
        denom = jnp.sum(s_buf[:], axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            s_buf[:].astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)
        l_ref[0, h] = m + jnp.log(denom)


def _fwd_kernel_chunked(q_ref, k_ref, v_ref, bias_ref, o_ref, l_ref,
                        s_buf, s_buf2, acc_buf, m_buf, d_buf,
                        *, heads_in_block: int, scale: float, kv_chunk: int,
                        safe: bool = True, pipeline: bool = False,
                        exp2: bool = False):
    """Online-softmax forward: the key axis is processed in ``kv_chunk``
    tiles so the instruction stream interleaves MXU work (S_{j+1} = qK^T,
    P_j V_j) with VPU work (exp/max/sum of chunk j) at fine granularity —
    the monolithic kernel runs score-matmul -> full softmax -> PV as three
    serialized phases, leaving the MXU idle for the ~2/3 of the time the
    VPU spends on the [BQ, T_pad] softmax (docs/PERF.md measured-dead-ends
    discussion). Numerics: standard rescaled accumulator; output matches
    the monolithic kernel to f32-accumulation tolerance.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // heads_in_block
    t_pad = k.shape[0]
    n_chunks = t_pad // kv_chunk
    neg_big = jnp.float32(-1e30)
    # exp2 mode: exp(s) = exp2(s * log2(e)) exactly; fold log2(e) into the
    # query scale and the padded-key bias so the VPU op is a bare exp2.
    log2e = float(np.log2(np.e)) if exp2 else 1.0
    expfn = jnp.exp2 if exp2 else jnp.exp
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl] * jnp.asarray(scale * log2e, q.dtype)
        hb = bias * log2e if exp2 else bias
        if safe:
            m_buf[:] = jnp.full_like(m_buf[:], neg_big)
        d_buf[:] = jnp.zeros_like(d_buf[:])
        acc_buf[:] = jnp.zeros_like(acc_buf[:])

        def _score(j, buf):
            ks = slice(j * kv_chunk, (j + 1) * kv_chunk)
            buf[:] = jax.lax.dot_general(
                qh, k[ks, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + hb[ks]

        if not safe and pipeline:
            # Lookahead: issue chunk j+1's qK^T before chunk j's exp/sum —
            # S_{j+1} is independent of P_j, giving the scheduler MXU work
            # to overlap with the VPU exp (pure accumulation, no rescale).
            bufs = [s_buf, s_buf2]
            _score(0, bufs[0])
            for j in range(n_chunks):
                cur, nxt = bufs[j % 2], bufs[(j + 1) % 2]
                if j + 1 < n_chunks:
                    _score(j + 1, nxt)
                ks = slice(j * kv_chunk, (j + 1) * kv_chunk)
                p = expfn(cur[:])
                d_buf[:] = d_buf[:] + jnp.sum(p, axis=-1, keepdims=True)
                acc_buf[:] = acc_buf[:] + jax.lax.dot_general(
                    p.astype(v.dtype), v[ks, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            for j in range(n_chunks):
                ks = slice(j * kv_chunk, (j + 1) * kv_chunk)
                _score(j, s_buf)
                if safe:
                    m_new = jnp.maximum(
                        m_buf[:], jnp.max(s_buf[:], axis=-1, keepdims=True))
                    p = jnp.exp(s_buf[:] - m_new)
                    corr = jnp.exp(m_buf[:] - m_new)
                    d_buf[:] = d_buf[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
                    acc_buf[:] = acc_buf[:] * corr + jax.lax.dot_general(
                        p.astype(v.dtype), v[ks, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    m_buf[:] = m_new
                else:
                    # FWD_UNSAFE_SOFTMAX: range-bounded scores -> no running
                    # max, no rescale; the chunk loop is pure accumulation,
                    # so the only VPU work per chunk is exp + sum.
                    p = expfn(s_buf[:])
                    d_buf[:] = d_buf[:] + jnp.sum(p, axis=-1, keepdims=True)
                    acc_buf[:] = acc_buf[:] + jax.lax.dot_general(
                        p.astype(v.dtype), v[ks, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        o_ref[0, :, sl] = (acc_buf[:] / d_buf[:]).astype(o_ref.dtype)
        if safe:
            l_ref[0, h] = m_buf[:] + jnp.log(d_buf[:])
        elif exp2:
            # d = sum exp2(s*log2e) = sum exp(s): same lse either way
            l_ref[0, h] = jnp.log(d_buf[:])
        else:
            l_ref[0, h] = jnp.log(d_buf[:])


def _fwd_chunked(q3, k3, v3, num_heads: int, scale: float, seq_len: int,
                 kv_chunk: int, safe: bool = True):
    b, t_pad, dm = q3.shape
    dh = dm // num_heads
    lane_block = FWD_LANE_BLOCK if dm % FWD_LANE_BLOCK == 0 else LANE_BLOCK
    hp = _heads_per_block(dh, lane_block)
    n_pairs = num_heads // hp
    nq = t_pad // BLOCK_Q_PK
    bias = _key_bias(t_pad, seq_len)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_chunked, heads_in_block=hp, scale=scale,
                          kv_chunk=kv_chunk, safe=safe,
                          pipeline=FWD_PIPELINE and not safe,
                          exp2=FWD_EXP2 and not safe),
        grid=(b, n_pairs, nq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q_PK, lane_block), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q_PK, lane_block), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, BLOCK_Q_PK, 1),
                         lambda i, p, j: (i, p, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dm), q3.dtype),
            jax.ShapeDtypeStruct((b, num_heads, t_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_Q_PK, kv_chunk), jnp.float32),
            pltpu.VMEM((BLOCK_Q_PK, kv_chunk), jnp.float32),  # pipeline 2nd buf
            pltpu.VMEM((BLOCK_Q_PK, dh), jnp.float32),
            pltpu.VMEM((BLOCK_Q_PK, 1), jnp.float32),
            pltpu.VMEM((BLOCK_Q_PK, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * t_pad * dm,
            bytes_accessed=b * t_pad * dm * 2 * 4,
            transcendentals=b * t_pad * t_pad * num_heads,
        ),
    )(q3, k3, v3, bias)
    return o, lse


def _fwd(q3, k3, v3, num_heads: int, scale: float, seq_len: int,
         kv_chunk: int = 0, safe: bool = True):
    b, t_pad, dm = q3.shape
    if kv_chunk and t_pad % kv_chunk == 0:
        return _fwd_chunked(q3, k3, v3, num_heads, scale, seq_len, kv_chunk,
                            safe=safe)
    dh = dm // num_heads
    lane_block = FWD_LANE_BLOCK if dm % FWD_LANE_BLOCK == 0 else LANE_BLOCK
    hp = _heads_per_block(dh, lane_block)
    n_pairs = num_heads // hp
    nq = t_pad // BLOCK_Q_PK
    bias = _key_bias(t_pad, seq_len)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, heads_in_block=hp, scale=scale,
                          safe=safe),
        grid=(b, n_pairs, nq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q_PK, lane_block), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q_PK, lane_block), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, BLOCK_Q_PK, 1),
                         lambda i, p, j: (i, p, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dm), q3.dtype),
            jax.ShapeDtypeStruct((b, num_heads, t_pad, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((BLOCK_Q_PK, t_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * t_pad * dm,
            bytes_accessed=b * t_pad * dm * 2 * 4,
            transcendentals=b * t_pad * t_pad * num_heads,
        ),
    )(q3, k3, v3, bias)
    return o, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, bias_ref,
                   dq_ref, p_buf, t_buf, *, heads_in_block: int, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // heads_in_block
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        p_buf[:] = jax.lax.dot_general(
            (q[:, sl] * jnp.asarray(scale, q.dtype)), k[:, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bias
        p_buf[:] = jnp.exp(p_buf[:] - l_ref[0, h])
        t_buf[:] = jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_buf[:] = p_buf[:] * (t_buf[:] - delta_ref[0, h])
        dq = jax.lax.dot_general(
            t_buf[:].astype(k.dtype), k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref,
                    dk_ref, dv_ref, p_buf, t_buf,
                    *, heads_in_block: int, scale: float):
    # No query-axis mask: every query row (padded ones included) produces a
    # forward output, so all S^T columns legitimately contribute to dK/dV
    # whenever their dO is nonzero. Padded KEY rows (>= seq_len) compute
    # garbage here — exp(k_pad.q - lse) is O(1) nonzero — and are zeroed
    # after the pallas_call in _bwd (their true gradient is exactly 0).
    q = q_ref[0]          # [T_pad, 128] full panel for this head pair
    k = k_ref[0]          # [BK, 128]
    v = v_ref[0]
    do = do_ref[0]        # [T_pad, 128]
    dh = q.shape[-1] // heads_in_block
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        p_buf[:] = jax.lax.dot_general(
            k[:, sl], (q[:, sl] * jnp.asarray(scale, q.dtype)),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        p_buf[:] = jnp.exp(p_buf[:] - l_ref[0, h][:, 0][None, :])
        dv = jax.lax.dot_general(
            p_buf[:].astype(do.dtype), do[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_buf[:] = jax.lax.dot_general(
            v[:, sl], do[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_buf[:] = p_buf[:] * (t_buf[:] - delta_ref[0, h][:, 0][None, :])
        dk = jax.lax.dot_general(
            t_buf[:].astype(q.dtype), q[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_ref[0, :, sl] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel_chunked(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref,
                           bias_ref, dq_ref, s0, s1, t_buf, acc_buf,
                           *, heads_in_block: int, scale: float, chunk: int):
    """dq with the key axis streamed in ``chunk`` tiles (see BWD_KV_CHUNK).

    Exact vs ``_bwd_dq_kernel`` up to f32 partial-sum order: p is
    reconstructed as exp(s - lse) (no running max anywhere in the
    backward), so per-tile accumulation needs no rescale. The score matmul
    of tile j+1 is issued before tile j's exp (double-buffered scratch),
    and tile j's do.V^T matmul is independent of its exp — both give the
    scheduler MXU work to overlap the VPU exp/mult chain.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // heads_in_block
    t_pad = k.shape[0]
    n_chunks = t_pad // chunk
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl] * jnp.asarray(scale, q.dtype)
        lse = l_ref[0, h]          # [bq, 1]
        dlt = delta_ref[0, h]      # [bq, 1]
        acc_buf[:] = jnp.zeros_like(acc_buf[:])

        def _score(j, buf):
            ks = slice(j * chunk, (j + 1) * chunk)
            buf[:] = jax.lax.dot_general(
                qh, k[ks, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias[ks]

        bufs = [s0, s1]
        _score(0, bufs[0])
        for j in range(n_chunks):
            cur, nxt = bufs[j % 2], bufs[(j + 1) % 2]
            if j + 1 < n_chunks:
                _score(j + 1, nxt)
            ks = slice(j * chunk, (j + 1) * chunk)
            t_buf[:] = jax.lax.dot_general(
                do[:, sl], v[ks, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = jnp.exp(cur[:] - lse) * (t_buf[:] - dlt)
            acc_buf[:] = acc_buf[:] + jax.lax.dot_general(
                u.astype(k.dtype), k[ks, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dq_ref[0, :, sl] = (acc_buf[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_chunked(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref,
                            dk_ref, dv_ref, s0, s1, t_buf, dk_acc, dv_acc,
                            *, heads_in_block: int, scale: float, chunk: int):
    """dk/dv with the QUERY axis streamed in ``chunk`` tiles.

    Same masking semantics as ``_bwd_dkv_kernel`` (padded query rows carry
    dO = 0 so they contribute nothing; padded KEY rows are zeroed after
    the pallas_call in ``_bwd``).
    """
    q = q_ref[0]          # [T_pad, lane] full query panel
    k = k_ref[0]          # [BK, lane]
    v = v_ref[0]
    do = do_ref[0]        # [T_pad, lane]
    dh = q.shape[-1] // heads_in_block
    t_pad = q.shape[0]
    n_chunks = t_pad // chunk
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        kh = k[:, sl] * jnp.asarray(scale, k.dtype)
        lse = l_ref[0, h][:, 0]       # [t_pad]
        dlt = delta_ref[0, h][:, 0]   # [t_pad]
        dk_acc[:] = jnp.zeros_like(dk_acc[:])
        dv_acc[:] = jnp.zeros_like(dv_acc[:])

        def _score(j, buf):
            qs = slice(j * chunk, (j + 1) * chunk)
            buf[:] = jax.lax.dot_general(
                kh, q[qs, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) - lse[qs][None, :]

        bufs = [s0, s1]
        _score(0, bufs[0])
        for j in range(n_chunks):
            cur, nxt = bufs[j % 2], bufs[(j + 1) % 2]
            if j + 1 < n_chunks:
                _score(j + 1, nxt)
            qs = slice(j * chunk, (j + 1) * chunk)
            p = jnp.exp(cur[:])
            dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
                p.astype(do.dtype), do[qs, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t_buf[:] = jax.lax.dot_general(
                v[:, sl], do[qs, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            u = p * (t_buf[:] - dlt[qs][None, :])
            dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
                u.astype(q.dtype), q[qs, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dk_ref[0, :, sl] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, bias_ref,
                      dq_ref, dk_ref, dv_ref, p_buf, t_buf,
                      *, heads_in_block: int, scale: float):
    """One-pass backward: dq for this row block + dk/dv accumulation.

    Grid (batch, head-pair, row-block) with the row-block axis SEQUENTIAL:
    dk/dv output blocks have a constant index map along it, so they stay
    resident in VMEM and accumulate across row blocks (zeroed at j == 0),
    exactly like the dW accumulators in ops/fused_ln_mlp._bwd_kernel.
    p and t are computed once and feed all three gradients; the dv/dk
    matmuls contract over the row block (the MXU-friendly >= 256 axis)
    instead of head_dim.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias = bias_ref[0]
    dh = q.shape[-1] // heads_in_block
    for h in range(heads_in_block):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, sl] * jnp.asarray(scale, q.dtype)
        p_buf[:] = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        p_buf[:] = jnp.exp(p_buf[:] - l_ref[0, h])
        t_buf[:] = jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_buf[:] = p_buf[:] * (t_buf[:] - delta_ref[0, h])
        dq = jax.lax.dot_general(
            t_buf[:].astype(k.dtype), k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            p_buf[:].astype(do.dtype), do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # ds/dk = scale * q: qh already carries the scale factor.
        dk_ref[0, :, sl] += jax.lax.dot_general(
            t_buf[:].astype(q.dtype), qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _bwd_fused(num_heads: int, scale: float, seq_len: int, res, g,
               lane_block: int, delta, bias):
    q3, k3, v3, o3, lse = res
    do3 = g[0] if isinstance(g, tuple) else g
    b, t_pad, dm = q3.shape
    dh = dm // num_heads
    hp = _heads_per_block(dh, lane_block)
    n_pairs = num_heads // hp
    bq = BLOCK_BWD_PK
    nq = t_pad // bq
    dq, dk32, dv32 = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, heads_in_block=hp, scale=scale),
        grid=(b, n_pairs, nq),
        # dk/dv accumulate across the row-block axis (j) ONLY; batch and
        # head-pair axes index disjoint accumulator blocks, so they stay
        # megacore-parallel (ADVICE r4)
        compiler_params=revisit_params(2, 1),
        in_specs=[
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, bq, 1), lambda i, p, j: (i, p, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, bq, 1), lambda i, p, j: (i, p, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dm), q3.dtype),
            jax.ShapeDtypeStruct((b, t_pad, dm), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, dm), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, t_pad), jnp.float32),
            pltpu.VMEM((bq, t_pad), jnp.float32),
        ],
    )(q3, k3, v3, do3, lse, delta, bias)
    return dq, dk32.astype(k3.dtype), dv32.astype(v3.dtype)


def _bwd(num_heads: int, scale: float, seq_len: int, res, g):
    q3, k3, v3, o3, lse = res
    do3 = g[0] if isinstance(g, tuple) else g
    b, t_pad, dm = q3.shape
    dh = dm // num_heads
    lane_block = BWD_LANE_BLOCK if (
        BWD_LANE_BLOCK % dh == 0
        and num_heads % (BWD_LANE_BLOCK // dh) == 0
        and dm % BWD_LANE_BLOCK == 0
    ) else LANE_BLOCK
    hp = _heads_per_block(dh, lane_block)
    n_pairs = num_heads // hp
    # delta per head, stored like lse: [B, H, T_pad, 1]
    delta = jnp.transpose(
        jnp.sum(
            (do3.astype(jnp.float32) * o3.astype(jnp.float32)).reshape(
                b, t_pad, num_heads, dh
            ),
            axis=-1,
        ),
        (0, 2, 1),
    )[..., None]
    bias = _key_bias(t_pad, seq_len)

    if BWD_FUSED:
        dq, dk, dv = _bwd_fused(num_heads, scale, seq_len, res, g,
                                lane_block, delta, bias)
        if seq_len < t_pad:
            dk = dk.at[:, seq_len:].set(0)
            dv = dv.at[:, seq_len:].set(0)
        return dq, dk, dv

    bq = BLOCK_BWD_PK
    nq = t_pad // bq
    ck = BWD_KV_CHUNK if (BWD_KV_CHUNK and t_pad % BWD_KV_CHUNK == 0) else 0
    if ck:
        dq_kernel = functools.partial(
            _bwd_dq_kernel_chunked, heads_in_block=hp, scale=scale, chunk=ck)
        dq_scratch = [
            pltpu.VMEM((bq, ck), jnp.float32),
            pltpu.VMEM((bq, ck), jnp.float32),
            pltpu.VMEM((bq, ck), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ]
    else:
        dq_kernel = functools.partial(
            _bwd_dq_kernel, heads_in_block=hp, scale=scale)
        dq_scratch = [
            pltpu.VMEM((bq, t_pad), jnp.float32),
            pltpu.VMEM((bq, t_pad), jnp.float32),
        ]
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, n_pairs, nq),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, bq, 1), lambda i, p, j: (i, p, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, bq, 1), lambda i, p, j: (i, p, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad), lambda i, p, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, dm), q3.dtype),
        scratch_shapes=dq_scratch,
    )(q3, k3, v3, do3, lse, delta, bias)

    nk = t_pad // bq
    if ck:
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel_chunked, heads_in_block=hp, scale=scale, chunk=ck)
        dkv_scratch = [
            pltpu.VMEM((bq, ck), jnp.float32),
            pltpu.VMEM((bq, ck), jnp.float32),
            pltpu.VMEM((bq, ck), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ]
    else:
        dkv_kernel = functools.partial(
            _bwd_dkv_kernel, heads_in_block=hp, scale=scale)
        dkv_scratch = [
            pltpu.VMEM((bq, t_pad), jnp.float32),
            pltpu.VMEM((bq, t_pad), jnp.float32),
        ]
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, n_pairs, nk),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lane_block), lambda i, p, j: (i, 0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, t_pad, 1), lambda i, p, j: (i, p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, t_pad, 1), lambda i, p, j: (i, p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, lane_block), lambda i, p, j: (i, j, p), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, dm), k3.dtype),
            jax.ShapeDtypeStruct((b, t_pad, dm), v3.dtype),
        ),
        scratch_shapes=dkv_scratch,
    )(q3, k3, v3, do3, lse, delta)
    if seq_len < t_pad:
        # Padded KEY rows were masked (-inf) in the forward: their true
        # gradient is exactly zero; the dkv kernel computes garbage for
        # them (see _bwd_dkv_kernel). seq_len is static -> cheap fused op.
        dk = dk.at[:, seq_len:].set(0)
        dv = dv.at[:, seq_len:].set(0)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_packed(q3, k3, v3, num_heads: int, scale: float, seq_len: int,
                  kv_chunk: int, safe: bool):
    o, _ = _fwd(q3, k3, v3, num_heads, scale, seq_len, kv_chunk, safe)
    return o


def _fp_fwd(q3, k3, v3, num_heads, scale, seq_len, kv_chunk, safe):
    o, lse = _fwd(q3, k3, v3, num_heads, scale, seq_len, kv_chunk, safe)
    return o, (q3, k3, v3, o, lse)


def _fp_bwd(num_heads, scale, seq_len, kv_chunk, safe, res, g):
    # the backward is independent of the forward's chunking/softmax mode
    # (it consumes the lse, which both modes produce identically)
    return _bwd(num_heads, scale, seq_len, res, g)


_flash_packed.defvjp(_fp_fwd, _fp_bwd)


def flash_attention_packed(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    num_heads: int, seq_len: int | None = None,
    kv_chunk: int | None = None, unsafe_softmax: bool | None = None,
) -> jnp.ndarray:
    """Attention over Dense-layout [B, T, H*D] tensors; no transposes.

    ``kv_chunk``/``unsafe_softmax``: forward-kernel variants (online-softmax
    KV streaming / fixed-max softmax — see module constants). ``None``
    defers to the INTENTBEV_FWD_KV_CHUNK / INTENTBEV_FWD_SOFTMAX env
    experiment overrides (module constants read at import)."""
    b, t, dm = q.shape
    dh = dm // num_heads
    if LANE_BLOCK % dh != 0 or num_heads % (LANE_BLOCK // dh) != 0:
        # head layout not pair-blockable (e.g. odd head count): fall back to
        # the BHTD kernels via explicit transposes
        from .flash_attention import flash_attention

        def to_bhtd(x):
            return jnp.transpose(x.reshape(b, t, num_heads, dh), (0, 2, 1, 3))

        o = flash_attention(to_bhtd(q), to_bhtd(k), to_bhtd(v), seq_len=seq_len)
        return jnp.transpose(o, (0, 2, 1, 3)).reshape(b, t, dm)
    scale = 1.0 / (dh ** 0.5)
    real_len = t if seq_len is None else int(seq_len)
    import math

    t_pad = _pad_len(t, math.lcm(BLOCK_Q_PK, BLOCK_BWD_PK))

    def prep(x):
        if t_pad != t:
            return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    if kv_chunk is None:
        kv_chunk = FWD_KV_CHUNK
    if unsafe_softmax is None:
        unsafe_softmax = FWD_UNSAFE_SOFTMAX
    o = _flash_packed(prep(q), prep(k), prep(v), num_heads, scale, real_len,
                      int(kv_chunk), not bool(unsafe_softmax))
    return o[:, :t, :]
