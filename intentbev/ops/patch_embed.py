"""Fused Pallas patch-embed: BEV -> ViT tokens without the XLA relayout.

The reference embeds patches with a stride-8 conv (timm PatchEmbed,
model_vit.py:62-74). XLA lowers that conv well, but only after copying the
[B, 400, 720, 290] voxelizer output into its preferred conv input layout —
a profiled ~6 ms/step relayout (`reshape.2`, docs/PERF.md) on top of the
~4.3 ms conv. This kernel consumes the BEV in its scatter-native NHWC
layout directly: each program reads a [rows_pp*8, 720, 290] row band,
slices the 8x8 patch grid in VMEM, and accumulates the embed as 64
(dy, dx)-sliced [M, C] @ [C, D] matmuls against the VMEM-resident conv
kernel (14 MB at full scale) — HBM sees the BEV once and the tokens once.

Equivalent to conv(kernel=[P, P, C, D], stride P, VALID) + bias; exact
same parameters, so checkpoints are interchangeable with the conv path
(models/vit.py gates this to deterministic TPU passes; training and
non-TPU backends keep the conv).

Forward-only: no custom VJP — the serving/eval path never differentiates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic import kernel_params

# VMEM limit + optional megacore dimension_semantics (see ops/mosaic.py);
# grid is (batch, patch-row-group) — fully parallel.
_COMPILER_PARAMS = kernel_params(2)

# Patch rows handled per program. 5 gives M = 5*90 = 450 tokens per matmul
# (sublane pad 450->456, ~1%) and a 16.7 MB input band; 50 % 5 == 0.
ROWS_PER_PROGRAM = 5


def rows_per_program(grid_h: int, patch: int) -> int:
    """Patch rows per program for a grid of ``grid_h`` pixel rows.

    Shared banding rule: ops/voxel_embed.py's host chunk builder and
    kernel band on the same value, so it must have exactly one definition.
    """
    gh = grid_h // patch
    return ROWS_PER_PROGRAM if gh % ROWS_PER_PROGRAM == 0 else 1


def _kernel(x_ref, w_ref, b_ref, o_ref, *, patch: int, gw: int, rows_pp: int):
    # x [1, rows_pp*P, W, C]; w [P, P, C, D]; b [1, D];
    # o [1, rows_pp, gw, D] (last two block dims must equal the full array
    # dims for Mosaic, so the token axis stays 2-D here and is flattened
    # to [B, N, D] by the caller — a contiguous, copy-free reshape)
    c = x_ref.shape[-1]
    d = w_ref.shape[-1]
    m = rows_pp * gw
    # [rows_pp*P, W, C] -> [rows_pp, P, gw, P, C]: splits of non-lane dims
    x = x_ref[0].reshape(rows_pp, patch, gw, patch, c)
    acc = jnp.zeros((m, d), jnp.float32)
    for dy in range(patch):
        for dx in range(patch):
            xs = x[:, dy, :, dx, :].reshape(m, c)  # merge above lanes: free
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.reshape(rows_pp, gw, d).astype(o_ref.dtype)


def patch_embed_matmul(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, patch: int
) -> jnp.ndarray:
    """x [B, H, W, C] NHWC, kernel [P, P, C, D] HWIO, bias [D] ->
    tokens [B, (H//P)*(W//P), D] (row-major patch order, matching
    conv + reshape)."""
    b, h, w, c = x.shape
    d = kernel.shape[-1]
    assert h % patch == 0 and w % patch == 0
    gh, gw = h // patch, w // patch
    rows_pp = rows_per_program(h, patch)
    out = pl.pallas_call(
        functools.partial(_kernel, patch=patch, gw=gw, rows_pp=rows_pp),
        grid=(b, gh // rows_pp),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((1, rows_pp * patch, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((patch, patch, c, d), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_pp, gw, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gh, gw, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * gh * gw * patch * patch * c * d,
            bytes_accessed=(x.size + patch * patch * c * d
                            + b * gh * gw * d) * 2,
            transcendentals=0,
        ),
    )(x, kernel, bias.reshape(1, d))
    return out.reshape(b, gh * gw, d)
