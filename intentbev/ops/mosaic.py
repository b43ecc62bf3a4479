"""Shared Mosaic compiler parameters for the production Pallas kernels.

Two concerns, one place:

- ``vmem_limit_bytes``: Mosaic's default scoped-VMEM stack limit (16 MB)
  is conservative; the backward kernels' double-buffered working sets
  legitimately exceed it. The raised 100 MB limit is validated by
  compile + run on v5e (docs/PERF.md "Training step").

- ``dimension_semantics`` (env-gated ``INTENTBEV_MEGACORE=1``): TPU chips
  with two cores ("megacore") only split a Pallas grid across cores when
  its dimensions are declared ``"parallel"`` — the default is sequential
  ("arbitrary") scheduling on one core. Every production kernel in this
  package is embarrassingly parallel across its whole grid: each program
  writes a disjoint output block exactly once and fully (re)initializes
  any scratch it reads, so marking all dimensions parallel is always
  sound here. Gated off pending an on-chip A/B (the deployed v5e may be
  single-core, in which case this is a scheduling no-op).
"""

from __future__ import annotations

import os

from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024

MEGACORE = os.environ.get("INTENTBEV_MEGACORE", "0") == "1"


def kernel_params(grid_rank: int) -> pltpu.CompilerParams:
    """CompilerParams for an embarrassingly-parallel grid of ``grid_rank``
    dimensions. Only use for kernels where every grid step writes a
    disjoint output block and fully initializes its scratch."""
    if MEGACORE:
        return pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel",) * grid_rank,
        )
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def sequential_params() -> pltpu.CompilerParams:
    """CompilerParams for grids that MUST run sequentially regardless of
    INTENTBEV_MEGACORE — kernels that accumulate into a constant-index-map
    output block across grid steps (the dW/db revisit pattern in the
    MLP-family backward kernels): splitting such a grid across cores would
    skip the program_id==0 init on one core and race the accumulator."""
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def revisit_params(parallel_axes: int, sequential_axes: int) -> pltpu.CompilerParams:
    """CompilerParams for grids whose trailing ``sequential_axes`` dimensions
    accumulate into constant-index-map output blocks (must stay sequential,
    "arbitrary") while the leading ``parallel_axes`` dimensions each write
    disjoint output blocks and may split across megacore cores — e.g. the
    fused attention backward: dk/dv revisit across the row-block axis only;
    batch and head-pair axes index distinct accumulator blocks."""
    if MEGACORE:
        return pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=(
                ("parallel",) * parallel_axes + ("arbitrary",) * sequential_axes
            ),
        )
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
