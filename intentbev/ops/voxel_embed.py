"""Fused voxelize + patch-embed: LiDAR points -> ViT tokens, BEV never in HBM.

Why. The serving profile (docs/PERF.md, 60.8 fps config) spends ~25 ms/step
materializing the [8, 400, 720, 290] BEV only to immediately re-read it:
the XLA scatter-max custom fusion (~14.8 ms, dominated by zero-init +
conflict-tolerant random updates into a 1.34 GB bf16 buffer), a ~6 ms
layout copy of the scatter output, and the ~4.3 ms patch-embed conv. All
three exist to compute [B, 4500, 384] tokens (27 MB) from ~1.3 M points
(~5 MB). This kernel goes points -> tokens directly: each program builds
one 40-row BEV band in VMEM and immediately contracts it against the
VMEM-resident conv kernel (the proven ops/patch_embed.py matmul phase).

The in-tile combine — the piece docs/PERF.md names as the missing
"vectorized in-tile combine" — is done on the MXU via one-hot placement:

- The HOST pre-reduces duplicate cells (``dedup_cells_host``: per-cell max,
  exact — bf16 cast commutes with max) so device placement is a SUM over
  unique cells.
- Cells are grouped by 64-pixel *window* (64 consecutive pixels in
  row-major order) into *chunks* of <= 64 cells. For a chunk, the kernel
  builds two one-hot matrices from lane-major index vectors and multiplies:
      E[s, k] = (slot_k == s)            f32/bf16 [WINDOW, CAP]
      X[k, c] = (ch_k   == c) * val_k              [CAP, C]
      U = E @ X                                    [WINDOW, C]
  and adds U into the window's rows of the band scratch. One chunk =
  ~40 VPU ops + one tiny MXU matmul instead of 64 serial scalar stores.
- Zero-padded chunk slots and whole zero chunks contribute U == 0, so no
  masking or dynamic trip counts are needed beyond the per-band chunk
  count (SMEM scalar).

Voxelize semantics match utils.py:62-106 via bev/voxelize.py: per-cell max
intensity, empty cells 0 (host clamps values to >= 0, which the reference's
zeros-init ``np.maximum.at`` implies). Patch-embed semantics match the
stride-P conv (model_vit.py:62-74); parameters are the conv's kernel/bias,
so checkpoints are interchangeable. Forward-only (serving path).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mosaic import kernel_params

# VMEM limit + optional megacore dimension_semantics (see ops/mosaic.py);
# grid is (batch, band) — fully parallel (disjoint output rows, scratch
# fully re-initialized per program).
_COMPILER_PARAMS = kernel_params(2)

WINDOW = 64  # pixels per placement window (rows of one E @ X update)
CAP = 64     # max cells per chunk (contraction depth of one placement)

# Band geometry the CNN chunk path builds/consumes with (the CNN family has
# no patch size of its own; the transport just needs ONE agreed value so
# build_voxel_chunks and voxel_fill_bev band identically). All CNN-path
# call sites (bench.py, tools/profile_step.py) use this constant — a
# mismatch would only surface as the runtime band-count assert below.
CNN_CHUNK_PATCH = 8

# 'dot_t':   keep everything lane-major and contract both operands on
#            their lane dims (rhs-transposed dot) — Mosaic lowers it
#            natively and it beats 'reshape' on v5e (69.2 vs 67.5 fps e2e).
# 'reshape': build X sublane-major by relayouting the [1, CAP] index/value
#            vectors to [CAP, 1] (portable fallback).
_STRATEGY = os.environ.get("INTENTBEV_VOXEMBED_STRATEGY", "dot_t")

# Chunk-loop unroll factor. Chunks past a band's count are all-zero, which
# makes their update U == 0 (val 0 -> X 0), so the loop can safely over-run
# the count to the next unroll multiple — no masking needed. v5e sweep:
# 1 -> 69.2, 4 -> 71.7, 8 -> 72.0 fps e2e (dot_t strategy).
_UNROLL = int(os.environ.get("INTENTBEV_VOXEMBED_UNROLL", "8"))


class VoxelChunks(NamedTuple):
    """Host-built placement chunks for one batch.

    All index/value vectors are lane-major (shape [..., 1, CAP]) so the
    transport carries no sublane-padded arrays.
    """

    wid: jnp.ndarray    # i32[B, NB, NC]        window index within band
    sl: jnp.ndarray     # i32[B, NB, NC, 1, CAP] pixel slot within window
    ch: jnp.ndarray     # i32[B, NB, NC, 1, CAP] channel of the cell
    val: jnp.ndarray    # f32[B, NB, NC, 1, CAP] cell value (max intensity)
    count: jnp.ndarray  # i32[B, NB]            real chunks per band


# one definition of the banding rule — the host chunk builder and the
# kernel grid must agree with ops/patch_embed's row grouping
from .patch_embed import rows_per_program  # noqa: E402  (re-export)


def pack_chunk_transport(chunks: VoxelChunks,
                         window: int = WINDOW) -> VoxelChunks:
    """Host-side compact encoding of placement chunks for the H2D link.

    The chunk payload is the sustained-serving transport limiter (the
    device consumes batches faster than the host link ships them on
    bandwidth-bound deployments), so every exact bit-saving matters:

    - ``sl`` + ``ch`` pack into ONE u16 per cell (slot-in-window in the
      low 6 bits — window is 64 slots — channel in the high 10) whenever
      the channel index fits 10 bits (the 290-channel flagship grid does).
      EXACT; 3 bytes -> 2 per cell. The placeholder ``ch`` ships as a
      zero-size array (0 bytes).
    - ``val`` ships u8 when every value is integral in [0, 255]. AV2
      LiDAR intensity IS uint8 (the feather column the reference reads,
      dataset.py:311), so on real data this is exact; synthetic float
      intensities keep f32 and only pay the 2-byte sl/ch saving.
    - ``wid`` stays i32 (one per chunk, not per cell — negligible).

    Together: 452 -> 196 bytes/chunk on integral-intensity data (u16
    packed indices + u8 values), a 2.3x transport cut. Inverse:
    :func:`decode_chunk_transport` (elementwise, inside the jitted
    program, ~0.05 ms/batch at HBM speed).
    """
    sl = np.asarray(chunks.sl)
    ch = np.asarray(chunks.ch)
    val = np.asarray(chunks.val)
    out = chunks._replace(
        wid=np.asarray(chunks.wid).astype(np.int32),
        count=np.asarray(chunks.count).astype(np.int32),
    )
    if window <= 64 and int(ch.max(initial=0)) < (1 << 10):
        packed = ((ch.astype(np.uint16) << 6)
                  | sl.astype(np.uint16)).astype(np.uint16)
        out = out._replace(
            sl=packed, ch=np.zeros(ch.shape[:-1] + (0,), np.int16))
    elif window <= 256 and int(ch.max(initial=0)) < (1 << 15):
        out = out._replace(sl=sl.astype(np.uint8), ch=ch.astype(np.int16))
    if (val.size == 0
            or (val.min(initial=0.0) >= 0.0 and val.max(initial=0.0) <= 255.0
                and np.array_equal(val, np.rint(val)))):
        out = out._replace(val=val.astype(np.uint8))
    return out


def decode_chunk_transport(chunks: VoxelChunks) -> VoxelChunks:
    """Device-side inverse of :func:`pack_chunk_transport` — also accepts
    unpacked (i32/f32) chunks unchanged. Elementwise converts inside the
    jitted consumer; shapes/dtypes are static per trace."""
    sl = chunks.sl
    if sl.dtype == jnp.uint16:
        p = sl.astype(jnp.int32)
        sl_i = p & 63
        ch_i = p >> 6
    else:
        sl_i = sl.astype(jnp.int32)
        ch_i = chunks.ch.astype(jnp.int32)
    val = chunks.val
    if val.dtype != jnp.float32:
        val = val.astype(jnp.float32)
    return chunks._replace(
        wid=chunks.wid.astype(jnp.int32), sl=sl_i, ch=ch_i, val=val)


def build_voxel_chunks(
    points: np.ndarray,
    valid: np.ndarray,
    grid,
    patch: int,
    *,
    window: int = WINDOW,
    cap: int = CAP,
    num_chunks: int | None = None,
    on_overflow: str = "raise",
    use_native: bool = True,
) -> tuple[VoxelChunks, int]:
    """One sample's packed points -> placement chunks (host).

    points f32[S, P, 4], valid bool[S, P]. Returns (chunks with leading
    batch dim of 1, num_chunks actually used). With ``num_chunks=None``
    the chunk arrays are sized to the sample (rounded up to a multiple of
    8); pass a fixed value for shape-stable streaming. ``on_overflow``:
    'raise' or 'drop' (drop whole excess chunks, rarest-window cells last).
    ``use_native`` prefers the C++ builder (cpp ib_build_chunks, ~10x the
    numpy throughput) when the host library is available; both produce
    identical arrays (parity-tested).
    """
    from ..bev.voxelize import dedup_cells_host

    h, w = grid.height_px, grid.width_px
    c = grid.lidar_sweeps * grid.lidar_height_channels
    rows_band = rows_per_program(h, patch) * patch
    if h % rows_band:
        raise ValueError(f"height {h} not divisible by band rows {rows_band}")
    band_px = rows_band * w
    if band_px % window:
        raise ValueError(f"band pixels {band_px} not divisible by window {window}")
    nb = h // rows_band
    wins_per_band = band_px // window

    if num_chunks is not None and num_chunks % 8:
        # the kernel's unroll over-run needs a multiple of the unroll
        # factor (<= 8); extra zero chunks are arithmetic no-ops
        num_chunks = -(-num_chunks // 8) * 8

    if use_native:
        from ..utils.native import build_chunks_native

        nc0 = num_chunks if num_chunks is not None else max(
            8, -(-(int(np.count_nonzero(valid)) // 48) // 8) * 8)
        out = build_chunks_native(
            points, valid, grid, window=window, cap=cap, nb=nb, nc=nc0)
        if out is not None:
            wid, sl, ch, val, count, needed = out
            if needed > nc0:
                if num_chunks is not None:
                    if on_overflow == "raise":
                        raise ValueError(
                            f"band needs {needed} chunks > num_chunks={nc0}; "
                            "raise num_chunks or pass on_overflow='drop'"
                        )
                else:  # auto-size: retry once at the exact requirement
                    # (ib_build_chunks counts demand past nc, so `needed`
                    # is exact and the retry cannot overflow again)
                    nc0 = -(-needed // 8) * 8
                    wid, sl, ch, val, count, needed = build_chunks_native(
                        points, valid, grid, window=window, cap=cap,
                        nb=nb, nc=nc0)
                    assert needed <= nc0, (needed, nc0)
            if num_chunks is None and nc0 > 8:
                tight = max(8, -(-max(int(count.max()), 1) // 8) * 8)
                if tight < nc0:  # trim the over-guess (numpy-size parity)
                    wid, sl, ch, val = (a[:, :tight] for a in (wid, sl, ch, val))
                    nc0 = tight
            return (
                VoxelChunks(wid=wid[None], sl=sl[None], ch=ch[None],
                            val=val[None], count=count[None]),
                nc0,
            )

    ids, vals = dedup_cells_host(points, valid, grid)
    n_real = int(np.searchsorted(ids, h * w * c))
    ids = ids[:n_real].astype(np.int64)
    # reference semantics: cells are max(0, intensities) (zeros-init
    # np.maximum.at, utils.py:101-105)
    vals = np.maximum(vals[:n_real], 0.0)

    p = ids // c
    chn = (ids % c).astype(np.int32)
    win_global = p // window
    slot = (p % window).astype(np.int32)

    n = len(ids)
    if n:
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = win_global[1:] != win_global[:-1]
        run_id = np.cumsum(new) - 1
        rank = np.arange(n) - np.flatnonzero(new)[run_id]
    else:
        rank = np.zeros(0, np.int64)
    mcw = -(-(window * c) // cap)  # chunks per window upper bound
    ckey = win_global * mcw + rank // cap
    k_in_chunk = (rank % cap).astype(np.int64)

    # ckey is non-decreasing (cells arrive sorted by flat id, so win_global
    # is non-decreasing and rank//cap increases within a window) — run
    # detection replaces np.unique's redundant O(n log n) sort
    if n:
        cnew = np.empty(n, bool)
        cnew[0] = True
        cnew[1:] = ckey[1:] != ckey[:-1]
        inv = np.cumsum(cnew) - 1
        uc = ckey[cnew]
    else:
        inv = np.zeros(0, np.int64)
        uc = ckey
    cwin = uc // mcw
    cband = cwin // wins_per_band
    m = len(uc)
    if m:
        cb_new = np.empty(m, bool)
        cb_new[0] = True
        cb_new[1:] = cband[1:] != cband[:-1]
        cb_run = np.cumsum(cb_new) - 1
        clocal = np.arange(m) - np.flatnonzero(cb_new)[cb_run]
    else:
        clocal = np.zeros(0, np.int64)
    counts = np.bincount(cband, minlength=nb).astype(np.int32)

    nc = num_chunks
    if nc is None:
        nc = max(int(counts.max()) if m else 0, 8)
        nc = -(-nc // 8) * 8
    if m and int(counts.max()) > nc:
        if on_overflow == "raise":
            raise ValueError(
                f"band needs {int(counts.max())} chunks > num_chunks={nc}; "
                "raise num_chunks or pass on_overflow='drop'"
            )
        keep_chunk = clocal < nc
        keep_cell = keep_chunk[inv]
        inv = inv[keep_cell]
        chn, slot, vals = chn[keep_cell], slot[keep_cell], vals[keep_cell]
        k_in_chunk = k_in_chunk[keep_cell]
        counts = np.minimum(counts, nc)

    wid = np.zeros((nb, nc), np.int32)
    sl = np.zeros((nb, nc, 1, cap), np.int32)
    ch = np.zeros((nb, nc, 1, cap), np.int32)
    val = np.zeros((nb, nc, 1, cap), np.float32)
    if m:
        sel = clocal < nc
        wid[cband[sel], clocal[sel]] = (cwin[sel] % wins_per_band).astype(np.int32)
        b_cell = cband[inv]
        l_cell = clocal[inv]
        sl[b_cell, l_cell, 0, k_in_chunk] = slot
        ch[b_cell, l_cell, 0, k_in_chunk] = chn
        val[b_cell, l_cell, 0, k_in_chunk] = vals
    return (
        VoxelChunks(
            wid=wid[None], sl=sl[None], ch=ch[None], val=val[None],
            count=counts[None],
        ),
        nc,
    )


def stack_voxel_chunks(samples: list[VoxelChunks]) -> VoxelChunks:
    """Stack per-sample chunks (batch dim 1 each) into one batch, padding
    the chunk axis to the largest sample (zero chunks are no-ops)."""
    nc = max(s.wid.shape[2] for s in samples)

    def pad(a, target):
        pad_width = [(0, 0)] * a.ndim
        pad_width[2] = (0, target - a.shape[2])
        return np.pad(np.asarray(a), pad_width)

    return VoxelChunks(
        wid=np.concatenate([pad(s.wid, nc) for s in samples]),
        sl=np.concatenate([pad(s.sl, nc) for s in samples]),
        ch=np.concatenate([pad(s.ch, nc) for s in samples]),
        val=np.concatenate([pad(s.val, nc) for s in samples]),
        count=np.concatenate([np.asarray(s.count) for s in samples]),
    )


def _place_band(count_ref, wid_ref, sl_ref, ch_ref, val_ref, scratch_ref,
                *, window, cap, strategy, cdt):
    """Zero the band scratch and place this (batch, band)'s chunks into it.

    Shared placement phase of ``_kernel`` (voxelize+patch-embed) and
    ``_fill_kernel`` (voxelize to dense BEV, CNN path) — identical
    instruction stream, so the tuned one-hot MXU placement and the unroll
    sweep apply to both.
    """
    c = scratch_ref.shape[-1]
    # SMEM blocks must span the full trailing dims (count is whole-array:
    # its [B, NB] shape has no 8/128-compatible blocking), so batch/band
    # are selected here rather than by the index map
    batch = pl.program_id(0)
    band = pl.program_id(1)

    scratch_ref[...] = jnp.zeros_like(scratch_ref)

    def place(g):
        win = wid_ref[0, band, g]
        sl_v = sl_ref[0, 0, g]    # [1, cap] lane-major
        ch_v = ch_ref[0, 0, g]
        va_v = val_ref[0, 0, g]
        es = (
            jax.lax.broadcasted_iota(jnp.int32, (window, cap), 0) == sl_v
        ).astype(cdt)
        if strategy == "dot_t":
            # X^T [c, cap] stays lane-major; contract both lane dims
            xt = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (c, cap), 0) == ch_v,
                va_v, 0.0,
            ).astype(cdt)
            u = jax.lax.dot_general(
                es, xt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            ch_s = ch_v.reshape(cap, 1)
            va_s = va_v.reshape(cap, 1)
            x = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (cap, c), 1) == ch_s,
                va_s, 0.0,
            ).astype(cdt)
            u = jax.lax.dot_general(
                es, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        scratch_ref[win] = (
            scratch_ref[win].astype(jnp.float32) + u
        ).astype(scratch_ref.dtype)

    if _UNROLL > 1:
        # chunk arrays are sized to a multiple of 8 (builder), so any
        # unroll in {2, 4, 8} can over-run count without going out of range
        assert wid_ref.shape[-1] % _UNROLL == 0, (wid_ref.shape, _UNROLL)

        def body(g, carry):
            for i in range(_UNROLL):
                place(g * _UNROLL + i)
            return carry

        jax.lax.fori_loop(0, pl.cdiv(count_ref[batch, band], _UNROLL), body, 0)
    else:
        def body(g, carry):
            place(g)
            return carry

        jax.lax.fori_loop(0, count_ref[batch, band], body, 0)


def _kernel(count_ref, wid_ref, sl_ref, ch_ref, val_ref, w_ref, b_ref,
            o_ref, scratch_ref, *, patch, gw, rows_pp, window, cap,
            strategy):
    d = w_ref.shape[-1]
    c = scratch_ref.shape[-1]
    _place_band(count_ref, wid_ref, sl_ref, ch_ref, val_ref, scratch_ref,
                window=window, cap=cap, strategy=strategy, cdt=w_ref.dtype)

    # --- patch-embed matmul phase (ops/patch_embed.py semantics) ---
    m = rows_pp * gw
    x = scratch_ref[...].reshape(rows_pp, patch, gw, patch, c)
    acc = jnp.zeros((m, d), jnp.float32)
    for dy in range(patch):
        for dx in range(patch):
            xs = x[:, dy, :, dx, :].reshape(m, c)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.reshape(rows_pp, gw, d).astype(o_ref.dtype)


def voxel_embed_tokens(
    chunks: VoxelChunks,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    patch: int,
    grid_hw: tuple[int, int],
    *,
    window: int = WINDOW,
) -> jnp.ndarray:
    """Placement chunks -> ViT tokens [B, (H//P)*(W//P), D].

    ``kernel`` [P, P, C, D] / ``bias`` [D] are the patch-embed conv
    parameters; output matches conv(voxelize(points)) + reshape exactly
    (see tests/test_voxel_embed.py).
    """
    h, w = grid_hw
    b, nb, nc = chunks.wid.shape
    cap = chunks.sl.shape[-1]
    _, _, c, d = kernel.shape
    rows_pp = rows_per_program(h, patch)
    rows_band = rows_pp * patch
    assert nb == h // rows_band, (nb, h, rows_band)
    gw = w // patch
    nw = rows_band * w // window

    out = pl.pallas_call(
        functools.partial(
            _kernel, patch=patch, gw=gw, rows_pp=rows_pp, window=window,
            cap=cap, strategy=_STRATEGY,
        ),
        grid=(b, nb),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((b, nb), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, nc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nc, 1, cap), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, 1, cap), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, 1, cap), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((patch, patch, c, d), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_pp, gw, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nb * rows_pp, gw, d), kernel.dtype),
        scratch_shapes=[pltpu.VMEM((nw, window, c), kernel.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nb * (nc * window * cap * c
                                + rows_pp * gw * patch * patch * c * d),
            bytes_accessed=(chunks.sl.size * 3 * 4
                            + patch * patch * c * d * 2
                            + b * (h // patch) * gw * d * 2),
            transcendentals=0,
        ),
    )(
        chunks.count, chunks.wid, chunks.sl, chunks.ch, chunks.val,
        kernel, bias.reshape(1, d),
    )
    return out.reshape(b, (h // patch) * gw, d)


def _fill_kernel(count_ref, wid_ref, sl_ref, ch_ref, val_ref,
                 o_ref, scratch_ref, *, window, cap, strategy, rows_band,
                 grid_w):
    c = scratch_ref.shape[-1]
    _place_band(count_ref, wid_ref, sl_ref, ch_ref, val_ref, scratch_ref,
                window=window, cap=cap, strategy=strategy, cdt=o_ref.dtype)
    # windows are 64 consecutive row-major pixels, so the band scratch
    # [nw, window, c] IS the band image [rows_band, grid_w, c]
    o_ref[0] = scratch_ref[...].reshape(rows_band, grid_w, c).astype(o_ref.dtype)


def voxel_fill_bev(
    chunks: VoxelChunks,
    grid_hw: tuple[int, int],
    channels: int,
    patch: int,
    dtype=jnp.bfloat16,
    *,
    window: int = WINDOW,
) -> jnp.ndarray:
    """Placement chunks -> dense BEV [B, H, W, C] (the CNN-family input).

    The CNN path's equivalent of ``voxel_embed_tokens``: same host chunk
    transport, same one-hot MXU placement per VMEM band — but the band is
    written out as image rows instead of being contracted with the
    patch-embed kernel. Replaces the XLA scatter-max + layout copy
    (docs/PERF.md: ~27 ms/step on the CNN serving profile) with one linear
    writer. ``patch`` must match the value the chunks were built with
    (the band height is derived from it), so one host transport serves
    both model families. Exact vs ``voxelize_packed`` up to the output
    dtype cast (per-cell max is computed on the host in f32).
    """
    h, w = grid_hw
    b, nb, nc = chunks.wid.shape
    cap = chunks.sl.shape[-1]
    rows_band = rows_per_program(h, patch) * patch
    assert nb == h // rows_band, (nb, h, rows_band)
    nw = rows_band * w // window
    # channels must cover the builder's channel count: a too-small value
    # makes out-of-range ch indices fail the one-hot compare and silently
    # drop those cells. Checked when the chunk arrays are concrete (host
    # build -> direct call); traced calls inside jit skip the check.
    if not isinstance(chunks.ch, jax.core.Tracer) and chunks.ch.size:
        ch_max = int(np.max(np.asarray(chunks.ch)))
        assert ch_max < channels, (
            f"chunks carry channel index {ch_max} but voxel_fill_bev was "
            f"called with channels={channels}; cells would be silently "
            "dropped"
        )

    out = pl.pallas_call(
        functools.partial(
            _fill_kernel, window=window, cap=cap, strategy=_STRATEGY,
            rows_band=rows_band, grid_w=w,
        ),
        grid=(b, nb),
        compiler_params=_COMPILER_PARAMS,
        in_specs=[
            pl.BlockSpec((b, nb), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, nc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nc, 1, cap), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, 1, cap), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, 1, cap), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_band, w, channels),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, channels), dtype),
        scratch_shapes=[pltpu.VMEM((nw, window, channels), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nb * nc * window * cap * channels,
            bytes_accessed=(chunks.sl.size * 3 * 4
                            + b * h * w * channels * 2),
            transcendentals=0,
        ),
    )(chunks.count, chunks.wid, chunks.sl, chunks.ch, chunks.val)
    return out
