"""Async host input pipeline: threaded sample loading + device prefetch.

The reference runs all CPU preprocessing serially inside the training
process (``NUM_WORKERS = 0`` everywhere — train_vit.py:20, SURVEY.md §2.2),
so the GPU idles behind pandas/cv2. Here:

- sample production (feather IO, pose transforms, map raster) runs in a
  thread pool ahead of the consumer;
- failed samples (``None``) are dropped exactly like the reference's
  ``collate_fn`` (dataset.py:137-150);
- batches are fixed-shape numpy structs, transferred to device with a
  double-buffered prefetcher so H2D overlaps the previous step;
- voxelization and augmentation happen ON DEVICE inside the jitted train
  step (intentbev.bev), not here.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, NamedTuple, Sequence

import numpy as np

from .argoverse import ArgoverseSampleLoader, Sample, SequenceInfo


class Batch(NamedTuple):
    # points/map_bev use compact TRANSPORT dtypes: the batch crosses
    # host->device every step, so bytes are the cost (i16 cm points +
    # bit-packed binary map cut the ~125 MB f32 batch-8 to ~23 MB). Device
    # consumers decode first (bev.voxelize.dequantize_points,
    # bev.rasterize.decode_map_transport).
    points: np.ndarray        # i16[B, S, P, 4] xyz in cm, intensity raw
    points_valid: np.ndarray  # bool[B, S, P]
    map_bev: np.ndarray       # u8[B, H, W, ceil(9/8)=2] bit-packed
    #                           (f32 [B, H, W, 9] on the city-raster path)
    gt_boxes: np.ndarray      # f32[B, G, 5]
    gt_intentions: np.ndarray  # i32[B, G]
    gt_valid: np.ndarray      # bool[B, G]
    aug_params: np.ndarray    # f32[B, 3] = (flip_sign, theta, scale); identity (1,0,1) when not augmenting


class ChunkBatch(NamedTuple):
    """Chunk-transport training batch: the host applies the drawn
    flip/rotate/scale to the raw points (bev.augment.augment_points_np)
    and builds voxel placement chunks (ops.voxel_embed, C++ builder), so
    the device train step fills the BEV with the linear band writer
    (voxel_fill_bev) instead of the scatter-max + layout-copy chain, and
    only the GT transform (bev.augment.augment_gt) remains on device.
    Chunks ship compact (pack_chunk_transport)."""

    chunks: tuple              # VoxelChunks of np arrays, compact dtypes
    map_bev: np.ndarray        # as Batch.map_bev
    gt_boxes: np.ndarray       # f32[B, G, 5] — UNaugmented; device applies
    gt_intentions: np.ndarray  # i32[B, G]       augment_gt with aug_params
    gt_valid: np.ndarray       # bool[B, G]
    aug_params: np.ndarray     # f32[B, 3]


def _stack_map(samples: Sequence[Sample]) -> np.ndarray:
    from ..bev.rasterize import pack_map_channels

    map_bev = np.stack([s.map_bev for s in samples])
    if map_bev.dtype == np.uint8 and map_bev.shape[-1] > 1:
        map_bev = pack_map_channels(map_bev)  # binary channels, exact
    return map_bev


def _stack(samples: Sequence[Sample], aug: Sequence[np.ndarray]) -> Batch:
    from ..bev.voxelize import quantize_points_cm

    return Batch(
        points=quantize_points_cm(np.stack([s.points for s in samples])),
        points_valid=np.stack([s.points_valid for s in samples]),
        map_bev=_stack_map(samples),
        gt_boxes=np.stack([s.gt_boxes for s in samples]),
        gt_intentions=np.stack([s.gt_intentions for s in samples]),
        gt_valid=np.stack([s.gt_valid for s in samples]),
        aug_params=np.stack(aug).astype(np.float32),
    )


def _stack_chunks(
    samples: Sequence[Sample],
    aug: Sequence[np.ndarray],
    grid,
    chunk_patch: int,
    chunk_capacity: int,
) -> ChunkBatch:
    from ..bev.augment import augment_points_np
    from ..bev.voxelize import quantize_points_cm
    from ..ops.voxel_embed import (build_voxel_chunks, pack_chunk_transport,
                                   stack_voxel_chunks)

    # cm round-trip FIRST so both transports voxelize identical
    # coordinates (the points transport ships i16 cm; without this, raw-f32
    # chunks would differ from the points path in boundary cells)
    inv = np.asarray([0.01, 0.01, 0.01, 1.0], np.float32)
    chs = []
    for s, a in zip(samples, aug):
        pts = quantize_points_cm(s.points).astype(np.float32) * inv
        pts = augment_points_np(pts, a)
        chs.append(build_voxel_chunks(
            pts, s.points_valid, grid, chunk_patch,
            num_chunks=chunk_capacity, on_overflow="drop")[0])
    return ChunkBatch(
        chunks=pack_chunk_transport(stack_voxel_chunks(chs)),
        map_bev=_stack_map(samples),
        gt_boxes=np.stack([s.gt_boxes for s in samples]),
        gt_intentions=np.stack([s.gt_intentions for s in samples]),
        gt_valid=np.stack([s.gt_valid for s in samples]),
        aug_params=np.stack(aug).astype(np.float32),
    )


def batch_iterator(
    sequences: Sequence[SequenceInfo],
    loader: ArgoverseSampleLoader,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    num_workers: int = 4,
    drop_last: bool = False,
    augment=None,
    skip_batches: int = 0,
    transport: str = "points",
    chunk_patch: int = 8,
    chunk_capacity: int = 768,
) -> Iterator[Batch]:
    """Yield fixed-shape batches; failed samples are dropped (so a batch can
    be smaller than ``batch_size``, like the reference's collate_fn).

    ``augment``: optional AugmentConfig — draws per-sample geometric
    parameters (flip/rotate/scale) host-side, rasterizes the map at the
    augmented pose inside ``loader.load``, and ships the params in
    ``Batch.aug_params`` so the device applies the SAME transform to the
    raw points pre-voxelization (bev.augment). Seeded by ``seed``:
    deterministic per epoch.

    ``skip_batches``: fast-forward over the first N batches without loading
    them (mid-epoch resume). Shuffle order and augmentation draws are made
    for the FULL epoch first, so skipping k batches yields exactly the
    batches a full iteration would have yielded from position k on — under
    the near-infallible-load assumption (a dropped failed sample before the
    skip point shifts the boundary by one; precomputed labels make loads
    infallible in practice).

    ``transport``: "points" (default) ships packed points and the device
    augments + voxelizes; "chunks" applies the drawn augmentation to the
    points HERE (host) and ships voxel placement chunks (ChunkBatch) so
    the device step skips the scatter-max entirely. ``chunk_capacity``
    fixes the chunk arrays' shape so every batch hits one compiled
    program (overfull bands drop their rarest-window cells).
    """
    from ..bev.augment import IDENTITY_AUG, aug_linear_matrix, draw_aug_params

    if transport == "chunks":
        grid = loader.grid

        def stack(samples, aug):
            return _stack_chunks(samples, aug, grid, chunk_patch,
                                 chunk_capacity)
    else:
        stack = _stack

    order = np.arange(len(sequences))
    rng = np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(order)
    if augment is not None:
        params = draw_aug_params(augment, rng, len(order))
        linears = [aug_linear_matrix(p) for p in params]
    else:
        params = np.tile(IDENTITY_AUG, (len(order), 1))
        linears = [None] * len(order)
    if skip_batches:
        n_skip = skip_batches * batch_size
        order, params, linears = order[n_skip:], params[n_skip:], linears[n_skip:]

    if num_workers <= 1:
        pending: list[Sample] = []
        pending_aug: list[np.ndarray] = []
        for k, idx in enumerate(order):
            s = loader.load(sequences[int(idx)], aug_linear=linears[k])
            if s is not None:
                pending.append(s)
                pending_aug.append(params[k])
            if len(pending) == batch_size:
                yield stack(pending, pending_aug)
                pending, pending_aug = [], []
        if pending and not drop_last:
            yield stack(pending, pending_aug)
        return

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        window = num_workers * 2
        futures = [
            pool.submit(loader.load, sequences[int(order[k])], linears[k])
            for k in range(min(window, len(order)))
        ]
        next_submit = window
        pending = []
        pending_aug = []
        for k in range(len(order)):
            s = futures[k].result()
            futures[k] = None  # release the Sample (10s of MB each) promptly
            if next_submit < len(order):
                futures.append(
                    pool.submit(loader.load, sequences[int(order[next_submit])],
                                linears[next_submit])
                )
                next_submit += 1
            if s is not None:
                pending.append(s)
                pending_aug.append(params[k])
            if len(pending) == batch_size:
                yield stack(pending, pending_aug)
                pending, pending_aug = [], []
        if pending and not drop_last:
            yield stack(pending, pending_aug)


def pad_batch(batch: Batch, batch_size: int) -> tuple[Batch, np.ndarray]:
    """Pad a short tail batch up to ``batch_size`` (static shapes for jit).

    Returns (padded batch, sample_valid bool[batch_size]). Padding samples
    carry zero GT so they contribute nothing to the loss beyond easy
    negatives; eval must mask by sample_valid.
    """
    b = batch.gt_boxes.shape[0]
    sample_valid = np.zeros((batch_size,), dtype=bool)
    sample_valid[:b] = True
    if b == batch_size:
        return batch, sample_valid

    def pad(arr):
        pad_width = [(0, batch_size - b)] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad_width)

    import jax

    return jax.tree_util.tree_map(pad, batch), sample_valid


def device_prefetch(iterator: Iterator, size: int = 2, put=None) -> Iterator:
    """Move host batches to device ``size`` steps ahead of the consumer.

    ``put`` overrides the transfer (e.g. a sharded device_put for DP
    training); defaults to plain jax.device_put.
    """
    import jax

    put = put or jax.device_put
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            # A loader/transfer crash must surface in the training loop, not
            # silently truncate the epoch.
            q.put(_ProducerError(exc))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, _ProducerError):
            raise item.exc
        yield item


class _ProducerError:
    """Wrapper distinguishing a producer exception from a yielded batch."""

    def __init__(self, exc: BaseException):
        self.exc = exc
