"""Streaming multi-sweep inference across a TPU slice (driver config 5).

Batch-sharded inference over the ('data',) mesh axis with voxelization,
forward, decode and NMS all on device; only the fixed-size detection
structs (max_detections boxes/scores/intents per frame) are fetched to
host. The reference pulls every intermediate tensor to CPU per sample
(eval_cnn.py:150-192).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..bev.rasterize import decode_map_transport
from ..bev.voxelize import dequantize_points, voxelize_packed
from ..boxes.anchors import generate_anchors
from ..boxes.nms import Detections, batched_postprocess
from ..configs import ExperimentConfig
from ..models import build_model
from .mesh import create_mesh, local_batch_slice
from .sharding import batch_sharding, replicated


class StreamingInferencer:
    """Compile-once, feed-forever detector over a device mesh.

    Usage:
        inf = StreamingInferencer(cfg, variables)          # builds mesh
        for batch in stream:                               # host batches
            det = inf(batch)                               # Detections (host)
    """

    def __init__(self, cfg: ExperimentConfig, variables, mesh=None,
                 transport: str = "points", num_chunks: int = 512):
        """``transport``:

        - "points" (default): ship packed points; voxelize on device
          (training-identical dense-BEV path).
        - "chunks": build voxel placement chunks on the host (C++
          ``ib_build_chunks``) and run the fused voxelize+patch-embed
          serving kernel (ops.voxel_embed) — the dense BEV never exists
          in HBM; measured 61.6 -> 72.7 fps on v5e (docs/PERF.md). The
          ``__call__`` API is unchanged; ``num_chunks`` fixes the chunk
          capacity so the program compiles once (overfull bands drop
          their rarest-window cells — raise it if the data needs more).
        """
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else create_mesh(cfg.mesh)
        self.model = build_model(cfg)
        self.transport = transport
        self.num_chunks = num_chunks
        anchors = jnp.asarray(generate_anchors(cfg.grid, cfg.anchors))
        rep = replicated(self.mesh)
        self.variables = jax.device_put(variables, rep)
        self._b_shard = batch_sharding(self.mesh, cfg.mesh)
        grid, ev = cfg.grid, cfg.eval
        mdt = getattr(self.model, "dtype", jnp.float32)

        def postprocess(cls_l, box_d, int_l):
            return batched_postprocess(
                cls_l, box_d, int_l, anchors,
                confidence_threshold=ev.confidence_threshold,
                nms_iou_threshold=ev.nms_iou_threshold,
                max_pre_nms=ev.max_pre_nms,
                max_detections=ev.max_detections,
            )

        def infer(variables, points, points_valid, map_bev):
            lidar = jax.vmap(lambda p, v: voxelize_packed(p, v, grid))(
                dequantize_points(points), points_valid
            )
            cls_l, box_d, int_l = self.model.apply(
                variables, lidar,
                decode_map_transport(map_bev, grid.map_channels, lidar.dtype),
            )
            return postprocess(cls_l, box_d, int_l)

        def infer_chunks(variables, chunks, map_bev):
            # widen narrow-transport index dtypes (u8 slots / i16 channels,
            # see build_chunks) back to the kernel's i32 — an elementwise
            # convert inside the program (~0.05 ms/batch at HBM speed) that
            # buys a ~33% smaller host->device transfer
            chunks = chunks._replace(
                wid=chunks.wid.astype(jnp.int32),
                sl=chunks.sl.astype(jnp.int32),
                ch=chunks.ch.astype(jnp.int32),
            )
            cls_l, box_d, int_l = self.model.apply(
                variables, chunks,
                decode_map_transport(map_bev, grid.map_channels, mdt),
            )
            return postprocess(cls_l, box_d, int_l)

        det_shard = Detections(
            boxes_xywha=self._b_shard, scores=self._b_shard,
            intentions=self._b_shard, valid=self._b_shard,
            num_conf=self._b_shard, num_kept=self._b_shard,
        )
        if transport == "chunks":
            from ..ops.voxel_embed import VoxelChunks

            chunk_shard = VoxelChunks(*([self._b_shard] * 5))
            self._infer = jax.jit(
                infer_chunks,
                in_shardings=(rep, chunk_shard, self._b_shard),
                out_shardings=det_shard,
            )
        else:
            self._infer = jax.jit(
                infer,
                in_shardings=(rep, self._b_shard, self._b_shard, self._b_shard),
                out_shardings=det_shard,
            )

    @property
    def batch_multiple(self) -> int:
        """Global batch must be a multiple of the data-axis size."""
        return self.mesh.devices.shape[0]

    def build_chunks(self, points, points_valid):
        """Host side of the chunk transport (callable from loader threads
        so chunk building overlaps device inference).

        Index fields ship NARROW — slot-in-window as u8 (window=64 slots),
        channel as i16 (< 32768 BEV channels) — and are widened to the
        kernel's i32 inside the jitted program. Exact (pure dtype
        round-trip, unused slots hold zeros); cuts the chunk transfer from
        3.95 to 2.64 MB/sample, which is the difference wherever the
        host->device link (tunnel, DCN feed) is the sustained-rate
        limiter."""
        from ..ops.voxel_embed import (WINDOW, build_voxel_chunks,
                                       stack_voxel_chunks)

        pts = np.asarray(points)
        if pts.dtype == np.int16:  # i16-cm transport (quantize_points_cm)
            pts = pts.astype(np.float32) * np.asarray(
                [0.01, 0.01, 0.01, 1.0], np.float32)
        vld = np.asarray(points_valid)
        chunks = stack_voxel_chunks([
            build_voxel_chunks(
                pts[i], vld[i], self.cfg.grid,
                self.cfg.vit.patch_size, num_chunks=self.num_chunks,
                on_overflow="drop",
            )[0]
            for i in range(pts.shape[0])
        ])
        g = self.cfg.grid
        if WINDOW <= 256 and g.lidar_total_channels < 32768:
            chunks = chunks._replace(
                sl=np.asarray(chunks.sl).astype(np.uint8),
                ch=np.asarray(chunks.ch).astype(np.int16),
            )
        return chunks

    def infer_chunks(self, chunks, map_bev, blocking: bool = True) -> Detections:
        """Run pre-built placement chunks (transport='chunks' only).

        ``blocking=False`` returns DEVICE-resident Detections immediately
        after dispatch (XLA runs async); call :meth:`fetch` on the result
        when you need host arrays. A double-buffered serving loop submits
        batch i+1 before fetching batch i, overlapping device compute
        with the detection readback — on hosts where the readback has
        nontrivial latency this is the difference between serialized and
        pipelined sustained throughput."""
        args = local_batch_slice(
            {"chunks": chunks, "map_bev": map_bev}, self.mesh, self.cfg.mesh,
        )
        det = self._infer(self.variables, args["chunks"], args["map_bev"])
        return self.fetch(det) if blocking else det

    @staticmethod
    def fetch(det: Detections) -> Detections:
        """Device Detections (from ``blocking=False``) -> host numpy."""
        return jax.tree.map(np.asarray, det)

    def __call__(self, points, points_valid, map_bev) -> Detections:
        if self.transport == "chunks":
            return self.infer_chunks(
                self.build_chunks(points, points_valid), map_bev)
        args = local_batch_slice(
            {"points": points, "points_valid": points_valid, "map_bev": map_bev},
            self.mesh, self.cfg.mesh,
        )
        det = self._infer(
            self.variables, args["points"], args["points_valid"], args["map_bev"]
        )
        return jax.tree.map(np.asarray, det)

    def stream(self, batches: Iterator) -> Iterator[Detections]:
        for batch in batches:
            yield self(batch["points"], batch["points_valid"], batch["map_bev"])
