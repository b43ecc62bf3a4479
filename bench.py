"""End-to-end throughput benchmark: BEV frames/sec/chip.

Measures the full per-frame inference path on the flagship IntentNetViT —
device voxelization of packed multi-sweep LiDAR + twin ViT-S/8 forward +
decode + NMS — as ONE jitted program, bf16 compute, on whatever backend is
available (the driver runs this on a real TPU chip).

Prints one JSON line:
  {"metric": "bev_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 2000.0}
(north star >= 2000 frames/s/chip e2e, BASELINE.json).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_bench(batch_size: int, points_per_sweep: int, int8: bool = False):
    from intentbev.configs import default_vit_config
    from intentbev.boxes.anchors import generate_anchors
    from intentbev.boxes.nms import batched_postprocess
    from intentbev.bev.voxelize import voxelize_packed
    from intentbev.models import IntentNetViT

    cfg = default_vit_config()
    on_tpu = jax.default_backend() == "tpu"
    vit_cfg = dataclasses.replace(
        cfg.vit, use_flash_attention=on_tpu, serving_int8=int8
    )
    model = IntentNetViT(vit_cfg, cfg.heads, dtype=jnp.bfloat16)
    g = cfg.grid

    lidar0 = jnp.zeros((1, g.height_px, g.width_px, g.lidar_total_channels), jnp.float32)
    map0 = jnp.zeros((1, g.height_px, g.width_px, g.map_channels), jnp.float32)
    # jit the init: eager init dispatches every op separately, which is
    # minutes of round-trips on a tunneled/remote device backend
    variables = jax.jit(model.init)(jax.random.key(0), lidar0, map0)

    anchors = jnp.asarray(generate_anchors(g, cfg.anchors))
    ev = cfg.eval

    @jax.jit
    def infer(variables, points, points_valid, map_bev):
        lidar = jax.vmap(
            lambda p, v: voxelize_packed(p, v, g, out_dtype=jnp.bfloat16)
        )(points, points_valid)
        cls_l, box_d, int_l = model.apply(variables, lidar, map_bev)
        det = batched_postprocess(
            cls_l, box_d, int_l, anchors,
            confidence_threshold=ev.confidence_threshold,
            nms_iou_threshold=ev.nms_iou_threshold,
            max_pre_nms=ev.max_pre_nms,
            max_detections=ev.max_detections,
        )
        # chain a scalar of the result back into the points so iteration i+1
        # data-depends on iteration i — guarantees every step really executes
        # (some runtimes elide computations with unconsumed outputs)
        chained = points + 0.0 * jnp.sum(det.scores)
        return det, chained

    rng = np.random.default_rng(0)
    s = g.lidar_sweeps
    pts = np.zeros((batch_size, s, points_per_sweep, 4), np.float32)
    pts[..., 0] = rng.uniform(-20, 60, pts.shape[:3])
    pts[..., 1] = rng.uniform(-70, 70, pts.shape[:3])
    pts[..., 2] = rng.uniform(-2, 3.7, pts.shape[:3])
    pts[..., 3] = rng.uniform(0, 255, pts.shape[:3])
    map_bev = (rng.uniform(0, 1, (batch_size, g.height_px, g.width_px, g.map_channels))
               < 0.05).astype(np.float32)

    args = (
        variables,
        jax.device_put(jnp.asarray(pts)),
        jax.device_put(jnp.ones((batch_size, s, points_per_sweep), bool)),
        jax.device_put(jnp.asarray(map_bev)),
    )
    return infer, args


def main():
    import sys

    int8 = "--int8" in sys.argv  # W8A8 serving mode (configs.serving_int8)
    batch_size = 8
    points_per_sweep = 16384
    infer, args = build_bench(batch_size, points_per_sweep, int8=int8)

    variables, points, points_valid, map_bev = args

    # compile + warmup
    out = infer(variables, points, points_valid, map_bev)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        det, points = infer(variables, points, points_valid, map_bev)
    jax.block_until_ready((det, points))
    dt = time.perf_counter() - t0

    frames_per_sec = batch_size * iters / dt
    print(json.dumps({
        "metric": "bev_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
