"""Op-level device profile of one serving/training step (item: CNN roofline).

Runs N steps of the chosen path under jax.profiler.trace and prints the
top op groups by total device time, parsed from the chrome-trace dump.
This is the per-op attribution method behind docs/PERF.md's profile
tables.

    python tools/profile_step.py --model cnn --steps 6
    python tools/profile_step.py --model vit --voxembed --steps 6
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile


def run_and_trace(args) -> str:
    if args.model == "vit" and args.voxembed:
        # flagship serving knobs, as bench.py sets them
        os.environ.setdefault("INTENTBEV_LNMLP_BLOCK", "1024")
        os.environ.setdefault("INTENTBEV_MLP_HCHUNK", "768")
        os.environ.setdefault("INTENTBEV_GELU", "sigmoid")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from intentbev.boxes.anchors import generate_anchors
    from intentbev.boxes.nms import batched_postprocess
    from intentbev.configs import default_cnn_config, default_vit_config
    from intentbev.models import IntentNetCNN, IntentNetViT, build_model

    cfg = default_cnn_config() if args.model == "cnn" else default_vit_config()
    g = cfg.grid
    if args.model == "cnn":
        model = IntentNetCNN(cfg.cnn, cfg.heads, dtype=jnp.bfloat16)
    else:
        model = IntentNetViT(cfg.vit, cfg.heads, dtype=jnp.bfloat16)

    if args.model == "cnn" and args.voxembed:
        # CNN chunk-transport path: voxel_fill_bev -> CNN forward -> NMS
        import numpy as np  # noqa: F811

        from intentbev.boxes.anchors import generate_anchors
        from intentbev.boxes.nms import batched_postprocess
        from intentbev.ops.voxel_embed import (
            CNN_CHUNK_PATCH, build_voxel_chunks, stack_voxel_chunks,
            voxel_fill_bev)

        B = args.batch
        r = np.random.default_rng(0)
        s = g.lidar_sweeps
        pts = np.zeros((B, s, 16384, 4), np.float32)
        pts[..., 0] = r.uniform(-20, 60, pts.shape[:3])
        pts[..., 1] = r.uniform(-70, 70, pts.shape[:3])
        pts[..., 2] = r.uniform(-2, 3.7, pts.shape[:3])
        pts[..., 3] = r.uniform(0, 255, pts.shape[:3])
        ones = np.ones((s, 16384), bool)
        chunks = stack_voxel_chunks(
            [build_voxel_chunks(pts[b], ones, g, CNN_CHUNK_PATCH)[0]
             for b in range(B)])
        chunks = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a)), chunks)
        mp = jnp.asarray(
            (r.uniform(0, 1, (B, g.height_px, g.width_px, g.map_channels))
             < 0.05).astype(np.float32), jnp.bfloat16)
        variables = jax.jit(model.init)(
            jax.random.key(0),
            jnp.zeros((1, g.height_px, g.width_px, g.lidar_total_channels)),
            jnp.zeros((1, g.height_px, g.width_px, g.map_channels)))
        anchors = jnp.asarray(generate_anchors(cfg.grid, cfg.anchors))
        ev = cfg.eval

        # same layout sweep knob as bench.py (docs/PERF.md "CNN family")
        fill_layout = os.environ.get("INTENTBEV_CNN_FILL_LAYOUT", "")
        fill_dt = jnp.float32 if fill_layout == "f32" else jnp.bfloat16

        @jax.jit
        def step(variables, chunks, mp):
            lidar = voxel_fill_bev(
                chunks, (g.height_px, g.width_px), g.lidar_total_channels,
                CNN_CHUNK_PATCH, dtype=fill_dt)
            if fill_layout == "barrier":
                lidar = jax.lax.optimization_barrier(lidar)
            cls_l, box_d, int_l = model.apply(variables, lidar, mp)
            det = batched_postprocess(
                cls_l, box_d, int_l, anchors,
                confidence_threshold=ev.confidence_threshold,
                nms_iou_threshold=ev.nms_iou_threshold,
                max_pre_nms=ev.max_pre_nms, max_detections=ev.max_detections)
            chained = chunks._replace(val=chunks.val + (
                0.0 * jnp.sum(det.scores)).astype(chunks.val.dtype))
            return det, chained

        det, chunks = step(variables, chunks, mp)
        jax.block_until_ready(det)
        import time
        t0 = time.perf_counter()
        for _ in range(args.steps):
            det, chunks = step(variables, chunks, mp)
        jax.block_until_ready(det)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"timed (untraced): {dt * 1000:.1f} ms/step, "
              f"{B / dt:.1f} frames/s")
        trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="ibprof_")
        with jax.profiler.trace(trace_dir):
            for _ in range(args.steps):
                det, chunks = step(variables, chunks, mp)
            jax.block_until_ready(det)
        return trace_dir
    B = args.batch
    r = np.random.default_rng(0)
    lidar = jnp.asarray(
        (r.uniform(0, 1, (B, g.height_px, g.width_px, g.lidar_total_channels))
         < 0.02).astype(np.float32), jnp.bfloat16)
    mp = jnp.asarray(
        (r.uniform(0, 1, (B, g.height_px, g.width_px, g.map_channels))
         < 0.05).astype(np.float32), jnp.bfloat16)
    variables = jax.jit(build_model(cfg).init)(
        jax.random.key(0),
        jnp.zeros((1, g.height_px, g.width_px, g.lidar_total_channels)),
        jnp.zeros((1, g.height_px, g.width_px, g.map_channels)))
    anchors = jnp.asarray(generate_anchors(cfg.grid, cfg.anchors))
    ev = cfg.eval

    @jax.jit
    def step(variables, lidar, mp):
        cls_l, box_d, int_l = model.apply(variables, lidar, mp)
        det = batched_postprocess(
            cls_l, box_d, int_l, anchors,
            confidence_threshold=ev.confidence_threshold,
            nms_iou_threshold=ev.nms_iou_threshold,
            max_pre_nms=ev.max_pre_nms, max_detections=ev.max_detections)
        # chain so repeated calls can't be CSE'd away
        return det, lidar + (0.0 * jnp.sum(det.scores)).astype(lidar.dtype)

    det, lidar = step(variables, lidar, mp)  # compile + warm
    jax.block_until_ready(det)
    import time
    t0 = time.perf_counter()
    for _ in range(args.steps):
        det, lidar = step(variables, lidar, mp)
    jax.block_until_ready(det)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"timed (untraced): {dt * 1000:.1f} ms/step, "
          f"{B / dt:.1f} frames/s")

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="ibprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            det, lidar = step(variables, lidar, mp)
        jax.block_until_ready(det)
    return trace_dir


def parse(trace_dir: str, steps: int, top: int):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace files under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device-lane pids: processes named like "/device:TPU:0" or "TPU:x"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if "TPU" in n.upper() or "device" in n.lower():
                dev_pids.add(e["pid"])
    groups: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0)  # us
        name = e.get("name", "")
        if not dur or name.startswith(("run_", "Steps", "XLA Modules")):
            continue
        base = re.sub(r"[.\d]+$", "", name)
        groups[base] += dur
        counts[base] += 1
        total += dur
    print(f"\ntrace: {path}")
    print(f"device total: {total / 1000 / steps:.1f} ms/step over {steps} steps")
    print(f"{'op group':<52} {'ms/step':>9} {'calls/step':>11}")
    for name, us in sorted(groups.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name:<52} {us / 1000 / steps:>9.2f} "
              f"{counts[name] / steps:>11.1f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cnn", choices=["cnn", "vit"])
    p.add_argument("--voxembed", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--parse_only", default=None,
                   help="skip running; parse this trace dir")
    args = p.parse_args()
    if args.parse_only:
        parse(args.parse_only, args.steps, args.top)
        return
    trace_dir = run_and_trace(args)
    parse(trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
