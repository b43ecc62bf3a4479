"""End-to-end intentbev demo on a synthetic Argoverse-2-layout log.

Generates a fake AV2 log, precomputes intention labels, trains IntentNetViT
for a few steps, evaluates with the reference metric suite, and runs the
streaming sweep-ring inference path — all on whatever backend is available
(pass --platform cpu to force CPU).

    python examples/end_to_end_demo.py --workdir /tmp/intentbev-demo
"""

from __future__ import annotations

import argparse
import dataclasses
import shutil
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/intentbev-demo")
    p.add_argument("--platform", default=None)
    p.add_argument("--steps", type=int, default=80)  # ~80 steps overfit the demo log to mAP@0.5 ~ 0.6
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from intentbev.configs import tiny_test_config
    from intentbev.data.synthetic import write_synthetic_log
    from intentbev.data.streaming import make_ring, push_sweep, voxelize_ring
    from intentbev.precompute_labels import run as precompute_labels
    from intentbev.train import train
    from intentbev.evaluate import evaluate

    work = Path(args.workdir)
    shutil.rmtree(work, ignore_errors=True)
    split = work / "train"
    split.mkdir(parents=True)

    print("== 1. synthetic AV2 log")
    write_synthetic_log(
        split, log_id="demolog00000001", num_frames=12, seed=0, ego_speed=0.0,
        vehicles=[
            {"start": (4.0, 1.0), "velocity": (0.0, 0.0), "yaw": 0.0,
             "category": "REGULAR_VEHICLE"},
            {"start": (-1.0, -4.0), "velocity": (0.0, 0.0), "yaw": 1.57,
             "category": "REGULAR_VEHICLE"},
        ])

    print("== 2. intention label precompute")
    precompute_labels(str(work), ["train"], force=True)

    print("== 3. train IntentNetViT (tiny config)")
    cfg = tiny_test_config()
    grid = dataclasses.replace(cfg.grid, lidar_sweeps=3)
    vit = dataclasses.replace(
        cfg.vit, lidar_input_channels=grid.lidar_total_channels, drop_path_rate=0.0)
    tr = dataclasses.replace(cfg.train, batch_size=4, num_epochs=10,
                             learning_rate=3e-4, log_every_steps=10,
                             checkpoint_every_steps=10_000)
    cfg = dataclasses.replace(cfg, grid=grid, vit=vit, train=tr)
    train(cfg, str(split), str(work / "run"), num_workers=2, max_steps=args.steps)

    print("== 4. evaluate (reference metric suite)")
    evaluate(str(work / "run"), str(split), num_workers=2)

    print("== 5. streaming sweep-ring inference")
    rng = np.random.default_rng(0)
    ring = make_ring(grid.lidar_sweeps, 1024)
    for i in range(grid.lidar_sweeps):
        pts = np.stack([
            rng.uniform(-6, 8, 1024), rng.uniform(-6, 6, 1024),
            rng.uniform(-1.5, 1.0, 1024), rng.uniform(0, 255, 1024)], 1).astype(np.float32)
        ring = push_sweep(ring, jnp.asarray(pts), jnp.ones(1024, bool),
                          jnp.asarray(np.eye(4), dtype=jnp.float32))
    bev = voxelize_ring(ring, jnp.asarray(np.eye(4), dtype=jnp.float32), grid)
    print(f"ring BEV: {bev.shape}, occupied cells: {int((np.asarray(bev) > 0).sum())}")
    print("demo complete.")


if __name__ == "__main__":
    main()
