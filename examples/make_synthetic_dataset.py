"""Build a multi-log, full-size synthetic AV2-layout dataset.

Produces train/ and val/ splits of scripted scenes whose vehicle tracks
cover every intention class the heuristic labeler can assign (reference
heuristic_labeling.py:10-124): keep-lane movers, parked cars, decelerating
(stopping) cars, left/right turners, and lane changers — then runs the
intent-label precompute over both splits so the result is directly
trainable with ``intentbev-train`` at full flagship geometry.

Used for the training-quality evidence run (docs/TRAINING.md): no real
Argoverse 2 data exists in this environment, so metric parity can only be
evidenced as a learning TREND (mAP/F1 rising over steps) on this dataset.

Usage:
    python examples/make_synthetic_dataset.py --out /data/synth \
        --train_logs 6 --val_logs 2 --frames 40 --points 30000
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from intentbev.data.synthetic import write_synthetic_log  # noqa: E402
from intentbev.precompute_labels import run as precompute_run  # noqa: E402


def scripted_vehicles(rng: np.random.Generator, n: int = 10) -> list[dict]:
    """A scene mix covering the intent taxonomy; positions ride alongside
    the ego corridor (ego moves +x at 5 m/s; BEV covers x in [-20, 60],
    y in [-72, 72] ego-relative)."""
    vehicles: list[dict] = []

    def lane_y():
        return float(rng.choice([-7.0, -3.5, 0.0, 3.5, 7.0])) + float(rng.normal(0, 0.3))

    behaviors = [
        "keep_lane", "keep_lane", "keep_lane",
        "parked", "parked",
        "stopping",
        "turn_left", "turn_right",
        "lane_change_left", "lane_change_right",
    ]
    for b in rng.permutation(behaviors)[:n]:
        x0 = float(rng.uniform(5.0, 45.0))
        y0 = lane_y()
        speed = float(rng.uniform(3.0, 8.0))
        if b == "keep_lane":
            vehicles.append({"start": (x0, y0), "velocity": (speed, 0.0), "yaw": 0.0})
        elif b == "parked":
            vehicles.append({"start": (x0, float(rng.choice([-9.0, 9.0]))),
                             "velocity": (0.0, 0.0), "yaw": 0.0})
        elif b == "stopping":
            vehicles.append({"start": (x0, y0), "velocity": (speed, 0.0),
                             "yaw": 0.0, "accel": -max(2.0, speed / 1.5)})
        elif b in ("turn_left", "turn_right"):
            sign = 1.0 if b == "turn_left" else -1.0
            # >20 deg heading change within the 3 s horizon -> TURN_*
            vehicles.append({"start": (x0, y0), "velocity": (speed, 0.0),
                             "yaw": 0.0, "yaw_rate": sign * float(rng.uniform(0.25, 0.45))})
        else:
            sign = 1.0 if b.endswith("left") else -1.0
            # 5-20 deg drift over the horizon -> LANE_CHANGE_*
            vehicles.append({"start": (x0, y0), "velocity": (speed, 0.0),
                             "yaw": 0.0, "yaw_rate": sign * float(rng.uniform(0.05, 0.10))})
    return vehicles


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--train_logs", type=int, default=6)
    p.add_argument("--val_logs", type=int, default=2)
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--points", type=int, default=30000,
                   help="LiDAR points per sweep (real AV2 is ~100k)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    root = Path(args.out)
    t0 = time.time()
    for split, count in (("train", args.train_logs), ("val", args.val_logs)):
        split_dir = root / split
        split_dir.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            seed = args.seed * 1000 + (0 if split == "train" else 500) + i
            rng = np.random.default_rng(seed)
            log_dir = write_synthetic_log(
                split_dir,
                log_id=f"{split}log{i:04d}aaaaaaaa",
                num_frames=args.frames,
                points_per_sweep=args.points,
                seed=seed,
                vehicles=scripted_vehicles(rng),
            )
            print(f"wrote {log_dir}", flush=True)
    print(f"logs written in {time.time()-t0:.1f}s; precomputing intent labels...",
          flush=True)
    precompute_run(str(root), ["train", "val"], force=True)
    print(f"done in {time.time()-t0:.1f}s total")


if __name__ == "__main__":
    main()
