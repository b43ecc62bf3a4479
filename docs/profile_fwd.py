"""Capture + summarise a TPU profile of the bench inference step.

Runs bench.py's jitted infer (voxelize + twin-ViT + decode + NMS, batch 8,
bf16) for a few chained steps under jax.profiler with a perfetto trace,
then aggregates device-op durations by fusion-name prefix and prints a
top-K table — the source of the op tables in PERF.md.

Usage:  python docs/profile_fwd.py [out_dir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time

import jax


def capture(out_dir: str, steps: int = 6):
    sys.path.insert(0, ".")
    import os

    # match bench.py's serving-process defaults (bench.main sets these too)
    os.environ.setdefault("INTENTBEV_LNMLP_BLOCK", "1024")
    os.environ.setdefault("INTENTBEV_MLP_HCHUNK", "768")
    os.environ.setdefault("INTENTBEV_GELU", "sigmoid")
    from bench import build_bench

    infer, args = build_bench(
        batch_size=8, points_per_sweep=16384, int8="--int8" in sys.argv,
        voxembed="--voxembed" in sys.argv)
    variables, chained, *rest = args

    out = infer(variables, chained, *rest)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir, create_perfetto_trace=True):
        det = None
        for _ in range(steps):
            det, chained = infer(variables, chained, *rest)
        jax.block_until_ready((det, chained))
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt*1000:.1f} ms -> {dt/steps*1000:.1f} ms/step, "
          f"{8*steps/dt:.1f} fps")
    return steps


def summarise(out_dir: str, steps: int, top: int = 25):
    paths = glob.glob(f"{out_dir}/**/*.json.gz", recursive=True)
    assert paths, f"no perfetto trace under {out_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # device-side complete events only; group by name up to trailing digits
    durs: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith(("Thread", "process_", "Steps")):
            continue
        base = name.rstrip("0123456789.").rstrip("_")
        durs[base] += e["dur"]
        counts[base] += 1
    total = sum(durs.values())
    print(f"\n{'ms/step':>9}  {'%':>5}  {'calls':>6}  op group")
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us/1000/steps:9.2f}  {us/total*100:5.1f}  "
              f"{counts[name]//steps:6d}  {name[:90]}")


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/tmp/prof_fwd"
    n = capture(out_dir)
    summarise(out_dir, n)
