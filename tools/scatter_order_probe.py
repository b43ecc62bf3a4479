"""Probe: does point ORDER change the voxelizer scatter's device time?

The bench feeds uniform-random points; real AV2 sweeps are stored in
ring-scan order (angularly contiguous, hence spatially local in BEV).
If the scatter is bound by random 2-byte read-modify-writes over the
1.34 GB target, locality should cut it substantially — which would both
(a) justify feeding the bench realistic ring-ordered points and (b)
motivate a cheap host-side cell-order sort in the loader.

Profiles three orderings of the SAME point multiset through the jitted
chained voxelizer: random, ring (sorted by atan2), cell (sorted by
flattened row*W+col).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from intentbev.configs import default_vit_config
from intentbev.bev.voxelize import voxelize_packed

cfg = default_vit_config()
g = cfg.grid
B, S, P = 8, g.lidar_sweeps, 16384

rng = np.random.default_rng(0)
# same distribution as bench.py: uniform in-grid coordinates
x = rng.uniform(-20.0, 60.0, (B, S, P)).astype(np.float32)
y = rng.uniform(-72.0, 72.0, (B, S, P)).astype(np.float32)
z = rng.uniform(g.z_min, g.z_max - 1e-3, (B, S, P)).astype(np.float32)
inten = rng.uniform(0, 255, (B, S, P)).astype(np.float32)
pts = np.stack([x, y, z, inten], axis=-1)
valid = np.ones((B, S, P), bool)


def reorder(pts: np.ndarray, key: str) -> np.ndarray:
    out = np.empty_like(pts)
    for b in range(B):
        for s in range(S):
            p = pts[b, s]
            if key == "ring":
                k = np.argsort(np.arctan2(p[:, 1], p[:, 0]), kind="stable")
            elif key == "cell":
                col = np.floor(g.pixel_offset_x + p[:, 1] / g.voxel_size_m)
                row = np.floor(g.pixel_offset_y - p[:, 0] / g.voxel_size_m)
                k = np.argsort(row * g.width_px + col, kind="stable")
            else:
                k = np.arange(len(p))
            out[b, s] = p[k]
    return out


@jax.jit
def vox_chain(pts, valid, carry):
    bev = jax.vmap(lambda p, v: voxelize_packed(p, v, g, out_dtype=jnp.bfloat16))(
        pts, valid
    )
    # carry must be DATA-DEPENDENT and change every iteration, else the
    # runtime elides the repeated identical dispatch (carry + a dense-hit
    # region's sum grows monotonically, so no two iterations match)
    return bev, carry + bev[:, 200, :, :].astype(jnp.float32).sum()


def bench_order(key: str, iters: int = 12) -> float:
    p = jnp.asarray(reorder(pts, key))
    v = jnp.asarray(valid)
    carry = jnp.zeros(())
    _, carry = vox_chain(p, v, carry)  # compile + warm
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        # chain via carry so dispatches aren't elided
        bev, carry = vox_chain(p + carry * 0, v, carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


for key in ("random", "ring", "cell"):
    ms = bench_order(key)
    print(f"{key:8s}: {ms:7.2f} ms/batch-8 chained voxelize")
