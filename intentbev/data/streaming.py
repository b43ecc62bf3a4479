"""Device-resident sweep ring buffer for streaming multi-sweep inference.

The reference (and our batch loader) re-transforms all 10 LiDAR sweeps to
the newest ego frame on the host for EVERY frame (reference
dataset.py:305-342) — each sweep is processed 10 times. In streaming
deployment each sweep arrives once: this buffer keeps the last S sweeps on
device in their own capture frames together with their world poses; per
frame, a single jitted program re-projects all sweeps into the current ego
frame (a tiny [P, 3] x [3, 3] matmul per sweep) and scatter-max voxelizes.
Host->device traffic per frame drops from S sweeps to one.

Works standalone on one chip or under the batch-sharded
StreamingInferencer (one ring per stream; rings are just pytrees).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import GridConfig


class SweepRing(NamedTuple):
    points: jnp.ndarray   # f32[S, P, 4] in each sweep's own ego frame
    valid: jnp.ndarray    # bool[S, P]
    poses: jnp.ndarray    # f32[S, 4, 4] world_SE3_sweep
    head: jnp.ndarray     # i32 scalar: next slot to overwrite
    count: jnp.ndarray    # i32 scalar: sweeps pushed so far (<= S)


def make_ring(num_sweeps: int, max_points: int) -> SweepRing:
    return SweepRing(
        points=jnp.zeros((num_sweeps, max_points, 4), jnp.float32),
        valid=jnp.zeros((num_sweeps, max_points), bool),
        poses=jnp.tile(jnp.eye(4)[None], (num_sweeps, 1, 1)),
        head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


@jax.jit
def push_sweep(
    ring: SweepRing,
    points: jnp.ndarray,   # f32[P, 4] (x, y, z, intensity) in the sweep frame
    valid: jnp.ndarray,    # bool[P]
    world_se3: jnp.ndarray,  # f32[4, 4]
) -> SweepRing:
    """Insert the newest sweep, overwriting the oldest slot."""
    return SweepRing(
        points=ring.points.at[ring.head].set(points),
        valid=ring.valid.at[ring.head].set(valid),
        poses=ring.poses.at[ring.head].set(world_se3),
        head=(ring.head + 1) % ring.points.shape[0],
        count=jnp.minimum(ring.count + 1, ring.points.shape[0]),
    )


@functools.partial(jax.jit, static_argnames=("grid", "out_dtype"))
def voxelize_ring(
    ring: SweepRing,
    current_world_se3: jnp.ndarray,  # f32[4, 4] of the NEWEST sweep's ego
    grid: GridConfig,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Re-project all buffered sweeps into the current ego frame and
    voxelize -> f32[H, W, S*Z].

    Channel order matches the batch path (channel = sweep_age_slot * Z +
    z_slice with slot 0 = OLDEST buffered sweep), so a model trained on the
    batch loader consumes ring BEVs directly once the ring is warm.
    """
    from ..bev.voxelize import voxelize_packed

    s = ring.points.shape[0]
    # chronological order: oldest first (head points at the oldest slot)
    order = (ring.head + jnp.arange(s)) % s
    pts = ring.points[order]
    valid = ring.valid[order]
    poses = ring.poses[order]
    # slots that have never been written are invalid until the ring warms up
    age = jnp.arange(s)  # 0 = oldest
    warm = age >= (s - ring.count)
    valid = valid & warm[:, None]

    # rel = inv(current) @ world_SE3_sweep, computed on device
    r = current_world_se3[:3, :3]
    t = current_world_se3[:3, 3]
    inv = jnp.eye(4).at[:3, :3].set(r.T).at[:3, 3].set(-r.T @ t)
    rel = jnp.einsum("ij,sjk->sik", inv, poses)  # f32[S, 4, 4]

    xyz = pts[..., :3]
    xyz_cur = jnp.einsum("sij,spj->spi", rel[:, :3, :3], xyz) + rel[:, None, :3, 3]
    pts_cur = jnp.concatenate([xyz_cur, pts[..., 3:]], axis=-1)
    return voxelize_packed(pts_cur, valid, grid, out_dtype=out_dtype)


def batched_voxelize_rings(
    rings: SweepRing,
    current_world_se3: jnp.ndarray,  # f32[B, 4, 4]
    grid: GridConfig,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Voxelize a fleet of B independent stream rings -> [B, H, W, S*Z].

    ``rings``: a SweepRing whose leaves carry a leading batch dim (stack B
    single-stream rings with jax.tree.map). Feeds directly into
    parallel.StreamingInferencer for batch-sharded multi-stream serving.
    """
    return jax.vmap(lambda r, p: voxelize_ring(r, p, grid, out_dtype=out_dtype))(
        rings, current_world_se3
    )


def stack_rings(rings: list[SweepRing]) -> SweepRing:
    """B single-stream rings -> one batched SweepRing pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *rings)


def se3_from_pose_row(pose) -> np.ndarray:
    """Convenience: AV2 pose row (tx_m..qw) -> 4x4 world_SE3_ego (host)."""
    from ..geometry import se3_from_quat_translation

    return se3_from_quat_translation(
        [pose["qx"], pose["qy"], pose["qz"], pose["qw"]],
        [pose["tx_m"], pose["ty_m"], pose["tz_m"]],
    ).astype(np.float32)
