"""Sweep ring buffer: streaming voxelization == batch-path voxelization."""

import numpy as np
import jax.numpy as jnp

from intentbev.configs import GridConfig
from intentbev.bev.voxelize import voxelize_numpy
from intentbev.data.streaming import make_ring, push_sweep, voxelize_ring
from intentbev.geometry import se3_from_quat_translation, se3_inverse, transform_points

GRID = GridConfig(height_px=64, width_px=96, lidar_height_channels=4, lidar_sweeps=3)


def _pose(x, yaw=0.0):
    return se3_from_quat_translation(
        [0, 0, np.sin(yaw / 2), np.cos(yaw / 2)], [x, 0.0, 0.0]
    )


class TestSweepRing:
    def test_matches_batch_voxelizer(self, rng):
        S, P = 3, 400
        # ego moves forward 1 m per sweep, sweeps captured in their own frames
        sweeps, poses = [], []
        for i in range(S):
            pts = np.stack([
                rng.uniform(-8, 10, P), rng.uniform(-8, 8, P),
                rng.uniform(-1.5, 2.0, P), rng.uniform(0, 255, P)], 1).astype(np.float32)
            sweeps.append(pts)
            poses.append(_pose(1.0 * i, yaw=0.05 * i))

        ring = make_ring(S, P)
        for pts, pose in zip(sweeps, poses):
            ring = push_sweep(ring, jnp.asarray(pts), jnp.ones(P, bool), jnp.asarray(pose, dtype=jnp.float32))
        got = np.asarray(voxelize_ring(ring, jnp.asarray(poses[-1], dtype=jnp.float32), GRID))

        # batch path: host re-transforms every sweep to the newest ego frame
        cur_inv = se3_inverse(poses[-1])
        pts_list, int_list = [], []
        for pts, pose in zip(sweeps, poses):
            rel = cur_inv @ pose
            pts_list.append(transform_points(pts[:, :3].astype(np.float64), rel).astype(np.float32))
            int_list.append(pts[:, 3])
        want = voxelize_numpy(pts_list, int_list, GRID)
        np.testing.assert_allclose(got, want, atol=2e-2)

    def test_cold_ring_masks_unwritten_slots(self, rng):
        S, P = 3, 100
        ring = make_ring(S, P)
        pts = np.stack([rng.uniform(-5, 5, P), rng.uniform(-5, 5, P),
                        rng.uniform(-1, 1, P), rng.uniform(1, 255, P)], 1).astype(np.float32)
        ring = push_sweep(ring, jnp.asarray(pts), jnp.ones(P, bool),
                          jnp.asarray(np.eye(4), dtype=jnp.float32))
        bev = np.asarray(voxelize_ring(ring, jnp.asarray(np.eye(4), dtype=jnp.float32), GRID))
        z = GRID.lidar_height_channels
        # only the NEWEST slot (last sweep channels) carries data
        assert bev[..., (S - 1) * z:].max() > 0
        assert bev[..., : (S - 1) * z].max() == 0

    def test_batched_rings(self, rng):
        from intentbev.data.streaming import batched_voxelize_rings, stack_rings
        import jax

        S, P, B = 2, 60, 3
        rings, poses = [], []
        for b in range(B):
            ring = make_ring(S, P)
            for i in range(S):
                pts = np.stack([rng.uniform(-5, 5, P), rng.uniform(-5, 5, P),
                                rng.uniform(-1, 1, P), np.full(P, b + 1.0)], 1).astype(np.float32)
                ring = push_sweep(ring, jnp.asarray(pts), jnp.ones(P, bool),
                                  jnp.asarray(np.eye(4), dtype=jnp.float32))
            rings.append(ring)
            poses.append(np.eye(4, dtype=np.float32))
        batched = stack_rings(rings)
        bev = np.asarray(batched_voxelize_rings(batched, jnp.asarray(np.stack(poses)), GRID))
        assert bev.shape == (B, 64, 96, 8)
        for b in range(B):
            assert bev[b].max() == b + 1.0  # streams stay independent

    def test_ring_wraps(self, rng):
        S, P = 2, 50
        ring = make_ring(S, P)
        for i in range(5):  # wraps twice
            pts = np.full((P, 4), i + 1, np.float32)
            pts[:, 2] = 0.0
            ring = push_sweep(ring, jnp.asarray(pts), jnp.ones(P, bool),
                              jnp.asarray(np.eye(4), dtype=jnp.float32))
        assert int(ring.count) == S
        bev = np.asarray(voxelize_ring(ring, jnp.asarray(np.eye(4), dtype=jnp.float32), GRID))
        # newest sweep has intensity 5, previous 4
        z = GRID.lidar_height_channels
        assert bev[..., (S - 1) * z:].max() == 5.0
        assert 0 < bev[..., : z].max() <= 4.0
