"""Hard-benchmark synthetic features (VERDICT r4 missing #4): ray-shadow
occlusion, unannotated clutter, curved corridors, and train label noise —
the dataset knobs behind the ViT-vs-CNN separation experiment
(docs/TRAINING.md)."""

import json

import numpy as np
import pytest

from intentbev.data import synthetic as syn


class TestOcclusion:
    def test_shadowed_points_dropped(self, rng):
        """Points angularly behind an occluder mostly vanish; points in
        front of or beside it survive untouched."""
        n = 4000
        pts = np.stack([
            rng.uniform(1.0, 60.0, n),
            rng.uniform(-30.0, 30.0, n),
            np.full(n, -1.7),
        ], axis=1)
        occ = [(20.0, 0.0, 2.5)]  # disc ahead on the x axis
        out = syn._apply_occlusion(pts, occ, rng, drop_prob=1.0)

        az = np.arctan2(pts[:, 1], pts[:, 0])
        rr = np.hypot(pts[:, 0], pts[:, 1])
        half = np.arcsin(2.5 / 20.0)
        behind = (np.abs(az) < half) & (rr > 22.5)
        # exact complement at drop_prob=1
        assert len(out) == n - int(behind.sum())
        assert behind.sum() > 50  # the scene actually exercised the shadow
        out_az = np.arctan2(out[:, 1], out[:, 0])
        out_rr = np.hypot(out[:, 0], out[:, 1])
        assert not np.any((np.abs(out_az) < half) & (out_rr > 22.5))

    def test_partial_drop_prob(self, rng):
        n = 20000
        pts = np.stack([
            rng.uniform(25.0, 60.0, n),
            rng.uniform(-1.0, 1.0, n),
            np.full(n, -1.7),
        ], axis=1)  # all shadowed by the disc below
        out = syn._apply_occlusion(pts, [(15.0, 0.0, 3.0)], rng, 0.9)
        frac = len(out) / n
        assert 0.05 < frac < 0.15  # ~10% survive

    def test_ego_inside_disc_no_shadow(self, rng):
        pts = np.stack([np.full(10, 30.0), np.zeros(10), np.zeros(10)], axis=1)
        out = syn._apply_occlusion(pts, [(0.2, 0.0, 2.5)], rng, 1.0)
        assert len(out) == 10


class TestClutter:
    def test_points_in_offlane_band(self, rng):
        pts = syn.clutter_points(rng, 12)
        assert len(pts) > 0
        # group CENTERS sit in |y| in [7.5, 14]; member points can spill
        # a couple of meters (bush half-width 2.2, wall length along x)
        assert np.all(np.abs(pts[:, 1]) > 5.0)
        assert np.all(np.abs(pts[:, 1]) < 17.0)

    def test_arc_transform_moves_centers(self, rng):
        flat = syn.clutter_points(rng, 8)
        curved = syn.clutter_points(
            np.random.default_rng(0), 8, arc=(250.0, 1.0))
        assert len(curved) > 0
        # far down a curved corridor the band bends away from the straight
        # one; just assert the arc call produced finite, distinct layouts
        assert np.isfinite(curved).all()
        assert curved.shape != flat.shape or not np.allclose(curved, flat)


class TestCurvedGeometry:
    def test_arc_point_origin_tangent(self):
        x, y, yaw = syn.curved_arc_point(300.0, 0.0, 0.0, 1.0)
        assert (x, y, yaw) == (0.0, 0.0, 0.0)
        x, y, yaw = syn.curved_arc_point(300.0, 30.0, 0.0, 1.0)
        assert abs(x - 30.0) < 0.2 and 1.0 < y < 2.0  # t^2/2R = 1.5
        assert abs(yaw - 0.1) < 1e-9

    def test_lateral_offset_sign(self):
        # d > 0 is toward the arc center (the +y side for sign=+1)
        x1, y1, _ = syn.curved_arc_point(300.0, 0.0, 1.75, 1.0)
        assert y1 == pytest.approx(1.75)
        x2, y2, _ = syn.curved_arc_point(300.0, 0.0, 1.75, -1.0)
        assert y2 == pytest.approx(-1.75)

    def test_curved_map_rasterizes(self, tmp_path):
        from intentbev.bev.rasterize import (parse_map_json,
                                             rasterize_map_ego_centric)
        from intentbev.configs import GridConfig

        md = syn.curved_multi_lane_map_data(300.0, 1.0)
        map_path = tmp_path / "log_map_archive_test.json"
        map_path.write_text(json.dumps(md))
        grid = GridConfig()
        elements = parse_map_json(str(map_path))
        pose = {"tx_m": 20.0, "ty_m": 0.0,
                "qx": 0.0, "qy": 0.0, "qz": 0.0, "qw": 1.0}
        bev = rasterize_map_ego_centric(elements, pose, grid)
        assert bev.shape == (grid.height_px, grid.width_px,
                             grid.map_channels)
        assert bev.any(), "curved lanes must draw into the BEV"

    def test_curved_keep_laner_labels_keep_lane(self, tmp_path):
        """End-to-end through the REAL labeler: on a curved log built by
        the composer, keep-laners still label KEEP_LANE (speed envelope
        keeps 3s dh under 5 deg) and the log yields multiple classes."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "examples"))
        from make_synthetic_dataset import curved_scripted_vehicles

        from intentbev.precompute_labels import run as precompute_run
        from intentbev.utils.featherio import read_ipc_dataframe

        rng = np.random.default_rng(7)
        vehicles = curved_scripted_vehicles(rng, 300.0, 1.0, num_frames=40)
        split = tmp_path / "train"
        split.mkdir()
        syn.write_synthetic_log(
            split, log_id="curved01", num_frames=40, points_per_sweep=1500,
            vehicles=vehicles,
            map_data=syn.curved_multi_lane_map_data(300.0, 1.0),
            ego_xs=np.zeros(40))
        precompute_run(str(tmp_path), ["train"], force=True)
        df = read_ipc_dataframe(
            split / "curved01" / "annotations_with_intent.feather")
        lab = df["heuristic_intent"].to_numpy()
        from intentbev.configs import INTENTIONS_MAP

        counts = {k: int((lab == v).sum()) for k, v in INTENTIONS_MAP.items()}
        # keep-laners exist and dominate the moving classes; turners and
        # lane-changers both present despite the corridor curvature
        assert counts["KEEP_LANE"] > 0, counts
        assert counts["TURN_LEFT"] + counts["TURN_RIGHT"] > 0, counts
        assert (counts["LEFT_CHANGE_LANE"]
                + counts["RIGHT_CHANGE_LANE"]) > 0, counts
        assert counts["PARKED"] > 0, counts


class TestLabelNoise:
    def test_flip_rate_and_vehicle_only(self, tmp_path, rng):
        from intentbev.precompute_labels import run as precompute_run
        from intentbev.utils.featherio import read_ipc_dataframe

        split = tmp_path / "train"
        split.mkdir()
        syn.write_synthetic_log(
            split, log_id="noise01", num_frames=30, points_per_sweep=800,
            vehicles=[
                {"start": (10.0 + 4 * i, 1.75), "velocity": (4.0, 0.0),
                 "yaw": 0.0} for i in range(6)
            ])
        precompute_run(str(tmp_path), ["train"], force=True)
        f = split / "noise01" / "annotations_with_intent.feather"
        before = read_ipc_dataframe(f)["heuristic_intent"].to_numpy().copy()
        flips = syn.inject_label_noise(split, rate=0.2, seed=1)
        after = read_ipc_dataframe(f)["heuristic_intent"].to_numpy()

        veh = before >= 0
        changed = before != after
        assert changed.sum() == flips["noise01"]
        assert not np.any(changed & ~veh)  # -1 rows untouched
        # flipped labels are valid classes and never a no-op
        assert np.all(after[changed] >= 0) and np.all(after[changed] < 8)
        assert np.all(after[changed] != before[changed])
        rate = changed[veh].mean()
        assert 0.1 < rate < 0.3, rate

    def test_zero_rate_noop(self, tmp_path):
        split = tmp_path / "t"
        split.mkdir()
        assert syn.inject_label_noise(split, rate=0.0) == {}
