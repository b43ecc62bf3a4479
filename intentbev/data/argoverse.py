"""Argoverse 2 sensor-dataset access: validation, sequencing, sample loading.

Host-side layer feeding the device pipeline. Mirrors the reference's
``ScenarioValidator`` / ``ArgoverseIntentNetDataset`` behaviour
(dataset.py:27-367) with the same defensive semantics — per-reason skip
counters, corrupt-sweep skips, None-sample filtering — but produces
fixed-shape, device-ready tensors (packed point sweeps + padded GT) instead
of ragged torch tensors, and caches per-log state (poses dict, GT arrays,
parsed map) once instead of re-parsing the map JSON per sample
(reference utils.py:112-114).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import NamedTuple

import numpy as np

from ..configs import GridConfig, VEHICLE_CATEGORIES
from ..geometry import (
    quat_to_yaw,
    se3_from_quat_translation,
    se3_inverse,
    transform_points,
)
from ..bev.rasterize import parse_map_json, rasterize_map_ego_centric

# libarrow in this environment is NOT thread-safe: concurrent execution of
# any two arrow code paths from different threads segfaults deterministically
# (bisected 2026-08-17: first presented as a null deref inside read_feather
# on a fresh pool thread; with reads serialized it moved to pandas'
# arrow-backed string Index construction — `df[["x","y","z"]]` triggers
# ArrowStringArray._from_sequence — racing the reader). Workaround: EVERY
# arrow/pandas-on-arrow operation runs on one persistent daemon thread via
# ``_PINNED``, and only plain numpy arrays / python objects cross back to
# the caller. Cost is nil — reads were already serialized, and the
# decoded-sweep cache removes ~90% of them anyway.
import threading


class _PinnedArrowThread:
    """Executes arbitrary callables on a single persistent daemon thread."""

    def __init__(self):
        self._pool = None
        self._guard = threading.Lock()

    def run(self, fn, *args):
        from concurrent.futures import ThreadPoolExecutor

        with self._guard:
            if self._pool is None:
                self._pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="arrow-pinned"
                )
        return self._pool.submit(fn, *args).result()


_PINNED = _PinnedArrowThread()


def _ipc_read_table(path, columns=None):
    """Feather V2 file -> pyarrow.Table via the Arrow IPC reader (the
    non-deprecated pyarrow API, utils/featherio.py). Must run on the pinned
    arrow thread."""
    from ..utils.featherio import read_ipc_table

    return read_ipc_table(path, columns)


def read_feather_locked(path, columns=None):
    """Feather -> pandas DataFrame, decoded entirely on the pinned thread.

    Only use the result on the calling thread if no arrow-backed column is
    touched afterwards (prefer :func:`read_sweep_arrays` /
    :func:`read_log_tables` which return plain numpy)."""
    return _PINNED.run(
        lambda: _ipc_read_table(path, columns).to_pandas(use_threads=False)
    )


def read_sweep_arrays(path):
    """One LiDAR sweep -> (xyz f64[K, 3], intensity f32[K]) pure numpy;
    all arrow work happens on the pinned thread."""

    def _do():
        t = _ipc_read_table(path, columns=["x", "y", "z", "intensity"])
        cols = [
            t.column(c).to_numpy(zero_copy_only=False)
            for c in ("x", "y", "z", "intensity")
        ]
        xyz = np.stack(cols[:3], axis=1).astype(np.float64)
        return xyz, cols[3].astype(np.float32)

    return _PINNED.run(_do)


class ScenarioPaths(NamedTuple):
    log_dir: str
    map_path: str
    annotations_path: str


class ScenarioValidator:
    """Scan a split directory for structurally valid logs (dataset.py:27-134)."""

    def __init__(
        self,
        base_path: str,
        skip_known_corrupted: bool = True,
        min_feather_size_bytes: int = 1024,
        known_corrupted: set | None = None,
        verbose: bool = True,
    ):
        self.base_path = Path(base_path)
        self.skip_known_corrupted = skip_known_corrupted
        self.min_feather_size_bytes = min_feather_size_bytes
        self.known_corrupted = known_corrupted or set()
        self.verbose = verbose

    def find_valid_scenarios(self) -> list[ScenarioPaths]:
        if not self.base_path.is_dir():
            if self.verbose:
                print(f"Error: base path is not a directory: {self.base_path}")
            return []
        valid = []
        skipped_reasons: dict[str, int] = {}
        skipped_corrupted = 0
        scanned = 0
        t0 = time.time()
        for entry in sorted(self.base_path.iterdir()):
            if not entry.is_dir():
                continue
            scanned += 1
            if self.skip_known_corrupted and entry.name in self.known_corrupted:
                skipped_corrupted += 1
                continue
            result = self._validate_scenario(entry)
            if isinstance(result, ScenarioPaths):
                valid.append(result)
            else:
                skipped_reasons[result] = skipped_reasons.get(result, 0) + 1
        if self.verbose:
            print(
                f"Scenario scan: {scanned} dirs in {time.time() - t0:.2f}s; "
                f"{len(valid)} valid, {skipped_corrupted} known-corrupted, "
                f"{sum(skipped_reasons.values())} invalid"
            )
            for reason, count in skipped_reasons.items():
                print(f"  - {reason}: {count}")
        return valid

    def _validate_scenario(self, scenario_dir: Path):
        lidar_dir = scenario_dir / "sensors" / "lidar"
        annotation_file = scenario_dir / "annotations.feather"
        map_dir = scenario_dir / "map"
        ego_pose_file = scenario_dir / "city_SE3_egovehicle.feather"
        log_id = scenario_dir.name

        required = {
            "lidar directory": lidar_dir,
            "annotations file": annotation_file,
            "map directory": map_dir,
            "ego pose file": ego_pose_file,
        }
        for name, p in required.items():
            if not p.exists():
                return f"missing {name}"
            if p.is_dir() and not any(p.iterdir()):
                return f"empty {name}"
            if (
                p.is_file()
                and self.min_feather_size_bytes > 0
                and p.stat().st_size < self.min_feather_size_bytes
            ):
                return f"undersized {name}"

        if not any(lidar_dir.glob("*.feather")):
            return "no feather files in lidar directory"

        map_files = sorted(map_dir.glob(f"log_map_archive_{log_id}*.json"))
        if not map_files:
            map_files = sorted(map_dir.glob("log_map_archive_*.json"))
            if not map_files:
                return "no log_map_archive json in map directory"

        return ScenarioPaths(
            log_dir=str(scenario_dir),
            map_path=str(map_files[0]),
            annotations_path=str(annotation_file),
        )


@dataclass(frozen=True)
class SequenceInfo:
    log_id: str
    log_dir: str
    map_json_path: str
    annotations_path: str
    current_ts_ns: int
    sweep_ts_list: tuple[int, ...]


def build_sequence_index(
    scenarios: list[ScenarioPaths], num_sweeps: int
) -> list[SequenceInfo]:
    """Sliding window of ``num_sweeps`` per log (dataset.py:174-211)."""
    sequences: list[SequenceInfo] = []
    for sc in scenarios:
        log_dir = Path(sc.log_dir)
        lidar_dir = log_dir / "sensors" / "lidar"
        try:
            timestamps = sorted(int(p.stem) for p in lidar_dir.glob("*.feather"))
        except ValueError:
            continue
        if len(timestamps) < num_sweeps:
            continue
        for i in range(len(timestamps) - num_sweeps + 1):
            window = tuple(timestamps[i : i + num_sweeps])
            sequences.append(
                SequenceInfo(
                    log_id=log_dir.name,
                    log_dir=str(log_dir),
                    map_json_path=sc.map_path,
                    annotations_path=sc.annotations_path,
                    current_ts_ns=window[-1],
                    sweep_ts_list=window,
                )
            )
    return sequences


def gt_numpy_table(gt_df) -> dict | None:
    """Extract the GT columns once into plain numpy arrays.

    pandas' arrow-backed columns are NOT safe to filter concurrently from
    loader threads (observed libarrow segfaults); converting at per-log
    cache time means no arrow code ever runs per sample. Rows are
    pre-filtered to vehicle categories with a valid heuristic intent.
    Returns None when the intent column is missing (precompute not run)."""
    if "heuristic_intent" not in gt_df.columns:
        return None
    keep = (
        np.asarray(gt_df["category"].isin(VEHICLE_CATEGORIES))
        & (np.asarray(gt_df["heuristic_intent"]) != -1)
    )
    sub = gt_df[keep]
    return {
        "timestamp_ns": sub["timestamp_ns"].to_numpy(np.int64),
        "tx": sub["tx_m"].to_numpy(np.float64),
        "ty": sub["ty_m"].to_numpy(np.float64),
        "w": np.abs(sub["width_m"].to_numpy(np.float64)),
        "l": np.abs(sub["length_m"].to_numpy(np.float64)),
        "yaw": quat_to_yaw(
            sub["qx"].to_numpy(np.float64), sub["qy"].to_numpy(np.float64),
            sub["qz"].to_numpy(np.float64), sub["qw"].to_numpy(np.float64),
        ),
        "intent": sub["heuristic_intent"].to_numpy().astype(np.int32),
    }


def prepare_gt_for_frame(
    current_ts_ns: int, gt, max_gt: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Frame GT -> padded (boxes f32[G,5], intents i32[G], valid bool[G]).

    Filter: frame timestamp, vehicle categories, heuristic_intent != -1
    (reference utils.py:184-225). Boxes are (cx, cy, |w|, |l|, yaw) in the
    ego frame (annotations are already ego-frame in AV2).

    ``gt``: either a raw annotations DataFrame or a :func:`gt_numpy_table`
    dict (the loader's thread-safe cached form).
    """
    boxes = np.zeros((max_gt, 5), dtype=np.float32)
    intents = np.zeros((max_gt,), dtype=np.int32)
    valid = np.zeros((max_gt,), dtype=bool)
    if gt is None:
        return boxes, intents, valid
    if not isinstance(gt, dict):
        gt = gt_numpy_table(gt)
        if gt is None:
            return boxes, intents, valid
    rows = np.nonzero(gt["timestamp_ns"] == current_ts_ns)[0]
    k = min(len(rows), max_gt)
    if k == 0:
        return boxes, intents, valid
    rows = rows[:k]
    boxes[:k, 0] = gt["tx"][rows]
    boxes[:k, 1] = gt["ty"][rows]
    boxes[:k, 2] = gt["w"][rows]
    boxes[:k, 3] = gt["l"][rows]
    boxes[:k, 4] = gt["yaw"][rows]
    intents[:k] = gt["intent"][rows]
    valid[:k] = True
    return boxes, intents, valid


class Sample(NamedTuple):
    """Host-side fixed-shape sample, ready for device transfer."""

    points: np.ndarray       # f32[S, P, 4]
    points_valid: np.ndarray  # bool[S, P]
    map_bev: np.ndarray      # u8[H, W, 9] (binary; f32 on the city-raster
                             # fast path whose bilinear warp is fractional);
                             # cast to the compute dtype on device — u8
                             # transport is 4x fewer tunnel/DMA bytes
    gt_boxes: np.ndarray     # f32[G, 5]
    gt_intentions: np.ndarray  # i32[G]
    gt_valid: np.ndarray     # bool[G]


class ArgoverseSampleLoader:
    """Per-log-cached sample production (dataset.py:213-367 equivalent).

    Returns ``None`` for unproducible samples (missing pose / all sweeps
    corrupt / missing intent file), matching the reference's fault-tolerant
    data path; the batcher drops them (dataset.py:137-150).
    """

    def __init__(
        self,
        grid: GridConfig,
        max_points_per_sweep: int = 65536,
        max_gt: int = 128,
        require_intent_labels: bool = True,
        verbose: bool = True,
        use_city_raster_cache: bool = False,
        max_cached_logs: int = 32,
    ):
        """``use_city_raster_cache``: rasterize each log's map once in the
        city frame and warp per sample (fast path, bev.city_raster) instead
        of re-drawing polygons per unique pose (parity path).
        ``max_cached_logs``: LRU bound on per-log caches (poses + GT df +
        parsed map are MBs per log; the reference caches every log it ever
        touches, dataset.py:222)."""
        from collections import OrderedDict

        self.grid = grid
        self.max_points_per_sweep = max_points_per_sweep
        self.max_gt = max_gt
        self.require_intent_labels = require_intent_labels
        self.verbose = verbose
        self.use_city_raster_cache = use_city_raster_cache
        self.max_cached_logs = max_cached_logs
        self._log_cache: "OrderedDict[str, dict | None]" = OrderedDict()
        import threading

        self._cache_lock = threading.Lock()  # loaders run in a thread pool
        # samples whose GT exceeded max_gt and was truncated (see _load)
        self.gt_overflow_samples = 0
        # sweep windows slide by 1 frame, so consecutive samples share 9/10
        # sweeps — cache decoded (sweep-ego xyz f32, intensity f32) per
        # timestamp. Bound: max_cached_logs * this * ~16B * points/sweep.
        self.max_cached_sweeps_per_log = 16

    # -- per-log cache ----------------------------------------------------
    def _get_log_data(self, seq: SequenceInfo) -> dict | None:
        with self._cache_lock:
            if seq.log_id in self._log_cache:
                self._log_cache.move_to_end(seq.log_id)
                return self._log_cache[seq.log_id]
        entry: dict | None
        try:
            log_dir = Path(seq.log_dir)
            intent_file = log_dir / "annotations_with_intent.feather"
            if intent_file.is_file():
                gt_path = intent_file
            elif self.require_intent_labels:
                if self.verbose:
                    print(
                        f"ERROR: pre-computed intent file missing for log "
                        f"{seq.log_id}; run intentbev-precompute-labels."
                    )
                gt_path = None
            else:
                gt_path = seq.annotations_path

            if gt_path is None:
                entry = None
            else:
                # ALL pandas/arrow work on the pinned thread; only numpy
                # arrays and plain-python pose rows cross back (libarrow
                # is not thread-safe here — see _PinnedArrowThread)
                def _tables():
                    gt_df = _ipc_read_table(gt_path).to_pandas(
                        use_threads=False
                    )
                    poses_df = _ipc_read_table(
                        log_dir / "city_SE3_egovehicle.feather"
                    ).to_pandas(use_threads=False)
                    return gt_numpy_table(gt_df), {
                        int(r.timestamp_ns): r
                        for r in poses_df.itertuples(index=False)
                    }

                gt_table, poses = _PINNED.run(_tables)
                elements = parse_map_json(seq.map_json_path)
                from collections import OrderedDict

                entry = {
                    "gt_table": gt_table,
                    "poses": poses,
                    "map_elements": elements,
                    "map_raster_cache": {},
                    "sweep_cache": OrderedDict(),
                    "sweep_lock": threading.Lock(),
                }
        except Exception as e:  # noqa: BLE001 - fault-tolerant data path
            if self.verbose:
                print(f"Error caching log {seq.log_id}: {e}")
            entry = None
        with self._cache_lock:
            while len(self._log_cache) >= self.max_cached_logs:
                self._log_cache.popitem(last=False)
            self._log_cache[seq.log_id] = entry
        return entry

    # -- sample production -------------------------------------------------
    def load(self, seq: SequenceInfo, aug_linear=None) -> Sample | None:
        """``aug_linear``: optional 2x2 ego-metric augmentation transform
        (bev.augment.aug_linear_matrix); the map is rasterized at the
        augmented pose so training needs no device-side image warp. The
        POINTS are returned untransformed — the device applies the same
        transform pre-voxelization (bev.augment.augment_points_gt)."""
        return self._load(seq, aug_linear)

    def _load(self, seq: SequenceInfo, aug_linear=None) -> Sample | None:
        log_data = self._get_log_data(seq)
        if log_data is None:
            return None
        poses = log_data["poses"]

        pose = poses.get(seq.current_ts_ns)
        if pose is None:
            return None
        try:
            world_se3_ego = se3_from_quat_translation(
                [pose.qx, pose.qy, pose.qz, pose.qw],
                [pose.tx_m, pose.ty_m, pose.tz_m],
            )
        except ValueError:
            return None
        ego_se3_world = se3_inverse(world_se3_ego)

        s = len(seq.sweep_ts_list)
        packed = np.zeros((s, self.max_points_per_sweep, 4), dtype=np.float32)
        packed_valid = np.zeros((s, self.max_points_per_sweep), dtype=bool)
        lidar_base = Path(seq.log_dir) / "sensors" / "lidar"
        any_sweep = False
        for i, ts in enumerate(seq.sweep_ts_list):
            decoded = self._decoded_sweep(log_data, lidar_base, int(ts))
            if decoded is None:
                continue
            raw, inten = decoded  # sweep-ego frame, already subsampled
            sweep_pose = poses.get(int(ts))
            if sweep_pose is None:
                continue
            try:
                sweep_world = se3_from_quat_translation(
                    [sweep_pose.qx, sweep_pose.qy, sweep_pose.qz, sweep_pose.qw],
                    [sweep_pose.tx_m, sweep_pose.ty_m, sweep_pose.tz_m],
                )
            except ValueError:
                continue
            rel = ego_se3_world @ sweep_world
            from ..utils.native import transform_points_native

            pts = transform_points_native(raw, rel)
            if pts is None:
                pts = transform_points(raw, rel).astype(np.float32)
            k = len(pts)
            packed[i, :k, :3] = pts
            packed[i, :k, 3] = inten
            packed_valid[i, :k] = True
            any_sweep = True
        if not any_sweep:
            return None

        map_bev = self._rasterize_cached(log_data, pose, aug_linear)
        gt_boxes, gt_intents, gt_valid = prepare_gt_for_frame(
            seq.current_ts_ns, log_data["gt_table"], self.max_gt
        )
        # GT-truncation audit (sibling of the eval pre-NMS/detection cap
        # audit): the reference keeps every annotated box (utils.py:184-225
        # has no cap); intentbev pads to a fixed max_gt and silently drops
        # the rest. Count samples where that bound binds so eval/train can
        # report it — only recompute the raw row count in the rare all-slots-
        # full case.
        if gt_valid.all() and log_data["gt_table"] is not None:
            n_raw = int(np.count_nonzero(
                log_data["gt_table"]["timestamp_ns"] == seq.current_ts_ns))
            if n_raw > self.max_gt:
                with self._cache_lock:
                    self.gt_overflow_samples += 1
        return Sample(packed, packed_valid, map_bev, gt_boxes, gt_intents, gt_valid)

    def _decoded_sweep(self, log_data: dict, lidar_base: Path, ts: int):
        """(sweep-ego xyz f64[K,3], intensity f32[K]) for one sweep, LRU-
        cached per log (windows slide by 1 frame, so 9/10 sweeps repeat);
        subsampled to max_points_per_sweep. None for missing/corrupt."""
        import pyarrow

        cache = log_data["sweep_cache"]
        lock = log_data["sweep_lock"]
        with lock:
            if ts in cache:
                cache.move_to_end(ts)
                return cache[ts]
        sweep_path = lidar_base / f"{ts}.feather"
        entry = None
        if sweep_path.is_file():
            try:
                raw, inten = read_sweep_arrays(sweep_path)
                if len(raw):
                    k = len(raw)
                    if k > self.max_points_per_sweep:
                        sel = np.linspace(
                            0, k - 1, self.max_points_per_sweep
                        ).astype(np.int64)
                        raw, inten = raw[sel], np.ascontiguousarray(inten[sel])
                    entry = (raw, inten)
            except (pyarrow.ArrowInvalid, OSError):
                if self.verbose:
                    print(f"Warning: corrupt sweep {sweep_path}; skipping")
        with lock:
            while len(cache) >= self.max_cached_sweeps_per_log:
                cache.popitem(last=False)
            cache[ts] = entry
        return entry

    def _rasterize_cached(self, log_data: dict, pose, aug_linear=None) -> np.ndarray:
        if self.use_city_raster_cache:
            from ..bev.city_raster import build_city_raster, warp_city_to_ego

            if "city_raster" not in log_data:
                log_data["city_raster"] = build_city_raster(
                    log_data["map_elements"], self.grid
                )
            return warp_city_to_ego(
                log_data["city_raster"],
                {"tx_m": pose.tx_m, "ty_m": pose.ty_m, "qx": pose.qx,
                 "qy": pose.qy, "qz": pose.qz, "qw": pose.qw},
                self.grid,
                aug_linear=aug_linear,
            )
        cache = log_data["map_raster_cache"]
        key = (round(float(pose.tx_m), 2), round(float(pose.ty_m), 2),
               round(float(quat_to_yaw(pose.qx, pose.qy, pose.qz, pose.qw)), 3),
               None if aug_linear is None
               else tuple(np.round(np.asarray(aug_linear), 5).ravel()))
        if key not in cache:
            if len(cache) > 64:
                cache.clear()
            cache[key] = rasterize_map_ego_centric(
                log_data["map_elements"],
                {"tx_m": pose.tx_m, "ty_m": pose.ty_m, "qx": pose.qx,
                 "qy": pose.qy, "qz": pose.qz, "qw": pose.qw},
                self.grid,
                aug_linear=aug_linear,
                out_dtype=np.uint8,
            )
        return cache[key]
