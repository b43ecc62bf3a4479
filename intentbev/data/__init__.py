from .argoverse import (
    ArgoverseSampleLoader,
    ScenarioPaths,
    ScenarioValidator,
    build_sequence_index,
    prepare_gt_for_frame,
)
from .synthetic import write_synthetic_log

__all__ = [
    "ArgoverseSampleLoader",
    "ScenarioPaths",
    "ScenarioValidator",
    "build_sequence_index",
    "prepare_gt_for_frame",
    "write_synthetic_log",
]
