from .heuristic import label_log_annotations, label_track

__all__ = ["label_log_annotations", "label_track"]
