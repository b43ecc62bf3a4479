"""Orbax checkpointing with self-describing embedded config.

The reference checkpoint embeds ``backbone_cfg`` so eval can rebuild the
exact model and anchor stride (train_vit.py:206-211, eval_cnn.py:63-79);
that contract is kept: every checkpoint stores the full ExperimentConfig.
Unlike the reference — which writes a single file only after the LAST epoch
(SURVEY.md §5 'checkpoint/resume') — checkpoints are written every N steps
and carry optimizer state, so mid-training resume actually works.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .configs import ExperimentConfig, config_from_dict, config_to_dict


def save_checkpoint(
    ckpt_dir: str | Path,
    step: int,
    state: dict,
    config: ExperimentConfig,
    keep: int = 3,
) -> Path:
    """state: pytree dict (params / batch_stats / opt_state / ...)."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        path = ckpt_dir / f"step_{step:08d}"
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    with open(ckpt_dir / "config.json", "w") as f:
        json.dump(config_to_dict(config), f, indent=2)
    _prune(ckpt_dir, keep)
    return ckpt_dir / f"step_{step:08d}"


def _prune(ckpt_dir: Path, keep: int) -> None:
    steps = sorted(ckpt_dir.glob("step_*"))
    for old in steps[:-keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)


def latest_step(ckpt_dir: str | Path) -> int | None:
    steps = sorted(Path(ckpt_dir).glob("step_*"))
    if not steps:
        return None
    return int(steps[-1].name.split("_")[1])


def load_checkpoint(
    ckpt_dir: str | Path, abstract_state: Any | None = None, step: int | None = None
) -> tuple[dict, ExperimentConfig]:
    """Returns (state pytree, embedded ExperimentConfig)."""
    ckpt_dir = Path(ckpt_dir).absolute()
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    with open(ckpt_dir / "config.json") as f:
        config = config_from_dict(json.load(f))
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_state is not None:
            state = ckptr.restore(ckpt_dir / f"step_{step:08d}", abstract_state)
        else:
            state = ckptr.restore(ckpt_dir / f"step_{step:08d}")
    return state, config
