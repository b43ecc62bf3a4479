"""Integration tests: synthetic log -> precompute -> train CLI -> eval CLI.

SURVEY.md §4 item 2: a fake AV2 log drives dataset -> model -> loss ->
optimizer (loss decreases) and dataset -> eval (metrics computed),
replacing the reference's hard dependency on the real dataset.
"""

import dataclasses
import json

import numpy as np
import pytest

from intentbev.configs import tiny_test_config
from intentbev.data.synthetic import write_synthetic_log
from intentbev.precompute_labels import run as precompute_run


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("av2train")
    split = root / "train"
    split.mkdir()
    write_synthetic_log(split, log_id="traininglog01", num_frames=10, seed=0)
    precompute_run(str(root), ["train"], force=True)
    return root


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = tiny_test_config()
    # match the synthetic fixture: tiny grid, 3 sweeps max_gt small
    grid = dataclasses.replace(cfg.grid, lidar_sweeps=3)
    vit = dataclasses.replace(cfg.vit,
                              lidar_input_channels=grid.lidar_total_channels)
    train = dataclasses.replace(cfg.train, batch_size=2, num_epochs=1,
                                log_every_steps=2, checkpoint_every_steps=1000)
    return dataclasses.replace(cfg, grid=grid, vit=vit, train=train)


class TestTrainLoop:
    def test_train_saves_selfdescribing_checkpoint(self, data_root, tiny_cfg, tmp_path):
        from intentbev.train import train

        out = tmp_path / "run"
        logs = []
        metrics = train(tiny_cfg, str(data_root / "train"), str(out),
                        num_workers=2, max_steps=3, log_fn=logs.append)
        assert metrics["loss"] > 0
        cfg_file = out / "config.json"
        assert cfg_file.exists()
        cfg_json = json.loads(cfg_file.read_text())
        assert cfg_json["__dataclass__"] == "ExperimentConfig"
        steps = list(out.glob("step_*"))
        assert steps, "no checkpoint written"

    def test_checkpoint_roundtrip(self, data_root, tiny_cfg, tmp_path):
        from intentbev.train import train
        from intentbev.checkpoint import load_checkpoint

        out = tmp_path / "run2"
        train(tiny_cfg, str(data_root / "train"), str(out),
              num_workers=1, max_steps=2, log_fn=lambda *_: None)
        state, cfg2 = load_checkpoint(out)
        assert cfg2.grid.lidar_sweeps == tiny_cfg.grid.lidar_sweeps
        assert cfg2.model_family == tiny_cfg.model_family
        assert "params" in state and "opt_state" in state
        assert int(np.asarray(state["step"])) == 2

    def test_plateau_scheduler(self):
        from intentbev.train import PlateauScheduler

        s = PlateauScheduler(1e-4, 0.1, patience=3)
        assert s.step(1.0) == 1e-4
        # 3 bad epochs tolerated, 4th decays (torch semantics: > patience)
        for _ in range(3):
            assert s.step(2.0) == 1e-4
        assert s.step(2.0) == pytest.approx(1e-5)

    def test_plateau_scheduler_start_phase_resets_tracking(self):
        from intentbev.train import PlateauScheduler

        s = PlateauScheduler(1e-4, 0.1, patience=1)
        s.step(0.1)  # best = 0.1
        s.step(0.5)  # one bad epoch banked
        s.start_phase(2e-5)
        assert s.lr == pytest.approx(2e-5)
        # new-phase losses above the OLD best must not read as a plateau:
        # the first epoch establishes a fresh best, no decay for epochs
        assert s.step(0.4) == pytest.approx(2e-5)
        assert s.step(0.45) == pytest.approx(2e-5)  # 1 bad tolerated
        assert s.step(0.45) == pytest.approx(2e-6)  # 2nd decays


class TestEvalLoop:
    def test_eval_cli_end_to_end(self, data_root, tiny_cfg, tmp_path):
        from intentbev.train import train
        from intentbev.evaluate import evaluate

        out = tmp_path / "run3"
        train(tiny_cfg, str(data_root / "train"), str(out),
              num_workers=1, max_steps=2, log_fn=lambda *_: None)
        logs = []
        results = evaluate(str(out), str(data_root / "train"),
                           num_workers=1, log_fn=logs.append)
        assert results["num_samples"] == 8  # 10 frames, 3 sweeps -> 8 windows
        for t in (0.5, 0.6, 0.7, 0.8, 0.9):
            assert f"mAP@{t:.1f}" in results
            assert 0.0 <= results[f"mAP@{t:.1f}"] <= 1.0
        joined = "\n".join(logs)
        assert "mAP @ IoU=0.5" in joined
        # truncation-cap audit: after only 2 train steps the objectness head
        # is ~random, sigmoid ~= 0.5 everywhere, so (nearly) every anchor
        # clears conf 0.1 — exactly the early-training flood where the fixed
        # max_pre_nms cap binds and metrics deviate from the reference's
        # uncapped lists (eval_cnn.py:167-183). The audit must report it on
        # every sample. (test_overfit_e2e asserts ZERO overflow on a trained
        # model — the operating point.)
        assert results["pre_nms_overflow"] == 8
        assert "caps bound" in joined


class TestFaithfulResume:
    def test_resume_continues_lr_epoch_and_step(self, data_root, tiny_cfg, tmp_path):
        """Resume must keep the global step (checkpoint names stay monotone),
        the plateau scheduler state, and the epoch counter."""
        import dataclasses as dc

        from intentbev.checkpoint import load_checkpoint
        from intentbev.train import train

        out = tmp_path / "resume_run"
        # Phase 1: 2 epochs, checkpoint every step so a resumable state exists
        cfg1 = dc.replace(
            tiny_cfg,
            train=dc.replace(tiny_cfg.train, num_epochs=2,
                             checkpoint_every_steps=1),
        )
        train(cfg1, str(data_root / "train"), str(out),
              num_workers=1, log_fn=lambda *_: None)
        state1, _ = load_checkpoint(out)
        step1 = int(np.asarray(state1["step"]))
        assert step1 > 0
        assert int(state1["loop"]["epoch"]) == 2  # both epochs completed
        lr1 = float(state1["loop"]["lr"])
        best1 = float(state1["loop"]["best"])

        # Phase 2: raise num_epochs and resume; new checkpoints must sort
        # AFTER the phase-1 ones and scheduler state must carry over.
        logs = []
        cfg2 = dc.replace(
            cfg1, train=dc.replace(cfg1.train, num_epochs=3,
                                   checkpoint_every_steps=1),
        )
        train(cfg2, str(data_root / "train"), str(out),
              num_workers=1, log_fn=logs.append, resume=True)
        assert any(f"resumed from step {step1}" in str(line) for line in logs)
        state2, _ = load_checkpoint(out)
        step2 = int(np.asarray(state2["step"]))
        assert step2 > step1, "post-resume checkpoints were pruned/misnamed"
        assert int(state2["loop"]["epoch"]) == 3
        # best-loss tracking survived the resume (not reset to inf)
        assert float(state2["loop"]["best"]) <= best1
        assert float(state2["loop"]["lr"]) <= lr1

    def test_mid_epoch_interrupt_saves_position_not_next_epoch(
            self, data_root, tiny_cfg, tmp_path):
        """A max_steps stop mid-epoch must (a) keep the epoch index (resume
        replays nothing and skips nothing — it fast-forwards via
        loop.epoch_batch), and (b) NOT step the plateau scheduler on the
        partial-epoch mean (segmented runs would decay LR epoch_len/SEG
        times too fast)."""
        import dataclasses as dc

        from intentbev.checkpoint import load_checkpoint
        from intentbev.train import train

        out = tmp_path / "midresume_run"
        cfg = dc.replace(
            tiny_cfg,
            train=dc.replace(tiny_cfg.train, num_epochs=2,
                             checkpoint_every_steps=100),
        )
        # 8 sequences / batch 2 = 4 batches per epoch; stop after 2
        train(cfg, str(data_root / "train"), str(out),
              num_workers=1, max_steps=2, log_fn=lambda *_: None)
        state1, _ = load_checkpoint(out)
        assert int(state1["loop"]["epoch"]) == 0  # epoch 0 still in progress
        assert int(state1["loop"]["epoch_batch"]) == 2
        # scheduler untouched by the partial epoch: lr at base, best at inf
        assert float(state1["loop"]["lr"]) == float(
            np.float32(cfg.train.learning_rate))
        assert not np.isfinite(float(state1["loop"]["best"]))

        # resume: must report the fast-forward position and finish cleanly
        logs = []
        train(cfg, str(data_root / "train"), str(out),
              num_workers=1, log_fn=logs.append, resume=True)
        assert any("epoch 0 batch 2" in str(line) for line in logs)
        state2, _ = load_checkpoint(out)
        assert int(state2["loop"]["epoch"]) == 2  # both epochs completed
        assert int(state2["loop"]["epoch_batch"]) == 0
        # total optimizer steps = 2 (segment) + 2 (rest of epoch 0) + 4
        assert int(np.asarray(state2["step"])) == 8

    def test_intention_weight_cache_reused_on_resume(
            self, data_root, tiny_cfg, tmp_path):
        """Segmented runs must not pay the class-weight counting pass at
        every resume: the result is cached in out_dir keyed by dataset."""
        import dataclasses as dc
        import json

        from intentbev.train import train

        out = tmp_path / "wcache_run"
        cfg = dc.replace(
            tiny_cfg,
            loss=dc.replace(tiny_cfg.loss, apply_intention_downsampling=False),
        )
        logs1: list = []
        train(cfg, str(data_root / "train"), str(out), num_workers=1,
              max_steps=1, log_fn=logs1.append, use_intention_weights=True)
        assert any("computing intention class weights" in str(x) for x in logs1)
        cache = json.loads((out / "intent_weights.json").read_text())
        assert len(cache["weights"]) == 8

        logs2: list = []
        train(cfg, str(data_root / "train"), str(out), num_workers=1,
              max_steps=2, log_fn=logs2.append, use_intention_weights=True,
              resume=True)
        assert any("(cached)" in str(x) for x in logs2)
        assert not any("computing intention class weights" in str(x)
                       for x in logs2)

    def test_prefetch_propagates_producer_errors(self):
        from intentbev.data.pipeline import device_prefetch

        def boom():
            yield np.zeros(3)
            raise RuntimeError("loader crashed")

        it = device_prefetch(boom(), size=2, put=lambda x: x)
        next(it)
        with pytest.raises(RuntimeError, match="loader crashed"):
            next(it)
