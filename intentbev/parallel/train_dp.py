"""Sharded (DP x TP) training step via jit + NamedSharding.

One compiled program: batch arrives sharded over 'data', parameters are
replicated over 'data' and (optionally) sharded over 'model'; XLA inserts
the gradient all-reduce over ICI. BatchNorm batch statistics reduce over
the full (global) batch dimension automatically under GSPMD — the mean
over a data-sharded axis lowers to a cross-device psum.

This is the component the reference lacks entirely (SURVEY.md §2.2:
"DP: absent ... Communication backend: absent").
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..configs import ExperimentConfig
from ..losses import detection_intention_loss
from ..train import TrainState, _augmented_inputs
from .sharding import batch_sharding, param_shardings, replicated


def shard_train_state(state: TrainState, mesh, cfg: ExperimentConfig) -> TrainState:
    """Place an (unsharded) TrainState according to the mesh rules."""
    p_shard = param_shardings(state.params, mesh, cfg.mesh)
    rep = replicated(mesh)
    return TrainState(
        params=jax.device_put(state.params, p_shard),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(
            state.opt_state,
            jax.tree.map(
                lambda _: rep, state.opt_state,
                is_leaf=lambda x: hasattr(x, "shape"),
            ),
        ),
        step=jax.device_put(state.step, rep),
    )


def make_sharded_train_step(model, cfg: ExperimentConfig, anchors, tx, mesh,
                            intention_weights=None):
    """Like train.make_train_step but with explicit in/out shardings.

    ``intention_weights``: optional [num_intentions] class weights — same
    contract as the single-device step (reference train_vit.py:92-121);
    silently dropping them under --distributed would diverge from
    single-device behaviour.
    """
    grid, aug_cfg, loss_cfg = cfg.grid, cfg.augment, cfg.loss
    b_shard = batch_sharding(mesh, cfg.mesh)
    rep = replicated(mesh)
    from ..train import chunk_patch_for

    chunk_patch = chunk_patch_for(cfg)

    def step_fn(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_aug, rng_loss, rng_drop = jax.random.split(rng, 3)

        compute_dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        lidar, map_bev, gt_boxes, gt_intents = _augmented_inputs(
            batch, rng_aug, aug_cfg, grid, compute_dtype,
            chunk_patch=chunk_patch,
        )

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = model.apply(
                variables, lidar, map_bev, train=True,
                mutable=mutable, rngs={"dropout": rng_drop},
            )
            (cls_l, box_d, int_l), upd = out if mutable else (out, {})
            loss_out = detection_intention_loss(
                cls_l, box_d, int_l, anchors,
                gt_boxes, gt_intents, batch["gt_valid"],
                loss_cfg, rng_loss,
                intention_class_weights=intention_weights,
            )
            return loss_out["loss"], (loss_out, upd.get("batch_stats", state.batch_stats))

        (loss, (loss_out, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_bs,
            opt_state=new_opt_state, step=state.step + 1,
        )
        metrics = {k: loss_out[k] for k in
                   ("loss", "cls_loss", "box_loss", "intent_loss", "num_pos_anchors")}
        return new_state, metrics

    if cfg.train.transport == "chunks":
        from ..ops.voxel_embed import VoxelChunks

        batch_shardings = {
            "chunks": VoxelChunks(*([b_shard] * 5)),
            "map_bev": b_shard, "gt_boxes": b_shard,
            "gt_intentions": b_shard, "gt_valid": b_shard,
            "aug_params": b_shard,
        }
    else:
        batch_shardings = {
            "points": b_shard, "points_valid": b_shard, "map_bev": b_shard,
            "gt_boxes": b_shard, "gt_intentions": b_shard, "gt_valid": b_shard,
            "aug_params": b_shard,
        }

    def state_shardings(state: TrainState) -> TrainState:
        p_shard = param_shardings(state.params, mesh, cfg.mesh)
        return TrainState(
            params=p_shard,
            batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
            opt_state=jax.tree.map(
                lambda _: rep, state.opt_state,
                is_leaf=lambda x: hasattr(x, "shape"),
            ),
            step=rep,
        )

    def compile_for(state: TrainState):
        ss = state_shardings(state)
        return jax.jit(
            step_fn,
            in_shardings=(ss, batch_shardings, rep),
            out_shardings=(ss, jax.tree.map(lambda _: rep, {
                "loss": 0, "cls_loss": 0, "box_loss": 0,
                "intent_loss": 0, "num_pos_anchors": 0})),
            donate_argnums=(0,),
        )

    return compile_for
