"""Worker for the 2-process multi-host DCN smoke test.

Launched twice (process_id 0/1) by tests/test_parallel.py. Each process:
forces the CPU backend with 2 local virtual devices, joins the
jax.distributed coordinator (gloo CPU collectives), shards the sequence
list with ``shard_sequences_for_process``, loads only ITS local slice of
the global batch through the real loader/batch_iterator, assembles the
global sharded batch via ``local_batch_slice``
(jax.make_array_from_process_local_data), and drives ONE sharded train
step. It prints the (globally psum-reduced) loss — the test asserts both
processes print the same value, which can only happen if the DCN input
path + collectives actually executed.

The reference has no distributed code at all (SURVEY.md §2.2); this
exercises the multi-host branch of intentbev.train end to end.
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
data_dir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from intentbev.configs import MeshConfig, tiny_test_config  # noqa: E402
from intentbev.boxes.anchors import generate_anchors  # noqa: E402
from intentbev.data.argoverse import (  # noqa: E402
    ArgoverseSampleLoader, ScenarioValidator, build_sequence_index)
from intentbev.data.pipeline import batch_iterator, pad_batch  # noqa: E402
from intentbev.parallel import (  # noqa: E402
    create_mesh, local_batch_slice, make_sharded_train_step, shard_train_state)
from intentbev.parallel.mesh import shard_sequences_for_process  # noqa: E402
from intentbev.train import init_train_state, make_optimizer  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4

cfg = tiny_test_config()
cfg = dataclasses.replace(
    cfg,
    mesh=MeshConfig(model_parallel=1),
    augment=dataclasses.replace(
        cfg.augment, flip_prob=0, rotate_prob=0, scale_prob=0, dropout_prob=0
    ),
)
GLOBAL_BATCH = 4

v = ScenarioValidator(data_dir, verbose=False)
sequences = build_sequence_index(v.find_valid_scenarios(), cfg.grid.lidar_sweeps)
local_seqs, local_bs = shard_sequences_for_process(
    sequences, pid, jax.process_count(), GLOBAL_BATCH
)
assert local_bs == GLOBAL_BATCH // 2
loader = ArgoverseSampleLoader(
    cfg.grid, max_points_per_sweep=512, max_gt=cfg.loss.max_gt_boxes,
    verbose=False,
)

from intentbev.models import build_model  # noqa: E402

model = build_model(cfg, train_mode=True)
tx = make_optimizer(cfg)
state = init_train_state(model, cfg, tx, jax.random.key(0))
anchors = jnp.asarray(generate_anchors(cfg.grid, cfg.anchors))

mesh = create_mesh(cfg.mesh)
state = shard_train_state(state, mesh, cfg)
step = make_sharded_train_step(model, cfg, anchors, tx, mesh)(state)

it = batch_iterator(local_seqs, loader, local_bs, shuffle=False, num_workers=1)
batch = next(iter(it))
batch, _ = pad_batch(batch, local_bs)  # fixed local shape
global_batch = local_batch_slice(batch._asdict(), mesh, cfg.mesh)

state, metrics = step(state, global_batch, jax.random.key(7))
print(f"MHLOSS {pid} {float(metrics['loss']):.6f}", flush=True)
