from .inference import StreamingInferencer
from .mesh import create_mesh, local_batch_slice
from .sharding import batch_sharding, param_shardings, replicated
from .train_dp import make_sharded_train_step, shard_train_state

__all__ = [
    "StreamingInferencer",
    "create_mesh",
    "local_batch_slice",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "make_sharded_train_step",
    "shard_train_state",
]
