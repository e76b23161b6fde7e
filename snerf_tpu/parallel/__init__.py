"""Device-mesh + sharding helpers (the NCCL/DDP replacement).

The reference's entire distributed story (SURVEY.md §2.5: NCCL process
groups, DDP grad allreduce, DataParallel scatter/gather, accelerate) maps to
one mechanism here: a jax.sharding.Mesh with a single "data" axis; rays and
targets are batch-sharded, params replicated, gradients psum'd by XLA SPMD.
"""

from snerf_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicate_sharding, shard_batch)
from snerf_tpu.parallel.tp import (  # noqa: F401
    MODEL_AXIS, make_mesh_2d, num_model_shards, shard_state,
    state_shardings)
