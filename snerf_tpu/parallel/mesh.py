"""Mesh construction + batch sharding utilities.

TPU-native replacement for reference s-nerf/utils/device_utils.py:16-40
(NCCL init + DDP/DataParallel wrappers) and zipnerf's accelerate DDP
(zipnerf/train.py:44-51): one data axis over all devices; XLA inserts the
gradient psum and render all_gather over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
  """1-D data mesh over all (or given) devices."""
  if devices is None:
    devices = jax.devices()
  return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
  """Shard the leading (ray-batch) axis over the data axis."""
  return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
  """Device_put a pytree with its leading axis sharded over the mesh."""
  sh = batch_sharding(mesh, axis_name)
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, k: int) -> int:
  return ((n + k - 1) // k) * k
