"""Tensor parallelism: shard the wide NeRF MLPs over a second mesh axis.

The reference has no tensor parallelism anywhere (SURVEY.md §2.5: its
models are <=1024-wide MLPs trained with DDP/DataParallel only). On TPU,
sharding the hidden dimension of the 1024-wide fine MLP over a "model"
mesh axis is the natural way to scale past one chip's MXU for a single
scene — the SURVEY's stretch goal. This module implements it the
idiomatic GSPMD way: we only ANNOTATE parameter shardings; XLA SPMD
inserts the ICI collectives.

Layout (Megatron-style alternation, halves activation comms vs naive
column-everywhere):
  - even trunk layers  : column-parallel  kernel P(None, "model"),
                         bias P("model")  -> activations feature-sharded
  - odd trunk layers   : row-parallel     kernel P("model", None),
                         bias replicated  -> XLA psums the partial sums,
                         activations replicated again
  - bottleneck / semantic_hidden / cond_i: column-parallel
  - heads (density/rgb/semantic, tiny fan-out): row-parallel over their
    input dim when divisible, else replicated
  - everything else (embeddings, pose params, scalars): replicated

Adam moments mirror the parameter layout automatically because the rules
key on the flax param *path*, which is identical inside optax's mu/nu
trees.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_TRUNK = re.compile(r"^(?:trunk|ipe|view)_(\d+)$")
_COLUMN = re.compile(r"^(bottleneck|semantic_hidden|cond_\d+|"
                     r"density_hidden|glo_0)$")
_HEAD = re.compile(r"^(density|rgb|semantic|normals|roughness|tint|"
                   r"diffuse|density_out|rgb_out|normals_head|"
                   r"roughness_head|glo_1)$")


def make_mesh_2d(n_data: int, n_model: int, devices=None,
                 axis_names=(DATA_AXIS, MODEL_AXIS)) -> Mesh:
  """(n_data, n_model) mesh. Rays shard over axis 0, MLP width over 1."""
  if devices is None:
    devices = jax.devices()
  devices = np.asarray(devices[: n_data * n_model])
  assert devices.size == n_data * n_model, (
      f"need {n_data * n_model} devices, have {devices.size}")
  return Mesh(devices.reshape(n_data, n_model), axis_names)


def _model_axis_size(mesh: Mesh) -> int:
  return dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)


def _path_keys(path):
  keys = []
  for p in path:
    if hasattr(p, "key"):
      keys.append(str(p.key))
    elif hasattr(p, "name"):
      keys.append(str(p.name))
    elif hasattr(p, "idx"):
      keys.append(str(p.idx))
  return keys


def _leaf_spec(path_keys, leaf, tp: int) -> P:
  """PartitionSpec for one TrainState leaf, by its flax param path."""
  if tp <= 1 or not hasattr(leaf, "ndim"):
    return P()
  # Hash-grid table: shard the rows over ICI (SURVEY §2.5 stretch goal —
  # "optionally shard the grid table over ICI"). Per-level sizes are
  # rounded to 8 rows (hashgrid.make_grid_spec) so row counts divide any
  # tp <= 8; XLA SPMD handles the gather/scatter-add on the sharded
  # operand. Memory: table + both Adam moments drop to 1/tp per chip.
  if path_keys and path_keys[-1] == "table" and "grid" in path_keys:
    if leaf.ndim == 2 and leaf.shape[0] % tp == 0:
      return P(MODEL_AXIS, None)
    return P()
  # Integrated-CP factor tables [3, R, F] (models/cpgrid.py): shard the
  # resolution dim; the profile@factor matmul contracts over it, XLA
  # inserting the psum (same pattern as the hash-table row sharding).
  if path_keys and "cp_grid" in path_keys and path_keys[-1].startswith(
      "v"):
    if leaf.ndim == 3 and leaf.shape[1] % tp == 0 and leaf.shape[1] >= tp:
      return P(None, MODEL_AXIS, None)
    return P()
  # The layer name is the key right above 'kernel'/'bias'.
  if len(path_keys) < 2 or path_keys[-1] not in ("kernel", "bias"):
    return P()
  layer = path_keys[-2]
  is_kernel = path_keys[-1] == "kernel"

  m = _TRUNK.match(layer)
  if m is not None:
    column = int(m.group(1)) % 2 == 0
  elif _COLUMN.match(layer):
    column = True
  elif _HEAD.match(layer):
    column = False
  else:
    return P()

  if column:
    if is_kernel:
      if leaf.ndim == 2 and leaf.shape[1] % tp == 0 and leaf.shape[1] >= tp:
        return P(None, MODEL_AXIS)
      return P()
    if leaf.ndim == 1 and leaf.shape[0] % tp == 0 and leaf.shape[0] >= tp:
      return P(MODEL_AXIS)
    return P()
  # row-parallel: shard the contraction (input) dim of the kernel;
  # bias stays replicated (added after the psum).
  if is_kernel and leaf.ndim == 2 and leaf.shape[0] % tp == 0 \
      and leaf.shape[0] >= tp:
    return P(MODEL_AXIS, None)
  return P()


def state_shardings(state, mesh: Mesh):
  """NamedSharding pytree for a TrainState (params + optimizer moments).

  Works for any pytree whose leaves are arrays and whose param-bearing
  subtrees use the flax layer names above (snerf_tpu.models.mlp /
  zipnerf ZipMLP trunks).
  """
  tp = _model_axis_size(mesh)

  def spec(path, leaf):
    return NamedSharding(mesh, _leaf_spec(_path_keys(path), leaf, tp))

  return jax.tree_util.tree_map_with_path(spec, state)


def shard_state(state, mesh: Mesh):
  """device_put a TrainState with tensor-parallel shardings over `mesh`.

  jit then compiles the train step respecting these committed input
  shardings; XLA inserts the all-gather/psum pairs over the "model" axis
  and the gradient psum over "data".
  """
  return jax.device_put(state, state_shardings(state, mesh))


def spec_axes(spec) -> set:
  """The set of mesh axis names a PartitionSpec touches."""
  axes = set()
  for entry in tuple(spec):
    if entry is None:
      continue
    if isinstance(entry, (tuple, list)):
      axes.update(entry)
    else:
      axes.add(entry)
  return axes


def num_model_shards(state, mesh: Mesh) -> int:
  """How many leaves actually got a model-axis sharding (for asserts)."""
  shardings = state_shardings(state, mesh)
  count = 0
  for s in jax.tree_util.tree_leaves(
      shardings, is_leaf=lambda x: isinstance(x, NamedSharding)):
    if MODEL_AXIS in spec_axes(s.spec):
      count += 1
  return count
