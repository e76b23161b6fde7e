"""Multiresolution hash-grid encoder (instant-NGP style), JAX-native.

Behavioral parity target (semantics re-derived from the kernel contract):
  reference s-nerfpp/zipnerf/gridencoder/grid.py:96-201 (level layout:
  geometric resolutions, per-level table min(2^T, res^3) rounded to 8) and
  gridencoder/src/gridencoder.cu:50-160 (fast_hash xor-primes, stride
  indexing with fallback to hashing when the dense grid exceeds the table,
  pos = x * scale + 0.5 for align_corners=False, trilinear weights,
  out-of-[0,1] inputs produce zero features).

TPU-native design: the forward is a static per-level unroll of 8-corner
gathers + trilinear blend; the backward (scatter-add into the table, the
CUDA kernel's atomicAdd path) falls out of JAX autodiff of the gather.
This is the correct-first implementation (SURVEY §2.6.1); the Pallas
kernel (snerf_tpu/ops/pallas/) replaces the hot path.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)
# 8 corner offsets of a trilinear cell.
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
    dtype=np.int32)


@dataclasses.dataclass(frozen=True)
class GridSpec:
  """Static per-level layout (grid.py:122-144 parity)."""
  scales: tuple          # float: x*scale+0.5 grid coords per level
  resolutions: tuple     # int: stride base (res+1 per dim, align=False)
  sizes: tuple           # int: table entries per level
  offsets: tuple         # int: start row of each level (+ total at end)
  level_dim: int

  @property
  def num_levels(self):
    return len(self.scales)

  @property
  def total_rows(self):
    return self.offsets[-1]


def make_grid_spec(num_levels: int = 10,
                   level_dim: int = 4,
                   base_resolution: int = 16,
                   desired_resolution: int = 8192,
                   log2_hashmap_size: int = 21,
                   input_dim: int = 3) -> GridSpec:
  if desired_resolution is not None and num_levels > 1:
    per_level_scale = np.exp2(
        np.log2(desired_resolution / base_resolution) / (num_levels - 1))
  else:
    per_level_scale = 2.0
  max_params = 2 ** log2_hashmap_size
  scales, resolutions, sizes, offsets = [], [], [], [0]
  for lvl in range(num_levels):
    scale = base_resolution * per_level_scale ** lvl - 1.0
    res = int(np.ceil(scale)) + 1
    size = min(max_params, (res + 1) ** input_dim)
    size = int(np.ceil(size / 8) * 8)
    scales.append(float(scale))
    resolutions.append(res)
    sizes.append(size)
    offsets.append(offsets[-1] + size)
  return GridSpec(tuple(scales), tuple(resolutions), tuple(sizes),
                  tuple(offsets), level_dim)


def _level_indices(pos_grid, resolution: int, size: int):
  """Row indices for integer corner coords [N, 8, 3] at one level.

  Dense stride indexing when the (res+1)^3 grid fits the table, else
  xor-prime hashing (gridencoder.cu:67-84).
  """
  stride_fits = (resolution + 1) ** 3 <= size
  if stride_fits:
    idx = (pos_grid[..., 0] +
           pos_grid[..., 1] * (resolution + 1) +
           pos_grid[..., 2] * (resolution + 1) ** 2)
    return idx % size
  u = pos_grid.astype(jnp.uint32)
  h = (u[..., 0] * _PRIMES[0]) ^ (u[..., 1] * _PRIMES[1]) ^ \
      (u[..., 2] * _PRIMES[2])
  return (h % jnp.uint32(size)).astype(jnp.int32)


def _level_rows_weights(xf, spec: GridSpec, lvl: int):
  """(row indices [N, 8], trilinear weights [N, 8]) for one level."""
  pos = xf * spec.scales[lvl] + 0.5
  c0 = jnp.floor(pos)
  frac = pos - c0
  corners = c0[:, None, :].astype(jnp.int32) + _CORNERS[None]  # [N, 8, 3]
  idx = _level_indices(corners, spec.resolutions[lvl], spec.sizes[lvl])
  w = jnp.where(_CORNERS[None].astype(bool), frac[:, None, :],
                1.0 - frac[:, None, :]).prod(-1)  # [N, 8]
  return spec.offsets[lvl] + idx, w


def hash_encode_level(xf, table, spec: GridSpec, lvl: int,
                      scatter_backend: str = "xla"):
  """Trilinear features of ONE level for flat x [N, 3] in [0, 1]^3."""
  from snerf_tpu.ops.hash_ops import hash_gather
  idx, w = _level_rows_weights(xf, spec, lvl)
  rows = hash_gather(table, idx, scatter_backend)  # [N, 8, C]
  return jnp.einsum("nc,ncd->nd", w, rows)


def hash_encode(x, table, spec: GridSpec, scatter_backend: str = "xla"):
  """Encode x in [0, 1]^3 -> per-level features.

  x: [..., 3]; table: [total_rows, level_dim].
  Returns [..., num_levels, level_dim]; out-of-range inputs give zeros.

  TPU formulation (PERF.md): per level, ONE flat row gather (the
  fast row form) with the table gradient routed through
  ops.hash_ops.scatter_add_rows; per-level loop keeps the gathered-rows
  intermediate at [N, 8, C] (an all-levels batched gather was measured
  no faster and OOMs at the reference sample budget).
  """
  batch_shape = x.shape[:-1]
  xf = x.reshape(-1, 3)
  oob = jnp.any((xf < 0) | (xf > 1), axis=-1)

  # remat: recompute each level's row indices + trilinear weights in the
  # backward instead of saving [N, 8] int32 per level (HBM-bound at the
  # reference sample budget; the recompute is cheap VPU hashing)
  level_fn = jax.checkpoint(
      hash_encode_level, static_argnums=(2, 3, 4),
      policy=jax.checkpoint_policies.nothing_saveable)
  feats = [level_fn(xf, table, spec, lvl, scatter_backend)
           for lvl in range(spec.num_levels)]
  out = jnp.stack(feats, axis=-2)  # [N, L, C]
  out = jnp.where(oob[:, None, None], 0.0, out)
  return out.reshape(*batch_shape, spec.num_levels, spec.level_dim)


class HashEncoding(nn.Module):
  """flax wrapper owning the table parameter (GridEncoder parity)."""
  num_levels: int = 10
  level_dim: int = 4
  base_resolution: int = 16
  desired_resolution: int = 8192
  log2_hashmap_size: int = 21
  init_std: float = 1e-4

  def setup(self):
    self.spec = make_grid_spec(
        self.num_levels, self.level_dim, self.base_resolution,
        self.desired_resolution, self.log2_hashmap_size)
    self.table = self.param(
        "table",
        lambda key, shape: jax.random.uniform(
            key, shape, minval=-self.init_std, maxval=self.init_std),
        (self.spec.total_rows, self.level_dim))

  def __call__(self, x):
    return hash_encode(x, self.table, self.spec)

  @property
  def grid_sizes(self):
    """Per-level grid scale factors, for the zip-nerf erf downweighting
    (models.py:500-502 uses encoder.grid_sizes).

    Reference grid.py stores ceil(base*scale^l) + 1 for align_corners=False;
    spec.resolutions is ceil(base*scale^l - 1) + 1 (the stride base), exactly
    one smaller per level, so add 1 here to match the erf prefilter weights.
    """
    return np.array(self.spec.resolutions, np.float32) + 1.0


def hash_decay_loss(table, spec: GridSpec, weight: float = 0.1):
  """Mean squared table entries per level, summed (train_utils.py:195-212:
  segment_coo mean of embeddings^2 over levels -> jnp slicing, the
  segment-sum is static here because offsets are static)."""
  total = 0.0
  for lvl in range(spec.num_levels):
    sl = table[spec.offsets[lvl]:spec.offsets[lvl + 1]]
    total = total + jnp.mean(jnp.sum(sl ** 2, axis=-1))
  return weight * total


def total_variation_loss(table, spec: GridSpec, key, n_samples: int = 4096,
                         weight: float = 1e-7):
  """Stochastic total-variation regularizer over the hash grid.

  Parity: gridencoder grad_total_variation (grid.py:181-201) adds the TV
  gradient at random points; here it is a loss (autodiff provides the
  gradient) — sampled cells' features vs +1-neighbor cells.
  """
  x = jax.random.uniform(key, (n_samples, 3))
  eps_axes = jnp.eye(3)
  tv = 0.0
  for lvl in range(spec.num_levels):
    # one-cell step PER LEVEL (grid.py:181-201 steps whole cells at each
    # level's own resolution; a shared finest-level step would give coarse
    # levels a sub-cell estimator instead)
    step = 1.0 / spec.scales[lvl]
    f0 = hash_encode_level(x, table, spec, lvl)
    for d in range(3):
      f1 = hash_encode_level(jnp.clip(x + step * eps_axes[d], 0, 1),
                             table, spec, lvl)
      tv = tv + jnp.mean((f1 - f0) ** 2)
  return weight * tv
