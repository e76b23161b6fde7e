"""S-NeRF generation MLPs (flax.linen).

Behavioral parity targets (architecture re-derived, not translated):
  reference s-nerf/model/models.py:200-296 (DenseBlock/MLP: 8-layer trunk,
  skip cat every 4th layer, density head, semantic head off the trunk,
  bottleneck + viewdir-condition branch -> rgb head),
  models.py:299-325 (proposal: 4-layer density-only net).

TPU notes: all Dense layers act on the last axis of [N_rays, S, F] tensors —
XLA maps these to MXU matmuls with batch = N_rays*S. Params are f32; the
`compute_dtype` knob runs activations in bf16 (MXU-native) with f32 heads.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

_glorot = nn.initializers.glorot_uniform()


class NerfMLP(nn.Module):
  """Trunk + density + semantic + conditioned rgb branch.

  Input x: [..., feature_dim] (IPE features); condition: [..., cond_dim]
  broadcast over the sample axis by the caller (or passed per-sample).
  """
  net_depth: int = 8
  net_width: int = 256
  skip_layer: int = 4
  condition_depth: int = 1
  condition_width: int = 128
  num_rgb_channels: int = 3
  num_density_channels: int = 1
  num_semantic_channels: int = 0
  compute_dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x, condition: Optional[jnp.ndarray] = None):
    dense = lambda w, name: nn.Dense(
        w, kernel_init=_glorot, dtype=self.compute_dtype, name=name)
    inputs = x.astype(self.compute_dtype)
    h = inputs
    for i in range(self.net_depth):
      h = nn.relu(dense(self.net_width, f"trunk_{i}")(h))
      # Reference concatenates the skip AFTER layer i for i>0, i%skip==0
      # (models.py:268-272).
      if i % self.skip_layer == 0 and i > 0:
        h = jnp.concatenate([h, inputs], axis=-1)

    raw_density = nn.Dense(
        self.num_density_channels, kernel_init=_glorot,
        dtype=jnp.float32, name="density")(h.astype(jnp.float32))

    raw_semantic = None
    if self.num_semantic_channels > 0:
      sem = nn.relu(dense(self.net_width // 2, "semantic_hidden")(h))
      raw_semantic = nn.Dense(
          self.num_semantic_channels, kernel_init=_glorot,
          dtype=jnp.float32, name="semantic")(sem.astype(jnp.float32))

    if condition is not None:
      bottleneck = nn.relu(dense(self.net_width, "bottleneck")(h))
      cond = condition.astype(self.compute_dtype)
      if cond.ndim == bottleneck.ndim - 1:
        cond = jnp.broadcast_to(
            cond[..., None, :], bottleneck.shape[:-1] + cond.shape[-1:])
      h = jnp.concatenate([bottleneck, cond], axis=-1)
      for i in range(self.condition_depth):
        h = nn.relu(dense(self.condition_width, f"cond_{i}")(h))

    raw_rgb = nn.Dense(
        self.num_rgb_channels, kernel_init=_glorot,
        dtype=jnp.float32, name="rgb")(h.astype(jnp.float32))
    return raw_rgb, raw_density, raw_semantic


class ProposalMLP(nn.Module):
  """Density-only proposal net (reference models.py:299-325: 4 plain layers)."""
  net_depth: int = 4
  net_width: int = 256
  num_density_channels: int = 1
  compute_dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x):
    h = x.astype(self.compute_dtype)
    for i in range(self.net_depth):
      h = nn.relu(nn.Dense(self.net_width, kernel_init=_glorot,
                           dtype=self.compute_dtype, name=f"trunk_{i}")(h))
    raw_density = nn.Dense(
        self.num_density_channels, kernel_init=_glorot,
        dtype=jnp.float32, name="density")(h.astype(jnp.float32))
    return raw_density
