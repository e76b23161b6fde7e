"""Dense tri-plane fine encoder (TPU-native).

Capability target: the fine levels of the reference's instant-NGP grid
(s-nerfpp/zipnerf/gridencoder/src/gridencoder.cu:50-160) — learned
high-frequency spatial features. On v5e the full hash ladder is
gather-bound (PERF.md primitive survey), and the round-3 `cp_hash`
frontier showed ONE fine gathered level on top of the matmul-only CP
base stays inside the measured gather-fast regime. A hash table at
log2=19 under a 2048^3 virtual grid aliases ~16k cells per row; this
module replaces that fine hash level with three DENSE axis-aligned 2D
planes (xy, yz, xz) at full rank:

  - zero collisions: 3 x R^2 cells are all distinct rows;
  - fewer gathers than a hash level needs for the same detail
    (4 corners x 3 planes, each a flat row gather -> the measured-fast
    169 M idx/s form via ops.hash_ops.hash_gather, with the backward
    routed through scatter_add_rows);
  - 2D structure matches street scenes (ground plane, facades).

Returns features shaped [..., 3, C] (one pseudo-level per plane) so the
zip MLP's erf prefilter downweighting applies unchanged.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops.hash_ops import hash_gather

# 4 corner offsets of a bilinear cell.
_CORNERS2 = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype=np.int32)
# plane -> the two axes it spans
_PLANE_AXES = ((0, 1), (1, 2), (0, 2))


def triplane_encode_plane(xf, plane, resolution: int, axes):
  """Bilinear features of ONE plane for flat x [N, 3] in [0, 1]^3.

  plane: [R*R, C] flat row table; axes: the (a, b) pair it spans.
  """
  r = resolution
  pos = jnp.stack([xf[:, axes[0]], xf[:, axes[1]]], axis=-1) * (r - 1.0)
  c0 = jnp.floor(pos)
  frac = pos - c0
  corners = c0[:, None, :].astype(jnp.int32) + _CORNERS2[None]  # [N, 4, 2]
  corners = jnp.clip(corners, 0, r - 1)
  idx = corners[..., 0] * r + corners[..., 1]                   # [N, 4]
  w = jnp.where(_CORNERS2[None].astype(bool), frac[:, None, :],
                1.0 - frac[:, None, :]).prod(-1)                # [N, 4]
  rows = hash_gather(plane, idx)                                # [N, 4, C]
  return jnp.einsum("nc,ncd->nd", w, rows)


def triplane_encode(x, planes, resolution: int):
  """x [..., 3] in [0, 1]^3, planes [3, R*R, C] -> [..., 3, C].

  Out-of-range inputs give zeros (gridencoder.cu boundary contract).
  Per-plane remat mirrors hash_encode: indices/weights are recomputed in
  the backward instead of saving [N, 4] per plane.
  """
  batch_shape = x.shape[:-1]
  xf = x.reshape(-1, 3)
  oob = jnp.any((xf < 0) | (xf > 1), axis=-1)
  plane_fn = jax.checkpoint(
      triplane_encode_plane, static_argnums=(2, 3),
      policy=jax.checkpoint_policies.nothing_saveable)
  feats = [plane_fn(xf, planes[p], resolution, _PLANE_AXES[p])
           for p in range(3)]
  out = jnp.stack(feats, axis=-2)                               # [N, 3, C]
  out = jnp.where(oob[:, None, None], 0.0, out)
  return out.reshape(*batch_shape, 3, planes.shape[-1])


class TriplaneEncoding(nn.Module):
  """flax wrapper owning the three dense planes.

  API-compatible with HashEncoding where the zip MLP consumes it:
  __call__(x[..., 3]) -> [..., L=3, C], plus `grid_sizes` for the erf
  prefilter (all three planes share one resolution).
  """
  resolution: int = 2048
  level_dim: int = 4
  init_std: float = 1e-4

  def setup(self):
    r = self.resolution
    self.planes = self.param(
        "planes",
        lambda key, shape: jax.random.uniform(
            key, shape, minval=-self.init_std, maxval=self.init_std),
        (3, r * r, self.level_dim))

  def __call__(self, x):
    return triplane_encode(x, self.planes, self.resolution)

  @property
  def grid_sizes(self):
    return np.full((3,), float(self.resolution), np.float32)
