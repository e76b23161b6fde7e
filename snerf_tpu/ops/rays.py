"""Ray bundle pytree.

Parity target: the 8-field `Rays` namedtuple of the reference
(s-nerf/train.py:27 — origins, directions, viewdirs, radii, lossmult,
near, far, app). Implemented as a flax.struct dataclass so it flows
through jit/vmap/shard as a pytree with static treedef.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Rays:
  """A bundle of rays. All leading dims are batch dims; trailing dims:

    origins    [..., 3]  ray origins (world)
    directions [..., 3]  un-normalized ray directions (pixel-spacing scaled)
    viewdirs   [..., 3]  normalized view directions
    radii      [..., 1]  base radii of the pixel cone/cylinder
    lossmult   [..., 1]  per-ray loss multiplier
    near       [..., 1]  near plane
    far        [..., 1]  far plane
    app        [..., 1]  appearance-embedding id (int32, optional semantics)
  """
  origins: Any
  directions: Any
  viewdirs: Any
  radii: Any
  lossmult: Any
  near: Any
  far: Any
  app: Any = None

  @property
  def batch_shape(self):
    return self.origins.shape[:-1]

  def reshape(self, *shape):
    import jax
    return jax.tree_util.tree_map(
        lambda x: x.reshape(*shape, x.shape[-1]), self)


def pad_rays(rays: Rays, n: int) -> Rays:
  """Edge-pad the leading axis to length n (for divisibility by mesh size)."""
  import jax

  def _pad(x):
    pad = n - x.shape[0]
    if pad <= 0:
      return x
    return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)

  return jax.tree_util.tree_map(_pad, rays)
