"""Learnable pose refinement.

Behavioral parity targets (re-derived):
  reference s-nerf/model/poses.py:6-37 (LearnPose: per-camera axis-angle r
  and translation t, c2w = [Exp(r)|t] composed onto the init pose),
  s-nerfpp/zipnerf/posenet_v2.py:28-108 (batched variant with t_ratio
  scaling of the learned translation).

TPU note: poses are gathered per-ray inside the jitted step — a [num_cams,3]
table lookup, not a Python-side module call per camera.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from snerf_tpu.ops import lie


class LearnPose(nn.Module):
  """Per-camera learnable SE(3) delta composed onto initial c2w poses."""
  num_cams: int
  learn_rotation: bool = True
  learn_translation: bool = True
  t_ratio: float = 1.0

  @nn.compact
  def __call__(self, cam_ids, c2w_init: Optional[jnp.ndarray] = None):
    """cam_ids: [...] int32; c2w_init: [..., 3, 4] or None.

    Returns refined c2w [..., 3, 4].
    """
    r_table = self.param("r", nn.initializers.zeros, (self.num_cams, 3))
    t_table = self.param("t", nn.initializers.zeros, (self.num_cams, 3))
    r = r_table[cam_ids]
    t = t_table[cam_ids] * self.t_ratio
    if not self.learn_rotation:
      r = jnp.zeros_like(r)
    if not self.learn_translation:
      t = jnp.zeros_like(t)
    return lie.make_c2w(r, t, c2w_init)
