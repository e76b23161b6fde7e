"""SO(3) / SE(3) helpers for pose refinement.

Behavioral parity targets: reference s-nerf/utils/lie_group_helper.py:47-81
(Exp map via Taylor-safe Rodrigues), s-nerfpp/zipnerf/posenet_v2.py:28-108
(batched axis-angle Exp). All functions are batched and vmap-clean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mm(a, b):
  # Pose math is tiny; force f32 accumulation (TPU default dot is bf16).
  return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def skew(v):
  """[..., 3] -> [..., 3, 3] skew-symmetric matrices."""
  zeros = jnp.zeros_like(v[..., 0])
  return jnp.stack([
      jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
      jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
      jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
  ], axis=-2)


def exp_so3(r):
  """Rodrigues exp map, Taylor-safe near theta=0. r: [..., 3] -> [..., 3, 3].

  Grad-safe at r=0 via the double-where trick: sqrt only ever sees a value
  bounded away from 0, and the small branch is polynomial in theta^2 (the
  zero-init LearnPose tables differentiate through here every step).
  """
  theta_sq = jnp.sum(r ** 2, axis=-1, keepdims=True)[..., None]  # [...,1,1]
  K = skew(r)
  K2 = _mm(K, K)
  small = theta_sq < 1e-12
  safe_theta_sq = jnp.where(small, 1.0, theta_sq)
  theta = jnp.sqrt(safe_theta_sq)
  # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near 0.
  a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
  b = jnp.where(small, 0.5 - theta_sq / 24.0,
                (1.0 - jnp.cos(theta)) / safe_theta_sq)
  eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
  return eye + a * K + b * K2


def log_so3(R):
  """Inverse Rodrigues: [..., 3, 3] -> [..., 3] axis-angle."""
  trace = jnp.trace(R, axis1=-2, axis2=-1)
  cos_theta = jnp.clip((trace - 1) / 2, -1.0, 1.0)
  theta = jnp.arccos(cos_theta)
  w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                 R[..., 0, 2] - R[..., 2, 0],
                 R[..., 1, 0] - R[..., 0, 1]], axis=-1)
  sin_theta = jnp.sin(theta)
  scale = jnp.where(jnp.abs(sin_theta) < 1e-6, 0.5,
                    theta / (2.0 * jnp.where(jnp.abs(sin_theta) < 1e-6, 1.0,
                                             sin_theta)))
  return scale[..., None] * w


def make_c2w(r, t, c2w_init=None):
  """Refined camera-to-world: delta pose [Exp(r) | t] composed onto init.

  r, t: [..., 3]; c2w_init: [..., >=3, 4]. Returns [..., 3, 4].
  Parity: reference model/poses.py:24-37 composes the full 4x4 delta on the
  left: R = Exp(r) @ R_init, trans = Exp(r) @ t_init + t.
  """
  R_delta = exp_so3(r)
  if c2w_init is None:
    return jnp.concatenate([R_delta, t[..., None]], axis=-1)
  R = _mm(R_delta, c2w_init[..., :3, :3])
  trans = _mm(R_delta, c2w_init[..., :3, 3:4])[..., 0] + t
  return jnp.concatenate([R, trans[..., None]], axis=-1)
