"""Alpha compositing / volume rendering primitives.

Behavioral parity targets (formulas re-derived):
  S-NeRF: reference s-nerf/model/mip.py:121-189 (volumetric_rendering,
    real_volumetric_rendering with s->t transform + semantic compositing).
  zip-nerf: reference s-nerfpp/zipnerf/internal/render.py:129-269
    (multisampled cast_rays with hexagonal pattern, compute_alpha_weights
    with opaque background, volumetric_rendering with log-depth expectation
    and weighted distance percentiles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from snerf_tpu.ops import coord, stepfun


def compute_alpha_weights(density, t_vals, dirs, opaque_background=False):
  """Compositing weights from density along metric t intervals.

  density: [..., S]; t_vals: [..., S+1]; dirs: [..., 3].
  Returns (weights, alpha, trans), each [..., S].
  """
  t_delta = t_vals[..., 1:] - t_vals[..., :-1]
  delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
  density_delta = density * delta
  if opaque_background:
    density_delta = jnp.concatenate([
        density_delta[..., :-1],
        jnp.full_like(density_delta[..., -1:], jnp.inf)
    ], axis=-1)
  alpha = 1 - jnp.exp(-density_delta)
  trans = jnp.exp(-jnp.concatenate([
      jnp.zeros_like(density_delta[..., :1]),
      jnp.cumsum(density_delta[..., :-1], axis=-1)
  ], axis=-1))
  weights = alpha * trans
  return weights, alpha, trans


def volumetric_rendering(rgb, density, s_vals, dirs, near, far,
                         semantic=None, white_bkgd: bool = False,
                         t_transform: str = "log"):
  """S-NeRF-style rendering: s in [0,1] -> metric t, composite rgb/sem/depth.

  rgb: [..., S, 3] or None; density: [..., S]; s_vals: [..., S+1].
  Returns dict(rgb, distance, acc, weights, semantic).
  """
  t_vals = coord.s_to_t(s_vals, near, far, t_transform)
  weights, _, _ = compute_alpha_weights(density, t_vals, dirs)

  t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
  acc = weights.sum(axis=-1)
  distance = (weights * t_mids).sum(axis=-1)
  distance = jnp.clip(jnp.nan_to_num(distance, posinf=jnp.inf),
                      t_vals[..., 0], t_vals[..., -1])

  comp_rgb = None
  if rgb is not None:
    comp_rgb = (weights[..., None] * rgb).sum(axis=-2)
    if white_bkgd:
      comp_rgb = comp_rgb + (1.0 - acc[..., None])
  comp_sem = None
  if semantic is not None:
    comp_sem = (weights[..., None] * semantic).sum(axis=-2)
  return dict(rgb=comp_rgb, distance=distance, acc=acc, weights=weights,
              semantic=comp_sem, t_vals=t_vals)


def volumetric_rendering_zip(rgbs, weights, t_vals, bg_rgbs, t_far,
                             compute_extras: bool = False, semantic=None,
                             extras=None):
  """zip-nerf-style rendering with log-space depth expectation."""
  eps = jnp.finfo(jnp.float32).eps
  rendering = {}

  acc = weights.sum(axis=-1)
  bg_w = jnp.maximum(0.0, 1 - acc[..., None])
  rendering["rgb"] = (weights[..., None] * rgbs).sum(axis=-2) + bg_w * bg_rgbs

  t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
  expectation = lambda x: (weights * x).sum(axis=-1) / jnp.maximum(eps, acc)
  rendering["depth"] = jnp.clip(
      jnp.nan_to_num(jnp.exp(expectation(jnp.log(t_mids))), posinf=jnp.inf),
      t_vals[..., 0], t_vals[..., -1])
  rendering["acc"] = acc

  if semantic is not None:
    # Semantics composited with stop-grad weights: the semantic head must not
    # shape density (reference render.py:240-244).
    w_sem = jax.lax.stop_gradient(weights)
    rendering["semantic"] = (w_sem[..., None] * semantic).sum(axis=-2)

  if compute_extras:
    if extras is not None:
      for k, v in extras.items():
        if v is not None:
          rendering[k] = (weights[..., None] * v).sum(axis=-2)
    t_aug = jnp.concatenate([t_vals, t_far], axis=-1)
    weights_aug = jnp.concatenate([weights, bg_w], axis=-1)
    ps = [5, 50, 95]
    pcts = stepfun.weighted_percentile(t_aug, weights_aug, ps)
    for i, p in enumerate(ps):
      s = "median" if p == 50 else f"percentile_{p}"
      rendering[f"distance_{s}"] = pcts[..., i]
  return rendering


def cast_rays_multisample(key, t_vals, origins, directions, radii,
                          base_x, base_y, n: int = 7, m: int = 3,
                          std_scale: float = 0.35):
  """zip-nerf hexagonal multisampling: n points per frustum section.

  Returns (means [..., S, n, 3], stds [..., S, n]).
  """
  t0 = t_vals[..., :-1]
  t1 = t_vals[..., 1:]
  j = jnp.arange(n, dtype=t_vals.dtype)
  t = t0[..., None] + (t1[..., None] - t0[..., None]) * (j + 0.5) / n
  deg = jnp.broadcast_to(2 * jnp.pi * m * j / n, t.shape)
  if key is not None:
    deg = deg + jax.random.uniform(key, deg.shape) * jnp.pi * 2
  r = radii[..., None, None]  # [..., 1, 1] broadcasting over (S, n)
  means = jnp.stack([
      r * t * jnp.cos(deg) / 2,
      r * t * jnp.sin(deg) / 2,
      t,
  ], axis=-1)
  stds = std_scale * r * t
  # basis columns: [base_x | base_y | dir]; world = basis @ local per point.
  basis = jnp.stack([base_x, base_y, directions], axis=-1)
  means = jnp.einsum("...snj,...ij->...sni", means, basis)
  means = means + origins[..., None, None, :]
  return means, stds
