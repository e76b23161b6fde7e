"""Ray sampling: stratified + hierarchical inverse-CDF (S-NeRF generation).

Behavioral parity targets (formulas re-derived):
  reference s-nerf/model/mip.py:192-320 (sample_along_rays,
  resample_along_rays, warp_{sample,resample}_along_rays),
  s-nerf/model/math_ops.py:19-76 (sorted_piecewise_constant_pdf),
  s-nerf/model/run_nerf_helpers.py:336-379 (sample_pdf, classic NeRF).

All samplers operate in normalized s-space [0, 1] and are pure functions of
an explicit PRNG key (key=None => deterministic linspace, matching the
reference's randomized=False branch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from snerf_tpu.ops import math as smath


def stratified_sample(key, batch_shape, num_samples: int):
  """Stratified samples of [0,1]: [*batch, num_samples+1] sorted s values."""
  s_vals = jnp.linspace(0.0, 1.0, num_samples + 1)
  if key is None:
    return jnp.broadcast_to(s_vals, (*batch_shape, num_samples + 1))
  mids = 0.5 * (s_vals[..., 1:] + s_vals[..., :-1])
  upper = jnp.concatenate([mids, s_vals[..., -1:]], axis=-1)
  lower = jnp.concatenate([s_vals[..., :1], mids], axis=-1)
  s_rand = jax.random.uniform(key, (*batch_shape, num_samples + 1))
  return lower + (upper - lower) * s_rand


def sorted_piecewise_constant_pdf(key, bins, weights, num_samples: int):
  """Inverse-CDF sampling from a piecewise-constant PDF over sorted bins.

  bins: [..., n_bins+1]; weights: [..., n_bins]; returns [..., num_samples].
  """
  eps = 1e-5
  weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
  padding = jnp.maximum(0, eps - weight_sum)
  weights = weights + padding / weights.shape[-1]
  weight_sum = weight_sum + padding

  pdf = weights / weight_sum
  cdf = jnp.minimum(1, jnp.cumsum(pdf[..., :-1], axis=-1))
  cdf = jnp.concatenate([
      jnp.zeros((*cdf.shape[:-1], 1), cdf.dtype), cdf,
      jnp.ones((*cdf.shape[:-1], 1), cdf.dtype)
  ], axis=-1)

  f32_eps = jnp.finfo(jnp.float32).eps
  if key is not None:
    s = 1 / num_samples
    u = jnp.arange(num_samples) * s
    u = u + jax.random.uniform(
        key, (*cdf.shape[:-1], num_samples), maxval=s - f32_eps)
    u = jnp.minimum(u, 1.0 - f32_eps)
  else:
    u = jnp.linspace(0.0, 1.0 - f32_eps, num_samples)
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))

  # Dense mask-reduction bracket (math_ops.py:62-72): pure VPU work — on
  # TPU this is ~10x faster than searchsorted + gathers at NeRF bin counts.
  (bins_g0, bins_g1), (cdf_g0, cdf_g1) = smath.bracket(
      cdf, u, (bins, cdf))

  t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0, 1)
  return bins_g0 + t * (bins_g1 - bins_g0)


def blur_weights(weights, resample_padding: float):
  """Max-blur + pad weights before hierarchical resampling (mip-NeRF)."""
  weights_pad = jnp.concatenate(
      [weights[..., :1], weights, weights[..., -1:]], axis=-1)
  weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
  weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])
  return weights_blur + resample_padding


def resample_from_weights(key, s_vals, weights, num_samples: int,
                          resample_padding: float = 0.01,
                          stop_grad: bool = True):
  """Hierarchical resampling: blur coarse weights, draw fine s values.

  s_vals: [..., n+1] sorted; weights: [..., n]; returns [..., num_samples+1]
  sorted (the inverse-CDF draw of num_samples+1 points is sorted because u is
  monotone per ray, matching the reference resample_along_rays contract).
  """
  w = blur_weights(weights, resample_padding)
  new_s = sorted_piecewise_constant_pdf(key, s_vals, w, num_samples + 1)
  if stop_grad:
    new_s = jax.lax.stop_gradient(new_s)
  return new_s


def sample_pdf(key, bins, weights, num_samples: int, det: bool = False):
  """Classic-NeRF hierarchical sampler (run_nerf_helpers.py:336-379 parity).

  bins: [..., n_bins] midpoints; weights: [..., n_bins]; returns unsorted-ish
  [..., num_samples] (caller sorts with the coarse samples).
  """
  weights = weights + 1e-5
  pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
  cdf = jnp.cumsum(pdf, axis=-1)
  # Pin the final entry to exactly 1.0: the f32 cumsum can land below
  # 1 - eps, violating bracket()'s u < cdf[..., -1] precondition (the
  # explicit ones column mirrors sorted_piecewise_constant_pdf).
  cdf = jnp.concatenate(
      [jnp.zeros_like(cdf[..., :1]), cdf[..., :-1],
       jnp.ones_like(cdf[..., :1])], axis=-1)

  f32_eps = jnp.finfo(jnp.float32).eps
  if det or key is None:
    u = jnp.linspace(0.0, 1.0 - f32_eps, num_samples)
    u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))
  else:
    u = jnp.minimum(
        jax.random.uniform(key, (*cdf.shape[:-1], num_samples)),
        1.0 - f32_eps)

  # classic-NeRF contract: bins are the n_bins midpoints and weights have
  # n_bins - 1 entries, so cdf = [0, cumsum] aligns with bins exactly.
  (cdf_g0, cdf_g1), (bins_g0, bins_g1) = smath.bracket(
      cdf, u, (cdf, bins))

  denom = cdf_g1 - cdf_g0
  denom = jnp.where(denom < 1e-5, 1.0, denom)
  t = (u - cdf_g0) / denom
  return bins_g0 + t * (bins_g1 - bins_g0)
