"""S-NeRF loss set, as pure masked functions (static shapes, no boolean
indexing).

Behavioral parity targets (formulas re-derived):
  reference s-nerf/model/loss_factory.py:5-74 (RgbLoss MSE, SemanticLoss CE,
  DepthLoss |x-y| or |1/x-1/y| with coarse multiplier, SmoothLoss edge-aware,
  ProposalLoss mip-360 interlevel bound),
  s-nerf/model/loss.py:14-34 (edge_aware_loss_v2).

TPU note (SURVEY.md §7 hard part 3): every reference boolean-mask select
(waymo side-cam rows, backcam rows, depth validity) becomes
multiply-by-mask with a renormalized mean so shapes stay static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from snerf_tpu.ops import stepfun


def masked_mean(x, mask=None):
  """Mean over elements where mask is true (mask broadcast against x)."""
  if mask is None:
    return jnp.mean(x)
  mask = jnp.broadcast_to(mask.astype(x.dtype), x.shape)
  return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def rgb_loss(pred, target, mask=None):
  """MSE (loss_factory.py:5-11)."""
  return masked_mean((pred - target) ** 2, mask)


def semantic_loss(logits, labels, mask=None, weight: float = 1.0):
  """Cross-entropy x lambda (loss_factory.py:13-24). Labels < 0 mark
  unlabeled pixels (nuScenes stores labels for a subset of images,
  dataloader.py:113-115) and are masked out."""
  labeled = labels >= 0
  mask = labeled if mask is None else (mask & labeled)
  safe_labels = jnp.maximum(labels, 0).astype(jnp.int32)
  ll = jax.nn.log_softmax(logits, axis=-1)
  nll = -jnp.take_along_axis(ll, safe_labels[..., None], axis=-1)[..., 0]
  return weight * masked_mean(nll, mask)


def depth_loss(pred, pred_coarse, target, mask=None,
               disparity: bool = False, coarse_mult: float = 0.1,
               conf_weight=None):
  """|d - d*| (+ coarse term), optionally in disparity space, optionally
  weighted by a per-ray confidence map (loss_factory.py:26-37,
  confidence.py:209-225).
  """
  if disparity:
    err = lambda x: jnp.abs(1.0 / jnp.maximum(x, 1e-5) -
                            1.0 / jnp.maximum(target, 1e-5))
  else:
    err = lambda x: jnp.abs(x - target)
  per_ray = err(pred) + coarse_mult * err(pred_coarse)
  if conf_weight is not None:
    per_ray = per_ray * conf_weight
  valid = target > 0
  mask = valid if mask is None else (mask & valid)
  return masked_mean(per_ray, mask)


def edge_aware_smooth_loss(rgb_patches, distance_patches, skymask=None,
                           weight: float = 1.0):
  """Edge-aware disparity smoothness over [P, ps, ps, C] patches.

  Parity: loss.py:14-34 (edge_aware_loss_v2) + SmoothLoss wrapper
  (loss_factory.py:39-58) — disparity = 1/clamp(distance), normalized by
  patch mean, gradients down-weighted by image gradients; sky pixels get a
  doubled penalty.
  """
  disp = 1.0 / jnp.clip(distance_patches, 1e-5)
  if disp.ndim == 3:
    disp = disp[..., None]
  mean_disp = disp.mean(axis=(1, 2), keepdims=True)
  disp = disp / (mean_disp + 1e-7)

  grad_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
  grad_y = jnp.abs(disp[:, :-1] - disp[:, 1:])
  rgb_gx = jnp.mean(jnp.abs(rgb_patches[:, :, :-1] - rgb_patches[:, :, 1:]),
                    axis=3, keepdims=True)
  rgb_gy = jnp.mean(jnp.abs(rgb_patches[:, :-1] - rgb_patches[:, 1:]),
                    axis=3, keepdims=True)
  grad_x = grad_x * jnp.exp(-rgb_gx)
  grad_y = grad_y * jnp.exp(-rgb_gy)
  if skymask is not None:
    sky = skymask.astype(grad_x.dtype)
    if sky.ndim == 3:
      sky = sky[..., None]
    grad_x = grad_x + sky[:, :, :-1] * grad_x
    grad_y = grad_y + sky[:, :-1] * grad_y
  return weight * (grad_x.mean() + grad_y.mean())


def _edge_aware_masked(rgb_patches, grad_x, grad_y, valid_mask=None):
  """Shared core of the zip patch smoothness losses: |grad| maps weighted
  by exp(-|grad rgb|), masked-meaned over pairs whose BOTH endpoints are
  valid (reference train_utils.py:308-315 mask path)."""
  rgb_gx = jnp.mean(jnp.abs(rgb_patches[:, :, :-1] - rgb_patches[:, :, 1:]),
                    axis=3, keepdims=True)
  rgb_gy = jnp.mean(jnp.abs(rgb_patches[:, :-1] - rgb_patches[:, 1:]),
                    axis=3, keepdims=True)
  sx = grad_x * jnp.exp(-rgb_gx)
  sy = grad_y * jnp.exp(-rgb_gy)
  if valid_mask is None:
    return sx.mean() + sy.mean()
  m = valid_mask.astype(sx.dtype)
  mx = (m[:, :, :-1] * m[:, :, 1:])[..., None]
  my = (m[:, :-1] * m[:, 1:])[..., None]
  return (masked_mean(sx, jnp.broadcast_to(mx, sx.shape) > 0) +
          masked_mean(sy, jnp.broadcast_to(my, sy.shape) > 0))


def zip_smooth_loss(rgb_patches, depth_patches, valid_mask=None,
                    weight: float = 1.0):
  """zip-nerf edge-aware inverse-depth patch smoothness.

  Parity: zipnerf train.py:281-293 (disp = 1/(depth+1e-5), patch-mean
  normalized) + train_utils.py:297-335 edge_aware_loss_v2 with the
  object-mask path (masked pixels excluded from both gradient endpoints).
  """
  disp = 1.0 / (depth_patches + 1e-5)
  if disp.ndim == 3:
    disp = disp[..., None]
  mean_disp = disp.mean(axis=(1, 2), keepdims=True)
  disp = disp / (mean_disp + 1e-7)
  grad_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
  grad_y = jnp.abs(disp[:, :-1] - disp[:, 1:])
  return weight * _edge_aware_masked(rgb_patches, grad_x, grad_y, valid_mask)


def zip_semantic_smooth_loss(rgb_patches, semantic_patches, valid_mask=None,
                             weight: float = 1.0):
  """zip-nerf edge-aware semantic patch smoothness.

  Parity: train_utils.py:337-377 edge_aware_loss_for_semantic — semantic
  probabilities normalized by the patch mean, channel gradients summed to
  one map, then the same edge-aware masked mean.
  """
  sem = semantic_patches / (semantic_patches.mean(axis=(1, 2),
                                                  keepdims=True) + 1e-5)
  # channel-summed gradient magnitude (train_utils.py:347-350)
  grad_x = jnp.sum(jnp.abs(sem[:, :, :-1] - sem[:, :, 1:]), axis=-1,
                   keepdims=True)
  grad_y = jnp.sum(jnp.abs(sem[:, :-1] - sem[:, 1:]), axis=-1,
                   keepdims=True)
  return weight * _edge_aware_masked(rgb_patches, grad_x, grad_y, valid_mask)


def proposal_loss(s_vals_f, weights_f, s_vals_c, weights_c,
                  weight: float = 1.0):
  """mip-360 interlevel bound: fine weights must fit under the coarse
  envelope (loss_factory.py:60-74). Gradient flows to the coarse level only.
  """
  s_vals_f = jax.lax.stop_gradient(s_vals_f)
  weights_f = jax.lax.stop_gradient(weights_f)
  losses = stepfun.lossfun_outer(s_vals_f, weights_f, s_vals_c, weights_c)
  return weight * jnp.mean(jnp.sum(losses, axis=-1))


def distortion_loss(s_vals, weights, weight: float = 1.0):
  """mip-360 distortion (zipnerf stepfun.py:297-308)."""
  return weight * jnp.mean(stepfun.lossfun_distortion(s_vals, weights))


def charbonnier_loss(pred, target, mask=None, padding: float = 0.001):
  """Charbonnier data loss (zipnerf train_utils.py:55-115)."""
  err = jnp.sqrt((pred - target) ** 2 + padding ** 2)
  return masked_mean(err, mask)


def interlevel_loss_anti(s_prop, w_prop, s_nerf, w_nerf, blur_r: float,
                         weight: float = 1.0):
  """zip-nerf anti-aliased interlevel loss (train_utils.py:132-164).

  Blur the (stop-grad) nerf histogram by r, resample onto the proposal
  intervals, then penalize proposal under-coverage.
  """
  s_nerf = jax.lax.stop_gradient(s_nerf)
  w_nerf = jax.lax.stop_gradient(w_nerf)
  eps = jnp.finfo(jnp.float32).eps
  w_norm = w_nerf / jnp.maximum(
      eps, (s_nerf[..., 1:] - s_nerf[..., :-1]))
  xr, yr = stepfun.blur_stepfun(s_nerf, w_norm, blur_r)
  # Integrate the blurred pdf over the proposal intervals.
  w_bound = _integrate_pwl(xr, yr, s_prop)
  losses = jnp.maximum(0, w_bound - w_prop) ** 2 / (w_prop + eps)
  return weight * jnp.mean(jnp.sum(losses, axis=-1))


def _integrate_pwl(x, y, t):
  """Integral of the piecewise-linear density (x, y) over each interval of t.

  The antiderivative of a linear density is quadratic; we evaluate it
  exactly (the reference's sorted_interp_quad, zipnerf math.py:133+),
  not by linear interpolation of the CDF.
  """
  from snerf_tpu.ops import math as smath
  seg = 0.5 * (y[..., :-1] + y[..., 1:]) * (x[..., 1:] - x[..., :-1])
  acc = jnp.concatenate(
      [jnp.zeros_like(seg[..., :1]), jnp.cumsum(seg, axis=-1)], axis=-1)
  idx_lo, idx_hi = smath.searchsorted(x, t)
  x0 = jnp.take_along_axis(x, idx_lo, axis=-1)
  x1 = jnp.take_along_axis(x, idx_hi, axis=-1)
  y0 = jnp.take_along_axis(y, idx_lo, axis=-1)
  y1 = jnp.take_along_axis(y, idx_hi, axis=-1)
  acc0 = jnp.take_along_axis(acc, idx_lo, axis=-1)
  dx = jnp.clip(t - x0, 0.0, jnp.maximum(x1 - x0, 0.0))
  slope = jnp.where(x1 > x0, (y1 - y0) / jnp.maximum(x1 - x0, 1e-20), 0.0)
  acc_at_t = acc0 + y0 * dx + 0.5 * slope * dx ** 2
  return acc_at_t[..., 1:] - acc_at_t[..., :-1]
