"""Step-function toolbox (zip-nerf style resampling & losses), JAX-native.

Behavioral parity targets (formulas re-derived):
  reference s-nerfpp/zipnerf/internal/stepfun.py:6-433 — searchsorted/query,
  inner_outer + lossfun_outer (proposal bound), weight<->pdf, max_dilate,
  integrate_weights, invert_cdf, sample / sample_intervals,
  lossfun_distortion, weighted_percentile, resample, blur_stepfun.

Randomness is threaded as an explicit jax PRNG key (key=None => the
deterministic linspace path of the reference's rand=None branch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from snerf_tpu.ops import math as smath


def searchsorted(a, v):
  """(idx_lo, idx_hi) such that a[lo] <= v < a[hi], clamped at the ends."""
  return smath.searchsorted(a, v)


def query(tq, t, y, outside_value=0):
  """Look up the step function (t, y) at locations tq."""
  idx_lo, idx_hi = searchsorted(t, tq)
  yq = jnp.where(idx_lo == idx_hi, outside_value,
                 smath._gather_last(y, jnp.minimum(idx_lo,
                                                   y.shape[-1] - 1)))
  return yq


def inner_outer(t0, t1, y1):
  """Inner and outer measures of step function (t1, y1) on intervals t0.

  TPU note: gathers replaced by smath._gather_last (dense one-hot einsum
  at NeRF bin counts)."""
  cy1 = jnp.concatenate(
      [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
  idx_lo, idx_hi = searchsorted(t1, t0)
  cy1_lo = smath._gather_last(cy1, idx_lo)
  cy1_hi = smath._gather_last(cy1, idx_hi)
  y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
  y0_inner = jnp.where(idx_hi[..., :-1] <= idx_lo[..., 1:],
                       cy1_lo[..., 1:] - cy1_hi[..., :-1], 0)
  return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env):
  """Proposal loss: penalize nerf weight exceeding the proposal envelope."""
  eps = jnp.finfo(t.dtype).eps
  _, w_outer = inner_outer(t, t_env, w_env)
  return jnp.maximum(0, w - w_outer) ** 2 / (w + eps)


def weight_to_pdf(t, w):
  eps = jnp.finfo(t.dtype).eps
  return w / jnp.maximum(eps, t[..., 1:] - t[..., :-1])


def pdf_to_weight(t, p):
  return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
  """Dilate (max-pool) a non-negative step function by +-dilation."""
  t0 = t[..., :-1] - dilation
  t1 = t[..., 1:] + dilation
  t_dilate = jnp.sort(jnp.concatenate([t, t0, t1], axis=-1), axis=-1)
  t_dilate = jnp.clip(t_dilate, *domain)
  w_dilate = jnp.max(
      jnp.where((t0[..., None, :] <= t_dilate[..., None]) &
                (t1[..., None, :] > t_dilate[..., None]),
                w[..., None, :], 0), axis=-1)[..., :-1]
  return t_dilate, w_dilate


def max_dilate_weights(t, w, dilation, domain=(-jnp.inf, jnp.inf),
                       renormalize=False):
  eps = jnp.finfo(w.dtype).eps
  p = weight_to_pdf(t, w)
  t_dilate, p_dilate = max_dilate(t, p, dilation, domain=domain)
  w_dilate = pdf_to_weight(t_dilate, p_dilate)
  if renormalize:
    w_dilate = w_dilate / jnp.maximum(
        eps, jnp.sum(w_dilate, axis=-1, keepdims=True))
  return t_dilate, w_dilate


def integrate_weights(w):
  """CDF endpoints of a weight vector summing to 1: starts 0, ends 1."""
  cw = jnp.minimum(1, jnp.cumsum(w[..., :-1], axis=-1))
  shape = cw.shape[:-1] + (1,)
  return jnp.concatenate(
      [jnp.zeros(shape, cw.dtype), cw, jnp.ones(shape, cw.dtype)], axis=-1)


def invert_cdf(u, t, w_logits):
  """Invert the CDF defined by (t, softmax(w_logits)) at points u in [0,1)."""
  w = jax.nn.softmax(w_logits, axis=-1)
  cw = integrate_weights(w)
  return smath.sorted_interp(u, cw, t)


def sample(key, t, w_logits, num_samples: int, single_jitter: bool = False,
           deterministic_center: bool = False):
  """Piecewise-constant PDF point sampling; key=None => deterministic."""
  eps = jnp.finfo(t.dtype).eps
  if key is None:
    if deterministic_center:
      pad = 1 / (2 * num_samples)
      u = jnp.linspace(pad, 1.0 - pad - eps, num_samples)
    else:
      u = jnp.linspace(0, 1.0 - eps, num_samples)
    u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
  else:
    u_max = eps + (1 - eps) / num_samples
    max_jitter = (1 - u_max) / (num_samples - 1) - eps
    d = 1 if single_jitter else num_samples
    u = (jnp.linspace(0, 1 - u_max, num_samples) +
         jax.random.uniform(key, t.shape[:-1] + (d,)) * max_jitter)
  return invert_cdf(u, t, w_logits)


def sample_intervals(key, t, w_logits, num_samples: int,
                     single_jitter: bool = False,
                     domain=(-jnp.inf, jnp.inf)):
  """Sample interval endpoints spanning midpoints of sampled centers."""
  if num_samples <= 1:
    raise ValueError(f"num_samples must be > 1, is {num_samples}.")
  centers = sample(key, t, w_logits, num_samples, single_jitter,
                   deterministic_center=True)
  mid = (centers[..., 1:] + centers[..., :-1]) / 2
  minval, maxval = domain
  first = jnp.maximum(minval, 2 * centers[..., :1] - mid[..., :1])
  last = jnp.minimum(maxval, 2 * centers[..., -1:] - mid[..., -1:])
  return jnp.concatenate([first, mid, last], axis=-1)


def lossfun_distortion(t, w):
  """mip-360 distortion loss: iint w_i w_j |t_i - t_j|."""
  ut = (t[..., 1:] + t[..., :-1]) / 2
  dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
  loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
  loss_intra = jnp.sum(w ** 2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
  return loss_inter + loss_intra


def weighted_percentile(t, w, ps):
  """Weighted percentiles of a step function (w sums to 1). ps in percent."""
  cw = integrate_weights(w)
  q = jnp.asarray(ps, dtype=t.dtype) / 100
  q = jnp.broadcast_to(q, cw.shape[:-1] + (len(ps),))
  return smath.sorted_interp(q, cw, t)


def resample(t, tp, vp, use_avg: bool = False):
  """Resample step function (tp, vp) onto intervals t (sum or width-avg)."""
  eps = jnp.finfo(t.dtype).eps
  if use_avg:
    wp = jnp.diff(tp, axis=-1)
    v_numer = resample(t, tp, vp * wp, use_avg=False)
    v_denom = resample(t, tp, wp, use_avg=False)
    return v_numer / jnp.maximum(eps, v_denom)
  acc = jnp.cumsum(vp, axis=-1)
  acc0 = jnp.concatenate([jnp.zeros(acc.shape[:-1] + (1,), acc.dtype), acc],
                         axis=-1)
  acc0_resampled = smath.sorted_interp(t, tp, acc0)
  return jnp.diff(acc0_resampled, axis=-1)


def blur_stepfun(x, y, r):
  """Convolve a step function (x, y) with a box filter of radius r.

  Returns the blurred piecewise-linear function sampled at the union of
  shifted knots (zip-nerf's anti-aliased interlevel loss building block).
  """
  xr = jnp.sort(jnp.concatenate([x - r, x + r], axis=-1), axis=-1)
  xr_idx = jnp.argsort(jnp.concatenate([x - r, x + r], axis=-1), axis=-1)
  y1 = (jnp.concatenate([y, jnp.zeros_like(y[..., :1])], axis=-1) -
        jnp.concatenate([jnp.zeros_like(y[..., :1]), y], axis=-1)) / (2 * r)
  y2 = jnp.take_along_axis(
      jnp.concatenate([y1, -y1], axis=-1), xr_idx[..., :-1], axis=-1)
  yr = jnp.maximum(
      0, jnp.cumsum((xr[..., 1:] - xr[..., :-1]) * jnp.cumsum(y2, axis=-1),
                    axis=-1))
  yr = jnp.concatenate([jnp.zeros_like(yr[..., :1]), yr], axis=-1)
  return xr, yr
