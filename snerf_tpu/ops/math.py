"""Numerically-safe math helpers.

Behavioral parity targets (formulas only, re-derived for JAX):
  reference s-nerf/model/math_ops.py (safe trig, mse<->psnr),
  reference s-nerfpp/zipnerf/internal/math.py (lr decay, interp).
TPU note: trig on large inputs can NaN on TPU (the reference carries the
same guard), hence the modular range reduction here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def safe_trig_helper(x, fn, t: float = 100 * np.pi):
  """Range-reduce |x| >= t before the trig call so TPU trig stays finite."""
  return fn(jnp.where(jnp.abs(x) < t, x, x % t))


def safe_sin(x):
  return safe_trig_helper(x, jnp.sin)


def safe_cos(x):
  return safe_trig_helper(x, jnp.cos)


def safe_exp(x):
  """exp() clamped below the float32 overflow threshold (keeps grads finite)."""
  return jnp.exp(jnp.minimum(x, 88.0))


def safe_sqrt(x, eps: float = 1e-12):
  return jnp.sqrt(jnp.maximum(x, eps))


def mse_to_psnr(mse):
  return -10.0 / jnp.log(10.0) * jnp.log(mse)


def psnr_to_mse(psnr):
  return jnp.exp(-0.1 * jnp.log(10.0) * psnr)


def log_lerp(t, v0: float, v1: float):
  """Interpolate log-linearly from v0 (t=0) to v1 (t=1), clamped.

  Matches the lr-decay primitive used throughout the reference
  (s-nerf/utils/model_utils.py:9-20, zipnerf internal/math.py:53-86).
  """
  if v0 <= 0 or v1 <= 0:
    raise ValueError(f"Interpolants {v0} and {v1} must be positive.")
  lv0, lv1 = np.log(v0), np.log(v1)
  return jnp.exp(jnp.clip(t, 0.0, 1.0) * (lv1 - lv0) + lv0)


def learning_rate_decay(step,
                        lr_init: float,
                        lr_final: float,
                        max_steps: int,
                        lr_delay_steps: int = 0,
                        lr_delay_mult: float = 1.0):
  """Log-lerp decay with an optional warmup window (reference schedule)."""
  if lr_delay_steps > 0:
    delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
  else:
    delay_rate = 1.0
  return delay_rate * log_lerp(step / max_steps, lr_init, lr_final)


def matmul(a, b):
  """float32-accumulating matmul (MXU-friendly explicit precision)."""
  return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def clip_gradients(grads, max_val: float | None = None,
                   max_norm: float | None = None):
  """Value-clip + global-norm-clip with NaN/Inf scrub.

  Parity: the reference scrubs non-finite grads and clips
  (zipnerf internal/train_utils.py:234-243).
  """
  grads = jax.tree_util.tree_map(
      lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0), grads)
  if max_val is not None and max_val > 0:
    grads = jax.tree_util.tree_map(
        lambda g: jnp.clip(g, -max_val, max_val), grads)
  if max_norm is not None and max_norm > 0:
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g in jax.tree_util.tree_leaves(grads)))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
    grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
  return grads


# Above this bin count the O(n*m) dense mask-reduction gets too big and we
# fall back to binary search + gathers.
_DENSE_SEARCH_LIMIT = 640


def _searchsorted_batched(a, v):
  """Batched right-searchsorted over the last axis: a [..., n], v [..., m]."""
  return jax.vmap(lambda ai, vi: jnp.searchsorted(ai, vi, side="right"))(
      a.reshape(-1, a.shape[-1]), v.reshape(-1, v.shape[-1])).reshape(
          v.shape)


def searchsorted(a, v):
  """Indices (idx_lo, idx_hi) bracketing each v in sorted a (per batch row).

  TPU note: for the bin counts NeRF uses (<= a few hundred) the dense
  O(n*m) mask-sum is pure VPU work and beats the binary-search gather
  lowering by ~10x (measured 77ms -> dense on a v5e at 4096x129).
  This is the reference's own mask-reduction trick (math_ops.py:62-72).
  """
  if a.shape[-1] * v.shape[-1] <= _DENSE_SEARCH_LIMIT ** 2:
    # number of a-entries <= each v  ==  right-searchsorted index
    idx = jnp.sum((a[..., :, None] <= v[..., None, :]).astype(jnp.int32),
                  axis=-2)
  else:
    idx = _searchsorted_batched(a, v)
  idx_hi = jnp.clip(idx, 0, a.shape[-1] - 1)
  idx_lo = jnp.clip(idx - 1, 0, a.shape[-1] - 1)
  return idx_lo, idx_hi


def _gather_last(x, idx):
  """take_along_axis on the last axis via dense one-hot when small.

  matmul/where-max form keeps it on the VPU instead of a gather op.
  """
  n = x.shape[-1]
  if n * idx.shape[-1] <= _DENSE_SEARCH_LIMIT ** 2:
    onehot = (idx[..., None, :] ==
              jnp.arange(n, dtype=idx.dtype)[:, None]).astype(x.dtype)
    return jnp.einsum("...nm,...n->...m", onehot, x)
  return jnp.take_along_axis(x, idx, axis=-1)


def interp(x, xp, fp):
  """Batched linear interpolation: jnp.interp over the last axis.

  TPU path: dense mask-sum searchsorted + one-hot-einsum gathers — no
  hardware gather ops at NeRF bin counts (math_ops.py:62-72 spirit).
  """
  idx_lo, idx_hi = searchsorted(xp, x)
  if xp.shape[-1] * x.shape[-1] <= _DENSE_SEARCH_LIMIT ** 2:
    gather = _gather_last
  else:
    gather = lambda a, i: jnp.take_along_axis(a, i, axis=-1)
  xp_b = jnp.broadcast_to(xp, x.shape[:-1] + xp.shape[-1:])
  fp_b = jnp.broadcast_to(fp, x.shape[:-1] + fp.shape[-1:])
  xp_lo = gather(xp_b, idx_lo)
  xp_hi = gather(xp_b, idx_hi)
  fp_lo = gather(fp_b, idx_lo)
  fp_hi = gather(fp_b, idx_hi)
  t = jnp.clip(jnp.nan_to_num((x - xp_lo) / (xp_hi - xp_lo), nan=0.0), 0, 1)
  return fp_lo + t * (fp_hi - fp_lo)


def sorted_interp(x, xp, fp):
  return interp(x, xp, fp)


def bracket(cdf, u, arrays):
  """For each u, bracketing (lo, hi) values of several MONOTONE arrays
  aligned with sorted cdf — one dense mask, zero gathers (the
  reference's math_ops.py:62-72 mask-reduction, vectorized).

  cdf: [..., n] sorted; u: [..., m]; arrays: sequence of [..., n]
  non-decreasing arrays. Returns [(lo [..., m], hi [..., m]), ...].
  u must satisfy cdf[..., 0] <= u < cdf[..., -1].
  """
  mask = cdf[..., :, None] <= u[..., None, :]
  big = jnp.finfo(u.dtype).max
  outs = []
  for arr in arrays:
    arr_b = jnp.broadcast_to(arr, u.shape[:-1] + arr.shape[-1:])
    lo = jnp.max(jnp.where(mask, arr_b[..., :, None], -big), axis=-2)
    hi = jnp.min(jnp.where(mask, big, arr_b[..., :, None]), axis=-2)
    outs.append((lo, hi))
  return outs
