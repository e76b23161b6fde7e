"""Coordinate warps: unbounded-scene contractions and metric<->normalized maps.

Behavioral parity targets (formulas re-derived for JAX):
  S-NeRF warped sampling: reference s-nerf/model/mip.py:7-9,268-405
    (Transform/Transform_log/Transform_linear s->t maps, fn1/fn2 scene
    warps with analytic Jacobian covariance propagation).
  zip-nerf contraction: reference s-nerfpp/zipnerf/internal/coord.py:8-162
    (contract/inv_contract, contract_mean_std, construct_ray_warps incl.
    power_transformation, lift_and_diagonalize).

TPU notes: we use jax.jacfwd-based linearization (`track_gaussian`) instead
of the reference's hand-unrolled Jacobian tensors — XLA fuses the per-point
3x3 Jacobian into the surrounding elementwise graph, and the code stays
shape-static and vmap-clean.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops import math as smath

# ---------------------------------------------------------------------------
# s <-> t transforms (S-NeRF generation; mip.py:7-9,398-405)
# ---------------------------------------------------------------------------


def s_to_t_disparity(s, near, far):
  """Disparity spacing: t = 1 / ((1-s)/near + s/far)."""
  return 1.0 / ((1 - s) / near + s / far)


def s_to_t_log(s, near, far):
  """Log spacing: t = near * exp(s * log(far/near))."""
  return near * jnp.exp(s * jnp.log(far / near))


def s_to_t_linear(s, near, far):
  return near * (1 - s) + far * s


S_TO_T = {
    "log": s_to_t_log,        # transform_idx=0 in the reference
    "disparity": s_to_t_disparity,  # transform_idx=1
    "linear": s_to_t_linear,  # transform_idx=2
}


def s_to_t(s, near, far, kind: str = "log"):
  return S_TO_T[kind](s, near, far)


# ---------------------------------------------------------------------------
# S-NeRF unbounded scene warps (mip.py:323-395)
# ---------------------------------------------------------------------------


def warp_fn1(x, viewc, far):
  """fn1: translate by view center, scale by sqrt(||x-viewc|| * far)."""
  xc = x - viewc
  norm = jnp.linalg.norm(xc, axis=-1, keepdims=True)
  return xc / smath.safe_sqrt(norm * far)


def warp_fn2(x, radius: float = 3.0):
  """fn2: mip-360-style contraction with inner ball of `radius`.

  ||x|| <= radius: x / radius (inside maps to unit ball);
  ||x|| >  radius: (2 - radius/||x||) * x/||x||  (outside maps to shell 1..2).
  """
  l = jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8
  outer = (2.0 - radius / l) * x / l
  inner = x / radius
  return jnp.where(l > radius, outer, inner)


def track_gaussian(fn: Callable, means, covs_diag):
  """Propagate per-sample Gaussians (mean, diag cov) through a warp fn.

  Linearizes fn at each mean: cov' = J diag(cov) J^T. Returns full
  [..., 3, 3] covariances (feeds integrated_pos_enc(diag=False)).
  Replaces the reference's hand-written Jacobi_f/Jacobi_g tensors
  (mip.py:323-364) with jacfwd — identical math, compiler-fused.
  """
  flat_means = means.reshape(-1, means.shape[-1])
  flat_covs = covs_diag.reshape(-1, covs_diag.shape[-1])
  f_means_flat = fn(flat_means)
  jac = jax.vmap(jax.jacfwd(lambda p: fn(p[None])[0]))(flat_means)
  # J diag(c) J^T = sum_i c_i * J[:, i] J[:, i]^T
  f_covs_flat = jnp.einsum("nij,nj,nkj->nik", jac, flat_covs, jac,
                           precision=jax.lax.Precision.HIGHEST)
  f_means = f_means_flat.reshape(*means.shape)
  f_covs = f_covs_flat.reshape(*covs_diag.shape[:-1], means.shape[-1],
                               means.shape[-1])
  return f_means, f_covs


def warp_fn2_gaussian(means, covs_diag, radius: float = 3.0):
  """Closed-form Gaussian propagation through warp_fn2.

  For f(x) = g(r) x with r = |x|: inside the ball g = 1/radius (J =
  I/radius); outside g(r) = 2/r - radius/r^2 and
  J = g I + (g'(r)/r) x x^T with g'(r) = -2/r^2 + 2 radius/r^3.
  Exact (same result as jacfwd-based track_gaussian) at ~1/3 the cost —
  this is on the per-step hot path of the shipped warp config.
  Returns (f_means [..., 3], f_covs [..., 3, 3]).
  """
  r2 = jnp.sum(means ** 2, axis=-1, keepdims=True)
  r = jnp.sqrt(jnp.maximum(r2, 1e-16)) + 1e-8  # matches warp_fn2's eps
  inside = r <= radius

  g = jnp.where(inside, 1.0 / radius, 2.0 / r - radius / (r * r))
  gp_over_r = jnp.where(
      inside, 0.0, (-2.0 / (r * r) + 2.0 * radius / (r ** 3)) / r)

  f_means = jnp.where(inside, means / radius, g * means)
  eye = jnp.eye(3, dtype=means.dtype)
  # J = g I + c x x^T  (c = g'/r);  cov' = J diag(d) J^T
  # = g^2 diag(d) + g c (x (x*d)^T + (x*d) x^T) + c^2 (x^T diag(d) x) x x^T
  xd = means * covs_diag
  c = gp_over_r
  outer_x_xd = means[..., :, None] * xd[..., None, :]
  term1 = (g ** 2)[..., None] * covs_diag[..., None] * eye
  term2 = (g * c)[..., None] * (outer_x_xd +
                                jnp.swapaxes(outer_x_xd, -1, -2))
  xtdx = jnp.sum(means * xd, axis=-1, keepdims=True)
  term3 = (c ** 2 * xtdx)[..., None] * (
      means[..., :, None] * means[..., None, :])
  f_covs = term1 + term2 + term3
  return f_means, f_covs


def warp_fn2_gaussian_diag(means, covs_diag, radius: float = 3.0):
  """Like warp_fn2_gaussian but returns only diag(J diag(d) J^T).

  The axis-aligned IPE (integrated_pos_enc with the 2^i I basis) uses
  ONLY the diagonal of the warped covariance, so the full 3x3 tensor is
  wasted work: diag_k = g^2 d_k + 2 g c x_k^2 d_k + c^2 x_k^2 (x.(d*x)).
  Returns (f_means [..., 3], f_var_diag [..., 3]).
  """
  r2 = jnp.sum(means ** 2, axis=-1, keepdims=True)
  r = jnp.sqrt(jnp.maximum(r2, 1e-16)) + 1e-8
  inside = r <= radius
  g = jnp.where(inside, 1.0 / radius, 2.0 / r - radius / (r * r))
  c = jnp.where(inside, 0.0,
                (-2.0 / (r * r) + 2.0 * radius / (r ** 3)) / r)
  f_means = g * means
  x2 = means ** 2
  xtdx = jnp.sum(covs_diag * x2, axis=-1, keepdims=True)
  diag = (g ** 2) * covs_diag + 2.0 * g * c * x2 * covs_diag \
      + (c ** 2) * x2 * xtdx
  return f_means, diag


# ---------------------------------------------------------------------------
# zip-nerf contraction (coord.py:8-100)
# ---------------------------------------------------------------------------


def contract(x):
  """mip-360 Eq.10 contraction towards the origin (unit inner ball)."""
  eps = jnp.finfo(x.dtype).eps
  x_mag_sq = jnp.maximum(eps, jnp.sum(x ** 2, axis=-1, keepdims=True))
  scale = (2 * jnp.sqrt(x_mag_sq) - 1) / x_mag_sq
  return jnp.where(x_mag_sq <= 1, x, scale * x)


def inv_contract(z):
  eps = jnp.finfo(z.dtype).eps
  z_mag_sq = jnp.maximum(eps, jnp.sum(z ** 2, axis=-1, keepdims=True))
  return jnp.where(z_mag_sq <= 1, z, z / (2 * jnp.sqrt(z_mag_sq) - z_mag_sq))


def contract_mean_std(x, std):
  """Contract isotropic Gaussians: scale std by det(J)^(1/3).

  Closed-form determinant of the contraction Jacobian
  (parity: zipnerf coord.py:52-63).
  """
  eps = jnp.finfo(x.dtype).eps
  x_mag_sq = jnp.maximum(eps, jnp.sum(x ** 2, axis=-1, keepdims=True))
  x_mag = jnp.sqrt(x_mag_sq)
  mask = x_mag_sq <= 1
  z = jnp.where(mask, x, ((2 * x_mag - 1) / x_mag_sq) * x)
  det = ((1 / x_mag_sq) * (2 / x_mag - 1 / x_mag_sq) ** 2)[..., 0]
  new_std = jnp.where(mask[..., 0], std, det ** (1 / x.shape[-1]) * std)
  return z, new_std


# ---------------------------------------------------------------------------
# metric <-> normalized ray-distance warps (zipnerf coord.py:103-162)
# ---------------------------------------------------------------------------


def power_transformation(x, lam: float):
  """zip-nerf Eq.4 power transformation."""
  lam_1 = abs(lam - 1)
  return lam_1 / lam * ((x / lam_1 + 1) ** lam - 1)


def inv_power_transformation(x, lam: float):
  lam_1 = abs(lam - 1)
  eps = jnp.finfo(jnp.float32).eps
  return ((x * lam / lam_1 + 1 + eps) ** (1 / lam) - 1) * lam_1


def construct_ray_warps(fn, t_near, t_far, lam: float | None = None):
  """Build (t_to_s, s_to_t) bijections between metric and [0,1] distances.

  fn in {None, 'piecewise', 'power_transformation', 'reciprocal', 'log',
  'exp', 'sqrt', 'square'}.
  """
  if fn is None:
    fn_fwd, fn_inv = (lambda x: x), (lambda x: x)
  elif fn == "piecewise":
    fn_fwd = lambda x: jnp.where(x < 1, 0.5 * x, 1 - 0.5 / x)
    fn_inv = lambda x: jnp.where(x < 0.5, 2 * x, 0.5 / (1 - x))
  elif fn == "power_transformation":
    fn_fwd = lambda x: power_transformation(x * 2, lam=lam)
    fn_inv = lambda y: inv_power_transformation(y, lam=lam) / 2
  elif fn == "reciprocal":
    fn_fwd, fn_inv = jnp.reciprocal, jnp.reciprocal
  elif fn == "log":
    fn_fwd, fn_inv = jnp.log, jnp.exp
  elif fn == "exp":
    fn_fwd, fn_inv = jnp.exp, jnp.log
  elif fn == "sqrt":
    fn_fwd, fn_inv = jnp.sqrt, jnp.square
  elif fn == "square":
    fn_fwd, fn_inv = jnp.square, jnp.sqrt
  else:
    raise ValueError(f"unknown ray warp {fn!r}")

  s_near, s_far = fn_fwd(t_near), fn_fwd(t_far)
  t_to_s = lambda t: (fn_fwd(t) - s_near) / (s_far - s_near)
  s_to_t_ = lambda s: fn_inv(s * s_far + (1 - s) * s_near)
  return t_to_s, s_to_t_


def lift_and_diagonalize(mean, cov, basis):
  """Project (mean, full cov) onto `basis` and keep the diagonal."""
  fn_mean = smath.matmul(mean, basis)
  fn_cov_diag = jnp.sum(basis * smath.matmul(cov, basis), axis=-2)
  return fn_mean, fn_cov_diag
