"""Mip-NeRF primitives: positional encodings and conical-frustum Gaussians.

Behavioral parity targets (formulas re-derived, JAX-first):
  reference s-nerf/model/mip.py:12-118 (pos_enc, expected_sin, lift_gaussian,
  conical_frustum_to_gaussian, cylinder_to_gaussian, cast_rays,
  integrated_pos_enc).

All functions are shape-polymorphic over leading batch dims and vmap-clean.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops import math as smath


def pos_enc(x, min_deg: int, max_deg: int, append_identity: bool = True):
  """Classic axis-aligned sinusoidal encoding: [..., d] -> [..., (+d) 2d(max-min)]."""
  scales = 2.0 ** np.arange(min_deg, max_deg, dtype=np.float32)
  xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
  four_feat = smath.safe_sin(
      jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
  if append_identity:
    return jnp.concatenate([x, four_feat], axis=-1)
  return four_feat


def expected_sin(x, x_var):
  """E[sin(z)] and Var[sin(z)] for z ~ N(x, x_var)."""
  y = jnp.exp(-0.5 * x_var) * smath.safe_sin(x)
  y_var = jnp.maximum(
      0.0, 0.5 * (1 - jnp.exp(-2 * x_var) * smath.safe_cos(2 * x)) - y ** 2)
  return y, y_var


def lift_gaussian(d, t_mean, t_var, r_var, diag: bool):
  """Lift a 1D Gaussian along ray d (+ isotropic radial var) into 3D."""
  mean = d[..., None, :] * t_mean[..., None]
  d_mag_sq = jnp.maximum(1e-10, jnp.sum(d ** 2, axis=-1, keepdims=True))
  if diag:
    d_outer_diag = d ** 2
    null_outer_diag = 1 - d_outer_diag / d_mag_sq
    t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
    return mean, t_cov_diag + xy_cov_diag
  d_outer = d[..., :, None] * d[..., None, :]
  eye = jnp.eye(d.shape[-1])
  null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
  t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
  xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
  return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag: bool,
                                stable: bool = True):
  """Gaussian moments of a conical frustum between t0..t1 (mip-NeRF eq. 7)."""
  if stable:
    mu = (t0 + t1) / 2
    hw = (t1 - t0) / 2
    denom = 3 * mu ** 2 + hw ** 2
    t_mean = mu + (2 * mu * hw ** 2) / denom
    t_var = hw ** 2 / 3 - (4 / 15) * (hw ** 4 * (12 * mu ** 2 - hw ** 2)) / denom ** 2
    r_var = base_radius ** 2 * (mu ** 2 / 4 + (5 / 12) * hw ** 2 -
                                (4 / 15) * hw ** 4 / denom)
  else:
    t_mean = (3 * (t1 ** 4 - t0 ** 4)) / (4 * (t1 ** 3 - t0 ** 3))
    r_var = base_radius ** 2 * (3 / 20 * (t1 ** 5 - t0 ** 5) / (t1 ** 3 - t0 ** 3))
    t_mosq = 3 / 5 * (t1 ** 5 - t0 ** 5) / (t1 ** 3 - t0 ** 3)
    t_var = t_mosq - t_mean ** 2
  return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag: bool):
  """Gaussian moments of a cylinder segment between t0..t1."""
  t_mean = (t0 + t1) / 2
  r_var = radius ** 2 / 4
  t_var = (t1 - t0) ** 2 / 12
  return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(t_vals, origins, directions, radii, ray_shape: str = "cone",
              diag: bool = True):
  """Cast rays through metric t intervals -> per-interval Gaussians.

  t_vals: [..., S+1]; returns means [..., S, 3], covs [..., S, 3] (diag) or
  [..., S, 3, 3].
  """
  t0, t1 = t_vals[..., :-1], t_vals[..., 1:]
  if ray_shape == "cone":
    gaussian_fn = conical_frustum_to_gaussian
  elif ray_shape == "cylinder":
    gaussian_fn = cylinder_to_gaussian
  else:
    raise ValueError(f"unknown ray_shape {ray_shape!r}")
  means, covs = gaussian_fn(directions, t0, t1, radii, diag)
  return means + origins[..., None, :], covs


def integrated_pos_enc_fast(mean, cov_diag, min_deg: int, max_deg: int):
  """Double-angle IPE: identical features to integrated_pos_enc(diag=True)
  computed with 6 transcendentals/sample instead of 2*3*L sins.

  sin/cos at degree j+1 come from degree j via sin(2y) = 2 sin y cos y,
  cos(2y) = 1 - 2 sin^2 y; the exp(-var/2) downweighting stays exact.
  Error grows ~2^j * eps_f32 at degree j (~1e-3 relative at deg 16), which
  is far below the exp(-var/2) attenuation noise floor in training; the
  hot train path uses this, parity tests pin the exact method.
  """
  y = mean * (2.0 ** min_deg)
  v = cov_diag * (4.0 ** min_deg)
  s = smath.safe_sin(y)
  c = smath.safe_cos(y)
  num_deg = max_deg - min_deg
  sins, coss, variances = [], [], []
  for j in range(num_deg):
    sins.append(s)
    coss.append(c)
    variances.append(v)
    if j < num_deg - 1:
      s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
      v = 4.0 * v
  # layout parity with the exact path: [deg0_xyz, deg1_xyz, ...]
  sin_stack = jnp.stack(sins, axis=-2).reshape(*mean.shape[:-1], -1)
  cos_stack = jnp.stack(coss, axis=-2).reshape(*mean.shape[:-1], -1)
  var_stack = jnp.stack(variances, axis=-2).reshape(*mean.shape[:-1], -1)
  w = jnp.exp(-0.5 * var_stack)
  return jnp.concatenate([w * sin_stack, w * cos_stack], axis=-1)


def integrated_pos_enc(mean, cov, min_deg: int, max_deg: int,
                       diag: bool = True, method: str = "exact"):
  """Integrated positional encoding of Gaussians (mean, cov).

  diag=True: cov is [..., 3] diagonal; else full [..., 3, 3].
  method="double_angle" (diag only) computes the same features via the
  double-angle recursion (see integrated_pos_enc_fast).
  Returns [..., 2*3*(max_deg-min_deg)] expected-sin features.
  """
  if method == "double_angle" and diag:
    return integrated_pos_enc_fast(mean, cov, min_deg, max_deg)
  scales = 2.0 ** np.arange(min_deg, max_deg, dtype=np.float32)
  if diag:
    y = (mean[..., None, :] * scales[:, None]).reshape(*mean.shape[:-1], -1)
    y_var = (cov[..., None, :] * scales[:, None] ** 2).reshape(
        *cov.shape[:-1], -1)
  else:
    num_dims = mean.shape[-1]
    # basis: [3, 3*L] block of 2^i * I
    basis = np.concatenate(
        [2.0 ** i * np.eye(num_dims, dtype=np.float32)
         for i in range(min_deg, max_deg)], axis=1)
    y = smath.matmul(mean, basis)
    y_var = jnp.sum((smath.matmul(cov, basis)) * basis, axis=-2)
  return expected_sin(
      jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
      jnp.concatenate([y_var] * 2, axis=-1))[0]
