"""RefNeRF directional machinery: reflections, integrated directional
encoding (IDE) over spherical harmonics.

Behavioral parity target (formulas re-derived from the RefNeRF paper,
arXiv:2112.03907 eq. 6-8): reference s-nerfpp/zipnerf/internal/
ref_utils.py:1-163. TPU-first: the complex Vandermonde (x+iy)^m is
evaluated with a real multiply-add recurrence instead of complex dtype
(XLA TPU decomposes complex ops anyway; the recurrence keeps everything
in plain f32 vectors).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def reflect(viewdirs, normals):
  """Reflect v about unit n: u = 2 (n.v) n - v (ref_utils.py:6-21)."""
  return (2.0 * jnp.sum(normals * viewdirs, axis=-1, keepdims=True) *
          normals - viewdirs)


def l2_normalize(x, eps: float = 1e-5):
  """Normalize along the last axis with a clamped norm."""
  return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def compute_weighted_mae(weights, normals, normals_gt):
  """Weighted mean angular error in degrees (ref_utils.py:28-35)."""
  eps = 1e-3
  dots = jnp.clip(jnp.sum(normals * normals_gt, axis=-1),
                  -1.0 + eps, 1.0 - eps)
  return (jnp.sum(weights * jnp.arccos(dots)) / jnp.sum(weights) *
          180.0 / jnp.pi)


def _generalized_binomial(a: float, k: int) -> float:
  out = 1.0
  for i in range(k):
    out *= (a - i)
  return out / math.factorial(k)


def _assoc_legendre_coeff(l: int, m: int, k: int) -> float:
  """Coefficient of cos^k sin^m in P_l^m(cos theta)."""
  return ((-1) ** m * 2 ** l * math.factorial(l) / math.factorial(k) /
          math.factorial(l - k - m) *
          _generalized_binomial(0.5 * (l + k + m - 1.0), l))


def _sph_harm_coeff(l: int, m: int, k: int) -> float:
  return (math.sqrt((2.0 * l + 1.0) * math.factorial(l - m) /
                    (4.0 * math.pi * math.factorial(l + m))) *
          _assoc_legendre_coeff(l, m, k))


def get_ml_array(deg_view: int) -> np.ndarray:
  """[(m, l)] pairs for l = 1, 2, 4, ..., 2^(deg-1), m in [0, l]."""
  ml = []
  for i in range(deg_view):
    l = 2 ** i
    for m in range(l + 1):
      ml.append((m, l))
  return np.array(ml).T  # [2, n]


def generate_ide_fn(deg_view: int):
  """Integrated directional encoding fn(xyz, kappa_inv) -> [..., 2n].

  kappa_inv is the reciprocal von Mises-Fisher concentration (roughness);
  output = [real parts | imaginary parts] of the attenuated harmonics.
  """
  if deg_view > 5:
    raise ValueError("deg_view > 5 is numerically unstable")
  ml = get_ml_array(deg_view)
  l_max = 2 ** (deg_view - 1)
  # z-Vandermonde coefficient matrix: column i holds the cos^k
  # coefficients of (m_i, l_i)
  mat = np.zeros((l_max + 1, ml.shape[1]), np.float32)
  for i, (m, l) in enumerate(ml.T):
    for k in range(l - m + 1):
      mat[k, i] = _sph_harm_coeff(int(l), int(m), k)
  mat = jnp.asarray(mat)
  m_arr = np.asarray(ml[0], np.int32)
  sigma = jnp.asarray(0.5 * ml[1] * (ml[1] + 1), jnp.float32)
  max_m = int(m_arr.max())

  def ide_fn(xyz, kappa_inv):
    x = xyz[..., 0:1]
    y = xyz[..., 1:2]
    z = xyz[..., 2:3]
    vmz = jnp.concatenate([z ** i for i in range(l_max + 1)], axis=-1)
    # (x + i y)^m via the real recurrence
    re_pows = [jnp.ones_like(x)]
    im_pows = [jnp.zeros_like(x)]
    for _ in range(max_m):
      re, im = re_pows[-1], im_pows[-1]
      re_pows.append(re * x - im * y)
      im_pows.append(re * y + im * x)
    vm_re = jnp.concatenate([re_pows[m] for m in m_arr], axis=-1)
    vm_im = jnp.concatenate([im_pows[m] for m in m_arr], axis=-1)
    zpart = vmz @ mat
    atten = jnp.exp(-sigma * kappa_inv)
    return jnp.concatenate([vm_re * zpart * atten,
                            vm_im * zpart * atten], axis=-1)

  return ide_fn


def generate_dir_enc_fn(deg_view: int):
  """Plain directional encoding: IDE at zero roughness."""
  ide_fn = generate_ide_fn(deg_view)

  def dir_enc_fn(xyz):
    return ide_fn(xyz, jnp.zeros_like(xyz[..., :1]))

  return dir_enc_fn
