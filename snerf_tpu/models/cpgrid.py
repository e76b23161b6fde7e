"""Integrated multiresolution CP-factor grid encoder (TPU-native).

Capability target: the reference's instant-NGP hash grid
(s-nerfpp/zipnerf/gridencoder/src/gridencoder.cu:50-160 and its MLP
integration internal/models.py:484-518) — a learned spatial feature
field queried once per ray sample. On v5e both primitives that design
needs are serial-unit-bound (row gather 169 M idx/s, scatter-add
5-24 M idx/s; PERF.md primitive survey), so this encoder re-derives
the capability out of dense MXU/VPU work only:

  per level l, per axis a in {x, y, z}: a factor table V_a^l in
  R^{R_l x F}, and

      feature_l(gaussian) = prod_a ( w_a @ V_a^l )        (CP rank-F)

where w_a in R^{R_l} is the EXACT expectation of a Gaussian-RBF
interpolation basis under the ray sample's Gaussian. The feature field
is defined as a sum of RBF bumps of width sigma_b at the grid nodes,
so for a sample N(u, s^2) the expected basis weight is the same bump
profile evaluated with width sqrt(sigma_b^2 + s^2):

      E[b_i(x)] ∝ exp(-(u - i)^2 / (2 (sigma_b^2 + s^2)))

normalized over i. Because the field is axis-separable (CP) and the
sample covariance diagonal, E[prod_a f_a] = prod_a E[f_a] holds exactly
— the anti-aliasing integral that the reference approximates with n=7
hexagonal multisamples + erf downweighting (models.py:500-502) is
analytic here, per axis. For the zip multisample interface we average
the n per-multisample profiles, i.e. take the exact expectation under
the n-component Gaussian mixture.

Both forward and backward are [N, R] x [R, F] matmuls (the backward
w.r.t. V is the transposed matmul over the same dense profile; the
backward w.r.t. positions flows through the profile's exp, all VPU):
no gather, no scatter anywhere.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def level_resolutions(num_levels: int, base_resolution: int,
                      max_resolution: int) -> Sequence[int]:
  """Geometric resolution ladder (gridencoder grid.py:122-144 analog)."""
  if num_levels <= 1:
    return [int(max_resolution)]
  g = (max_resolution / base_resolution) ** (1.0 / (num_levels - 1))
  return [int(round(base_resolution * g ** l)) for l in range(num_levels)]


def cosine_window(alpha: jnp.ndarray, num: int) -> jnp.ndarray:
  """BARF-style coarse-to-fine window over `num` bands.

  alpha in [0, num]; band j gets 0.5 (1 - cos(pi clamp(alpha - j, 0, 1))).
  """
  j = jnp.arange(num, dtype=jnp.float32)
  x = jnp.clip(alpha - j, 0.0, 1.0)
  return 0.5 * (1.0 - jnp.cos(jnp.pi * x))


class CPEncoding(nn.Module):
  """Multiresolution integrated CP encoding.

  Inputs are positions in [0, 1]^3 with isotropic stds in the same
  units, both carrying a trailing multisample axis n:
    x01 [..., n, 3], std01 [..., n]  ->  features [..., L * F].
  """
  num_levels: int = 4
  level_dim: int = 16
  base_resolution: int = 128
  max_resolution: int = 1024
  bump_width: float = 0.75       # RBF sigma, in units of grid spacing
  init_scale: float = 0.1
  # Low-pass the init noise along the resolution axis with a Gaussian
  # of this sigma (grid cells); 0 = white noise (default). Tested as a
  # fix for the ~1.2 dB cross-seed droop of short-schedule CP runs and
  # REFUTED (PERF.md run-20: sm4 scores within noise of white init on
  # both droopy seeds); the droop is cured by schedule length instead
  # (run-19). Kept as an init-shaping knob.
  init_smooth: float = 0.0
  # pair_dim > 0 adds rank-`pair_dim` PAIR products per level — each
  # (a, b) axis pair contributes (w_a @ P_a) * (w_b @ P_b), i.e. a
  # CP-decomposed tri-plane (TensoRF-VM's planes at rank pair_dim):
  # capacity for axis-extruded structure the pure triple product
  # represents inefficiently.
  pair_dim: int = 0
  # factor_bound > 0 reparameterizes the tables as
  #   v = 1 + b * tanh(v_raw / b),   v_raw ~ init_scale * N(0, 1)
  # (identity near init, saturating at 1 +- b): every per-axis term
  # w @ v stays in [1-b, 1+b] so the 3-way product is bounded by
  # (1+b)^3 — a structural cap on the multiplicative-runaway failure
  # mode of raw CP products (F>=64 stability investigation, PERF.md).
  factor_bound: float = 0.0
  # Output transform: feat -> feature_scale * (feat - 1 if
  # feature_center else feat). Every CP product has expectation ~1 at
  # init (tables init around 1), so centered features are zero-mean
  # O(init_scale) noise; with a small feature_scale the trunk sees
  # near-ZERO features at init — the instant-NGP init regime (tables
  # U(-1e-4, 1e-4)) where the trunk cannot build spatially-varying
  # density before the tables learn structure. Round-5 scene-b
  # stability knobs (the wide-FoV constant-color collapse is driven by
  # the trunk exploiting the O(init_scale) spatial feature noise;
  # PERF.md round-5). Gradients into the tables are unchanged by
  # centering and scaled by feature_scale.
  feature_center: bool = False
  feature_scale: float = 1.0
  compute_dtype: Any = jnp.float32

  def setup(self):
    self.resolutions = level_resolutions(
        self.num_levels, self.base_resolution, self.max_resolution)
    # Factors initialized around 1 so the 3-way product is ~1 + sum of
    # perturbations at init (healthy gradients; the product develops
    # genuinely multiplicative localized structure as training departs
    # from 1). A zero-mean init would make prod of 3 factors ~ s^3 with
    # vanishing gradients into each factor.
    def init_fn(key, shape, dtype=jnp.float32):
      # bounded parameterization stores the ZERO-MEAN raw table (the
      # `1 +` lives in _bounded below); raw init = init_scale * noise.
      bounded = self.factor_bound > 0
      noise = jax.random.normal(key, shape, dtype)
      if self.init_smooth > 0:
        # depthwise 1-D Gaussian blur along the resolution axis
        # (shape [3, R, F]), std renormalized to keep init_scale
        rad = max(1, int(round(3 * self.init_smooth)))
        t = jnp.arange(-rad, rad + 1, dtype=dtype)
        k = jnp.exp(-0.5 * (t / self.init_smooth) ** 2)
        k = k / k.sum()
        sm = jax.vmap(  # over the leading axis-triplet
            lambda n: jax.vmap(  # over feature channels
                lambda col: jnp.convolve(col, k, mode="same"),
                in_axes=1, out_axes=1)(n))(noise)
        noise = sm / (jnp.std(sm) + 1e-12)
      if bounded:
        return self.init_scale * noise
      return 1.0 + self.init_scale * noise
    self.factors = [
        self.param(f"v{l}", init_fn, (3, r, self.level_dim), jnp.float32)
        for l, r in enumerate(self.resolutions)]
    if self.pair_dim > 0:
      self.pair_factors = [
          self.param(f"p{l}", init_fn, (3, r, self.pair_dim),
                     jnp.float32)
          for l, r in enumerate(self.resolutions)]

  def _bounded(self, v):
    """Map a raw table to the bounded factor table (identity if off)."""
    b = self.factor_bound
    if b <= 0:
      return v
    return 1.0 + b * jnp.tanh(v / b)

  def _level_encode(self, v, p, u, var, r: int, n: int):
    """One level's integrated-CP features; rematerialized in backward
    (the [..., R] profile matrices would otherwise be saved for grad —
    ~GBs per level at training batch sizes).

    var is per-axis: [..., n, 3] in grid^2 units. p is the optional
    pair-factor table [3, R, pair_dim] (None when pair_dim == 0)."""
    dt = self.compute_dtype
    iota = jnp.arange(r, dtype=jnp.float32)
    # Exact mixture expectation: per-component axis independence gives
    # E_k[prod_a f_a], averaged over the n components. (Averaging the
    # profiles BEFORE the product would instead compute the product of
    # mixture marginals — wrong across components at different
    # locations.) Static python loop over n keeps the transient at
    # [..., R] instead of [..., n, R].
    acc = 0.0
    for k in range(n):
      f = 1.0
      pf = []
      for a in range(3):
        d = u[..., k, a][..., None] - iota          # [..., R]
        w = jnp.exp(-0.5 * d * d / var[..., k, a][..., None])
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-12)
        wd = w.astype(dt)
        # default matmul precision: Precision.HIGHEST was measured to
        # cost 17% step time without changing the F=64 stall (PERF.md
        # round-3 divergence investigation)
        f = f * (wd @ self._bounded(v[a]).astype(dt))   # [..., F]
        if p is not None:
          pf.append(wd @ self._bounded(p[a]).astype(dt))  # [..., F2]
      if p is not None:
        f = jnp.concatenate(
            [f, pf[0] * pf[1], pf[1] * pf[2], pf[0] * pf[2]], axis=-1)
      acc = acc + f
    return acc / n

  def __call__(self, x01, std01, level_window: Optional[jnp.ndarray] = None,
               collapse: bool = False):
    """x01 [..., n, 3], std01 [..., n] (isotropic) or [..., n, 3].

    collapse=True moment-matches the n multisamples into ONE per-axis
    Gaussian (mean of means; variance = mean within-sample variance +
    spread of the means) before encoding — the same cone integral the
    multisamples approximate, at 1/n the profile-construction cost.
    """
    if std01.ndim == x01.ndim - 1:
      std01 = jnp.broadcast_to(std01[..., None], x01.shape)
    if collapse and x01.shape[-2] > 1:
      m1 = x01.mean(axis=-2, keepdims=True)                 # [..., 1, 3]
      spread = ((x01 - m1) ** 2).mean(axis=-2, keepdims=True)
      var = (std01 ** 2).mean(axis=-2, keepdims=True) + spread
      x01 = m1
      std01 = jnp.sqrt(var)
    n = x01.shape[-2]
    outs = []
    for l, r in enumerate(self.resolutions):
      v = self.factors[l]                    # [3, R, F]
      p = self.pair_factors[l] if self.pair_dim > 0 else None
      u = x01 * (r - 1.0)                    # [..., n, 3] grid coords
      sig = std01 * (r - 1.0)                # [..., n, 3] grid units
      var = sig * sig + self.bump_width ** 2
      if p is None:
        enc = jax.checkpoint(
            lambda v_, u_, var_, r_=r: self._level_encode(
                v_, None, u_, var_, r_, n))
        feat = enc(v, u, var)
      else:
        enc = jax.checkpoint(
            lambda v_, p_, u_, var_, r_=r: self._level_encode(
                v_, p_, u_, var_, r_, n))
        feat = enc(v, p, u, var)
      if self.feature_center:
        feat = feat - 1.0
      if self.feature_scale != 1.0:
        feat = feat * self.feature_scale
      if level_window is not None:
        feat = feat * level_window[l].astype(self.compute_dtype)
      outs.append(feat)
    return jnp.concatenate(outs, axis=-1)
