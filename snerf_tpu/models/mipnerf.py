"""S-NeRF mip model: coarse(proposal)/fine hierarchy, unbounded warps, heads.

Behavioral parity target (re-derived): reference s-nerf/model/models.py:10-197
(MipNerfModel.forward — per-level stratified/warped sampling, IPE, MLP,
density noise, rgb padding, softplus density bias, real volumetric rendering
with s->t transform). The reference loops levels in Python with dynamic
branches; here both levels are unrolled statically inside one jittable
function so XLA sees one fused graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from snerf_tpu.models.mlp import NerfMLP, ProposalMLP
from snerf_tpu.ops import coord, mip, render, sampling
from snerf_tpu.ops.rays import Rays


@dataclasses.dataclass(frozen=True)
class MipNerfConfig:
  """Static model hyperparameters (reference models.py:11-39 + arg_parser)."""
  num_samples: int = 128          # N_samples (coarse)
  num_fine: int = 128             # N_fine
  num_levels: int = 2
  resample_padding: float = 0.01
  stop_level_grad: bool = True
  use_viewdirs: bool = True
  lindisp: bool = False
  ray_shape: str = "cylinder"
  min_deg_point: int = 0
  max_deg_point: int = 16
  deg_view: int = 4
  density_noise: float = 1.0
  density_bias: float = -1.0
  rgb_padding: float = 0.001
  disable_integration: bool = False
  # Unbounded-scene warp: no_warp_sample=True means classic metric-t sampling.
  no_warp_sample: bool = True
  # reference `fn` flag semantics (mip.py:368-379 warp_fn): 0 selects fn1
  # (view-centered sqrt warp), any other value selects fn2 (mip-360
  # contraction) — the shipped configs use fn = 1, i.e. fn2.
  warp_fn: Optional[int] = 1
  warp_radius: float = 3.0
  t_transform: str = "log"        # transform_idx 0=log, 1=disparity, 2=linear
  hidden_layer: int = 256
  rgb_layer: int = 1
  proposal_hidden_layer: int = 256
  encode_appearance: bool = False
  appearance_dim: int = 48
  n_vocab: int = 100
  semantic: bool = False
  semantic_class_num: int = 0
  compute_dtype: Any = jnp.float32
  # IPE evaluation method: "exact" (reference formulation) or
  # "double_angle" (same features via the double-angle recursion — the
  # TPU-fast choice; see ops/mip.py integrated_pos_enc_fast).
  ipe_method: str = "exact"


class MipNerfModel(nn.Module):
  """Two-level mip-NeRF with a density-only proposal level."""
  config: MipNerfConfig

  def setup(self):
    c = self.config
    self.mlp = NerfMLP(
        net_width=c.hidden_layer,
        condition_depth=c.rgb_layer,
        num_semantic_channels=c.semantic_class_num if c.semantic else 0,
        compute_dtype=c.compute_dtype,
        name="mlp")
    self.proposal = ProposalMLP(
        net_width=c.proposal_hidden_layer, compute_dtype=c.compute_dtype,
        name="proposal")
    if c.encode_appearance:
      self.app_embedding = nn.Embed(c.n_vocab, c.appearance_dim, name="app")

  def _encode_samples(self, s_or_t_vals, rays: Rays, viewc):
    """Cast rays to Gaussians (optionally warped) and IPE-encode them."""
    c = self.config
    if c.no_warp_sample:
      means, covs = mip.cast_rays(
          s_or_t_vals, rays.origins, rays.directions, rays.radii,
          c.ray_shape, diag=True)
      if c.disable_integration:
        covs = jnp.zeros_like(covs)
      return mip.integrated_pos_enc(
          means, covs, c.min_deg_point, c.max_deg_point, diag=True,
          method=c.ipe_method)
    # Warped (unbounded) path: s in [0,1] -> metric t -> Gaussian -> warp with
    # Jacobian covariance propagation (reference mip.py:268-395 via sample2enc).
    t_vals = coord.s_to_t(s_or_t_vals, rays.near, rays.far, c.t_transform)
    means, covs = mip.cast_rays(
        t_vals, rays.origins, rays.directions, rays.radii, c.ray_shape,
        diag=True)
    if c.disable_integration:
      covs = jnp.zeros_like(covs)
    if c.warp_fn == 0:
      warp = lambda x: coord.warp_fn1(x, viewc, far=jnp.max(rays.far))
      f_means, f_covs = coord.track_gaussian(warp, means, covs)
      return mip.integrated_pos_enc(
          f_means, f_covs, c.min_deg_point, c.max_deg_point, diag=False)
    # closed-form diagonal fast path (exact for the axis-aligned IPE
    # basis; hot path of the shipped warp config)
    f_means, f_diag = coord.warp_fn2_gaussian_diag(
        means, covs, radius=c.warp_radius)
    return mip.integrated_pos_enc(
        f_means, f_diag, c.min_deg_point, c.max_deg_point, diag=True,
        method=c.ipe_method)

  def __call__(self, rays: Rays, rng: Optional[jax.Array] = None,
               white_bkgd: bool = False, viewc=None):
    """Render a ray batch. rng=None => deterministic (eval) mode.

    Returns a list of per-level dicts with keys
    rgb/distance/acc/semantic/s_vals/weights (coarse level: rgb=None).
    """
    c = self.config
    randomized = rng is not None
    keys = (jax.random.split(rng, 4) if randomized else [None] * 4)

    ret = []
    s_vals = None
    weights = None
    for i_level in range(c.num_levels):
      if i_level == 0:
        if c.no_warp_sample:
          # Classic path samples directly in metric t (reference
          # sample_along_rays mip.py:192-212).
          s_vals = sampling.stratified_sample(
              keys[0], rays.origins.shape[:-1], c.num_samples)
          if c.lindisp:
            t_vals = coord.s_to_t_disparity(s_vals, rays.near, rays.far)
          else:
            t_vals = coord.s_to_t_linear(s_vals, rays.near, rays.far)
          level_vals = t_vals
        else:
          s_vals = sampling.stratified_sample(
              keys[0], rays.origins.shape[:-1], c.num_samples)
          level_vals = s_vals
      else:
        # interval-count parity: the no-warp branch redraws n+1 points
        # (resample_along_rays, mip.py:215-238: t_vals.shape[-1] draws);
        # the warp branch draws exactly N_fine points, i.e. N_fine - 1
        # intervals (warp_resample_along_rays, mip.py:294-320).
        n_fine = (c.num_fine - 1 if not c.no_warp_sample
                  else c.num_samples)
        new_vals = sampling.resample_from_weights(
            keys[1], level_vals, weights, n_fine,
            resample_padding=c.resample_padding,
            stop_grad=c.stop_level_grad)
        level_vals = new_vals

      samples_enc = self._encode_samples(level_vals, rays, viewc)

      raw_semantic = None
      if i_level == 0:
        raw_rgb = None
        raw_density = self.proposal(samples_enc)
      else:
        condition = None
        if c.use_viewdirs:
          condition = mip.pos_enc(
              rays.viewdirs, min_deg=0, max_deg=c.deg_view,
              append_identity=True)
          if c.encode_appearance:
            app = self.app_embedding(
                rays.app[..., 0].astype(jnp.int32))
            condition = jnp.concatenate([condition, app], axis=-1)
        raw_rgb, raw_density, raw_semantic = self.mlp(samples_enc, condition)

      raw_density = raw_density[..., 0]
      if randomized and c.density_noise > 0:
        raw_density = raw_density + c.density_noise * jax.random.normal(
            jax.random.fold_in(keys[2], i_level), raw_density.shape,
            dtype=raw_density.dtype)

      rgb = None
      if raw_rgb is not None:
        rgb = nn.sigmoid(raw_rgb)
        rgb = rgb * (1 + 2 * c.rgb_padding) - c.rgb_padding
      density = nn.softplus(raw_density + c.density_bias)

      if c.no_warp_sample:
        # level_vals are already metric t: composite directly.
        t_vals = level_vals
        w, _, _ = render.compute_alpha_weights(
            density, t_vals, rays.directions)
        t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
        acc = w.sum(axis=-1)
        distance = jnp.clip(
            jnp.nan_to_num((w * t_mids).sum(axis=-1), posinf=jnp.inf),
            t_vals[..., 0], t_vals[..., -1])
        comp_rgb = None
        if rgb is not None:
          comp_rgb = (w[..., None] * rgb).sum(axis=-2)
          if white_bkgd:
            comp_rgb = comp_rgb + (1.0 - acc[..., None])
        comp_sem = (None if raw_semantic is None
                    else (w[..., None] * raw_semantic).sum(axis=-2))
        out = dict(rgb=comp_rgb, distance=distance, acc=acc, weights=w,
                   semantic=comp_sem)
      else:
        out = render.volumetric_rendering(
            rgb, density, level_vals, rays.directions, rays.near, rays.far,
            semantic=raw_semantic, white_bkgd=white_bkgd,
            t_transform=c.t_transform)
      weights = out["weights"]
      out["s_vals"] = level_vals
      ret.append(out)
    return ret


def make_mipnerf(config: MipNerfConfig):
  return MipNerfModel(config=config)


def init_model(key, config: MipNerfConfig, num_rays: int = 4):
  """Initialize params on a dummy ray bundle (static shapes)."""
  model = MipNerfModel(config=config)
  d = jnp.ones((num_rays, 3), jnp.float32)
  rays = Rays(
      origins=jnp.zeros((num_rays, 3)),
      directions=d,
      viewdirs=d / jnp.linalg.norm(d, axis=-1, keepdims=True),
      radii=jnp.full((num_rays, 1), 0.001),
      lossmult=jnp.ones((num_rays, 1)),
      near=jnp.full((num_rays, 1), 0.1),
      far=jnp.full((num_rays, 1), 10.0),
      app=jnp.zeros((num_rays, 1), jnp.int32))
  variables = model.init(key, rays, rng=None, white_bkgd=False,
                         viewc=jnp.zeros((3,)))
  return model, variables
