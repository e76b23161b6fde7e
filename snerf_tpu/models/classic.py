"""Classic-NeRF legacy path (the llff route of the reference).

Behavioral parity targets (re-derived):
  reference s-nerf/model/run_nerf_helpers.py:74-126 (NeRF: 8x256 MLP,
  skip cat at layer 4 input, viewdir branch width/2, alpha head),
  :157-241 (NeRF_RGB: frozen-alpha variant), :336-379 (sample_pdf),
  :381-424 (raw2outputs: relu density, dists with 1e10 tail, cumprod
  transmittance with 1e-10 guard), :314-332 (ndc_rays),
  s-nerf/model/render.py:281-409 (render_rays: stratified + perturb,
  hierarchical fine pass over sorted coarse+fine z).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from snerf_tpu.ops import mip, sampling


@dataclasses.dataclass(frozen=True)
class ClassicNerfConfig:
  net_depth: int = 8
  net_width: int = 256
  skip_layer: int = 4
  multires: int = 10           # pos-enc degrees for xyz (i_embed=0)
  multires_views: int = 4      # pos-enc degrees for viewdirs
  n_samples: int = 64
  n_importance: int = 64
  use_viewdirs: bool = True
  raw_noise_std: float = 0.0
  white_bkgd: bool = False
  lindisp: bool = False
  perturb: bool = True


class ClassicNerfMLP(nn.Module):
  """The original NeRF MLP (run_nerf_helpers.py:74-126)."""
  cfg: ClassicNerfConfig

  @nn.compact
  def __call__(self, pts_enc, viewdirs_enc: Optional[jnp.ndarray] = None):
    c = self.cfg
    h = pts_enc
    inputs = pts_enc
    for i in range(c.net_depth):
      h = nn.relu(nn.Dense(c.net_width, name=f"pts_{i}")(h))
      # reference concatenates input at layers listed in `skips` = [4]:
      # the skip is applied to the INPUT of layer 5 (i in skips after i).
      if i == c.skip_layer:
        h = jnp.concatenate([inputs, h], axis=-1)
    if c.use_viewdirs and viewdirs_enc is not None:
      alpha = nn.Dense(1, name="alpha")(h)
      feature = nn.Dense(c.net_width, name="feature")(h)
      v = jnp.broadcast_to(viewdirs_enc[..., None, :],
                           feature.shape[:-1] + viewdirs_enc.shape[-1:])
      h2 = jnp.concatenate([feature, v], axis=-1)
      h2 = nn.relu(nn.Dense(c.net_width // 2, name="views_0")(h2))
      rgb = nn.Dense(3, name="rgb")(h2)
      return jnp.concatenate([rgb, alpha], axis=-1)
    return nn.Dense(4, name="output")(h)


def raw2outputs(raw, z_vals, rays_d, raw_noise_std: float = 0.0,
                white_bkgd: bool = False, key=None):
  """raw [N, S, 4] -> (rgb, disp, acc, weights, depth)
  (run_nerf_helpers.py:381-424)."""
  dists = z_vals[..., 1:] - z_vals[..., :-1]
  dists = jnp.concatenate(
      [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
  dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

  rgb = nn.sigmoid(raw[..., :3])
  density = raw[..., 3]
  if raw_noise_std > 0 and key is not None:
    density = density + raw_noise_std * jax.random.normal(
        key, density.shape)
  alpha = 1.0 - jnp.exp(-nn.relu(density) * dists)
  trans = jnp.cumprod(
      jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                       1.0 - alpha + 1e-10], axis=-1), axis=-1)[..., :-1]
  weights = alpha * trans
  rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
  depth_map = jnp.sum(weights * z_vals, axis=-1)
  acc_map = jnp.sum(weights, axis=-1)
  disp_map = 1.0 / jnp.maximum(
      1e-10, depth_map / jnp.maximum(acc_map, 1e-10))
  if white_bkgd:
    rgb_map = rgb_map + (1.0 - acc_map[..., None])
  return rgb_map, disp_map, acc_map, weights, depth_map


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
  """Shift origins to the near plane and project into NDC
  (run_nerf_helpers.py:314-332)."""
  t = -(near + rays_o[..., 2]) / rays_d[..., 2]
  rays_o = rays_o + t[..., None] * rays_d
  o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
  o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
  o2 = 1.0 + 2.0 * near / rays_o[..., 2]
  d0 = -1.0 / (W / (2.0 * focal)) * (
      rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
  d1 = -1.0 / (H / (2.0 * focal)) * (
      rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
  d2 = -2.0 * near / rays_o[..., 2]
  return (jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1))


def make_frozen_density_fn(model: "ClassicNerfModel", alpha_params):
  """Density provider from a FROZEN alpha model for the NeRF_RGB variant
  (run_nerf_helpers.py:157-241: rgb trains, geometry comes stop-gradded
  from a pretrained model). Pass the result as `frozen_density_fn` to
  ClassicNerfModel.apply."""

  def fn(pts, viewdirs, level: int):
    raw = model.apply({"params": alpha_params}, pts, viewdirs, level,
                      method=_frozen_density_method)
    return jax.lax.stop_gradient(raw)

  return fn


def _frozen_density_method(self, pts, viewdirs, level):
  mlp = self.coarse if level == 0 else self.fine
  return self._run_mlp(mlp, pts, viewdirs)[..., 3]


class ClassicNerfAdapter(nn.Module):
  """Exposes ClassicNerfModel through the MipNerfModel return contract
  (list of per-level dicts) so the shared trainer/renderer drive it."""
  config: ClassicNerfConfig

  def setup(self):
    self.inner = ClassicNerfModel(config=self.config, name="nerf")

  def __call__(self, rays, rng=None, white_bkgd: bool = False,
               viewc=None):
    del white_bkgd, viewc  # white_bkgd is a model-config field here
    out = self.inner(rays, rng=rng)
    coarse = dict(rgb=out["rgb0"], distance=out["depth0"],
                  acc=out["acc0"], weights=None, semantic=None,
                  s_vals=None)
    fine = dict(rgb=out["rgb"], distance=out["depth"], acc=out["acc"],
                weights=out["weights"], semantic=None, s_vals=None)
    return [coarse, fine]


class ClassicNerfModel(nn.Module):
  """Coarse + fine hierarchical classic NeRF (render.py:281-409)."""
  config: ClassicNerfConfig

  def setup(self):
    self.coarse = ClassicNerfMLP(cfg=self.config, name="coarse")
    if self.config.n_importance > 0:
      self.fine = ClassicNerfMLP(cfg=self.config, name="fine")

  def _run_mlp(self, mlp, pts, viewdirs):
    c = self.config
    pts_enc = mip.pos_enc(pts, 0, c.multires, append_identity=True)
    v_enc = None
    if c.use_viewdirs:
      v_enc = mip.pos_enc(viewdirs, 0, c.multires_views,
                          append_identity=True)
    return mlp(pts_enc, v_enc)

  def __call__(self, rays, rng=None, frozen_density_fn=None):
    c = self.config
    keys = jax.random.split(rng, 4) if rng is not None else [None] * 4
    near = rays.near
    far = rays.far

    t_lin = jnp.linspace(0.0, 1.0, c.n_samples)
    if c.lindisp:
      z_vals = 1.0 / (1.0 / near * (1 - t_lin) + 1.0 / far * t_lin)
    else:
      z_vals = near * (1 - t_lin) + far * t_lin
    z_vals = jnp.broadcast_to(z_vals, rays.origins.shape[:-1] +
                              (c.n_samples,))
    if c.perturb and keys[0] is not None:
      mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
      upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
      lower = jnp.concatenate([z_vals[..., :1], mids], -1)
      z_vals = lower + (upper - lower) * jax.random.uniform(
          keys[0], z_vals.shape)

    pts = rays.origins[..., None, :] + \
        rays.directions[..., None, :] * z_vals[..., None]
    raw = self._run_mlp(self.coarse, pts, rays.viewdirs)
    if frozen_density_fn is not None:
      # NeRF_RGB: frozen geometry, trainable appearance
      raw = jnp.concatenate(
          [raw[..., :3],
           frozen_density_fn(pts, rays.viewdirs, 0)[..., None]], -1)
    rgb0, disp0, acc0, weights, depth0 = raw2outputs(
        raw, z_vals, rays.directions, c.raw_noise_std, c.white_bkgd,
        key=keys[1])
    out = {"rgb0": rgb0, "disp0": disp0, "acc0": acc0, "depth0": depth0}

    if c.n_importance > 0:
      z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
      z_samples = sampling.sample_pdf(
          keys[2], z_mid, weights[..., 1:-1], c.n_importance,
          det=(keys[2] is None))
      z_samples = jax.lax.stop_gradient(z_samples)
      z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
      pts = rays.origins[..., None, :] + \
          rays.directions[..., None, :] * z_all[..., None]
      raw = self._run_mlp(self.fine, pts, rays.viewdirs)
      if frozen_density_fn is not None:
        raw = jnp.concatenate(
            [raw[..., :3],
             frozen_density_fn(pts, rays.viewdirs, 1)[..., None]], -1)
      rgb, disp, acc, weights, depth = raw2outputs(
          raw, z_all, rays.directions, c.raw_noise_std, c.white_bkgd,
          key=keys[3])
      out.update(rgb=rgb, disp=disp, acc=acc, depth=depth,
                 weights=weights)
    else:
      out.update(rgb=rgb0, disp=disp0, acc=acc0, depth=depth0,
                 weights=weights)
    return out
