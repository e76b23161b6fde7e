"""zip-nerf model (S-NeRF++ background): hash-grid MLPs + multisample
conical casting + proposal hierarchy.

Behavioral parity targets (re-derived):
  reference s-nerfpp/zipnerf/internal/models.py:28-351 (Model: 3 levels =
  2 PropMLP + NerfMLP; dilate -> anneal -> sample_intervals -> s_to_t via
  power_transformation -> multisample cast_rays(n=7, m=3) -> MLP ->
  compute_alpha_weights -> volumetric_rendering),
  models.py:354-709 (MLP: hash-grid features with erf multisample
  downweighting erf(1/sqrt(8 sigma^2 g^2)), 64-wide density layer into a
  256 bottleneck, viewdir branch deg 1..4, semantic head = bottleneck
  channels 1..1+classes softmax (models.py:594-597), GLO scale/shift),
  waymo.gin (power_transformation, opaque background, prop grid dims
  512/2048, PropMLP level_dim 1, NerfMLP deg_view 1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.models.hashgrid import HashEncoding
from snerf_tpu.ops import coord, mip, render, stepfun


@dataclasses.dataclass(frozen=True)
class ZipNerfConfig:
  """Static hyperparameters (models.py:32-55 + waymo.gin)."""
  num_prop_samples: Tuple[int, ...] = (64, 64)
  num_nerf_samples: int = 32
  num_levels: int = 3
  bg_intensity_range: Tuple[float, float] = (1.0, 1.0)
  anneal_slope: float = 10.0
  stop_level_grad: bool = True
  use_viewdirs: bool = True
  raydist_fn: str = "power_transformation"
  power_lambda: float = -1.5
  single_jitter: bool = True
  dilation_multiplier: float = 0.5
  dilation_bias: float = 0.0025
  num_glo_features: int = 0
  num_glo_embeddings: int = 1000
  resample_padding: float = 0.0
  opaque_background: bool = True
  std_scale: float = 0.35
  sample_n: int = 7
  sample_m: int = 3
  # MLP dims
  bottleneck_width: int = 256
  net_depth_viewdirs: int = 2
  net_width_viewdirs: int = 256
  deg_view: int = 1
  density_bias: float = -1.0
  density_noise: float = 0.0
  rgb_padding: float = 0.001
  # grids
  prop_grid_resolutions: Tuple[int, ...] = (512, 2048)
  prop_grid_level_dim: int = 1
  nerf_grid_resolution: int = 8192
  nerf_grid_level_dim: int = 4
  grid_base_resolution: int = 16
  grid_num_levels: int = 10
  grid_log2_hashmap_size: int = 21
  # encoder backend: 'hash' = instant-NGP parity (gather-bound on TPU,
  # see PERF.md); 'ipe' = gather-free integrated-positional-encoding
  # backbone (MXU-bound); 'cp' = integrated multiresolution CP-factor
  # grid (models/cpgrid.py: dense-matmul fwd+bwd, no gather/scatter);
  # 'cp_ipe' = CP features concatenated with the IPE encoding;
  # 'cp_hash' = cp_ipe + ONE fine hash level on the nerf MLP only,
  # queried once per interval at the collapsed Gaussian mean (~1M
  # gathers/step at the reference budget — inside the measured
  # gather-fast regime, unlike full hash's 0.37G);
  # 'cp_tri' = cp_ipe + three DENSE fine 2D planes (models/triplane.py)
  # instead of the fine hash level: zero hash collisions, 12 gathers per
  # query (vs 8), same query modes (cp_hash_per_sample/use_spread/...);
  # 'mipcast' = DIAGNOSTIC transplant (round-4 zip-vs-mip gap hunt):
  # mip's exact per-interval conical/cylindrical Gaussian cast +
  # anisotropic diag IPE on raw world coordinates — no multisampling,
  # no contraction, no scene_scale — inside the zip hierarchy/trainer.
  # Isolates the featurization chain from the trainer/data path.
  encoder_type: str = "hash"
  # World pre-scale applied before the mip-360 contraction. The
  # reference always feeds the model a PCA-normalized world
  # (transform_poses_pca scales camera spread into [-1,1]^3,
  # internal/camera_utils.py:162-203) so street content straddles the
  # unit ball; a metric-scale bounded scene loaded without that
  # normalization (content at radius r >> 1) lands deep in the
  # contracted tail where radial encoder resolution falls as 1/r^2.
  # Set scene_scale ~= 1/far for bounded scenes to keep content inside
  # the unit ball (zero contraction distortion); leave 1.0 for
  # PCA-normalized unbounded scenes.
  scene_scale: float = 1.0
  ipe_max_deg: int = 12
  ipe_density_depth: int = 4
  ipe_density_width: int = 256
  # PRODUCTION form of the round-4 'mipcast' finding: per-interval
  # cylindrical Gaussian cast (anisotropic diag cov — along-ray extent
  # + cross-ray footprint) propagated through the mip-360 contraction
  # with the closed-form diag Jacobian (coord.warp_fn2_gaussian_diag,
  # radius=1 == zip's contract), then axis-aligned IPE. Replaces the
  # n-multisample isotropic chain for the 'ipe' encoder: exact cone
  # integral at 1/n the encode cost, and the anisotropy is what buys
  # the fit (realfocal batch-10: 36.88 vs 27.36 held-out with the
  # trunk topology fixes; PERF.md). Keeps unbounded-scene semantics.
  ipe_anisotropic: bool = False
  # the same anisotropic interval cast for the CP encoder family
  # (cp/cp_ipe/cp_hash/cp_tri): per-axis variances feed CPEncoding's
  # per-axis Gaussian profiles directly (cpgrid.py accepts [..., n, 3]
  # stds), the IPE part gets the per-axis diag, and the fine-hash erf
  # uses the isotropic-equivalent mean variance. One cast per interval
  # (n=1) instead of sample_n multisamples.
  cp_anisotropic: bool = False
  # skip-cat of the encoder features back into the trunk after layer i
  # (i > 0, i % skip == 0; mip's NerfMLP convention, models.py:268-272).
  # The reference zip MLP has NO trunk skips — capacity lives in its
  # hash tables. For MLP-capacity encoders (ipe/cp) an 8-deep plain
  # relu stack underfits; 4 restores the classic NeRF topology. 0 = off
  # (reference parity).
  ipe_skip_layer: int = 0
  # width of the post-encoder density layer (reference models.py:484:
  # 64 — the instant-NGP choke where the tables carry capacity). For
  # ipe/cp encoders the whole scene must pass through this layer; 256
  # removes the bottleneck. 64 = reference parity.
  density_hidden_width: int = 64
  # zero-init the DENSITY column of density_out: density starts at
  # softplus(density_bias) everywhere instead of being kicked by the
  # encoder features' DC at step 0 (the measured F>=64 full-lr failure
  # mode is an all-opaque collapse in the first 40 steps —
  # scripts/probe_f64_stability.py / PERF.md round-4). The other
  # bottleneck columns keep glorot, so trunk gradients still flow.
  density_zero_init: bool = False
  # BARF-style coarse-to-fine windows (fraction of training over which
  # the window opens; 0 disables). ipe_anneal_frac windows IPE degrees,
  # cp_anneal_frac windows CP levels.
  ipe_anneal_frac: float = 0.0
  cp_anneal_frac: float = 0.0
  # integrated CP encoder (encoder_type 'cp' / 'cp_ipe').
  # level_dim 16 is the measured stability/quality sweet spot: F=64
  # diverges at every lr/init tried unless level-annealed, and F=32
  # scores below F=16 on the A/B (PERF.md round-3 table).
  cp_num_levels: int = 4
  cp_level_dim: int = 16
  cp_base_resolution: int = 128
  cp_max_resolution: int = 1024
  cp_bump_width: float = 0.75
  # moment-match the n multisamples into one per-axis Gaussian before
  # encoding (same cone integral, 1/n the profile cost) — A/B'd in
  # scripts/ab_round3.py
  cp_collapse_multisamples: bool = True
  # prop MLPs carry lighter CP encoders (reference PropMLP level_dim=1)
  cp_prop_num_levels: int = 3
  cp_prop_level_dim: int = 8
  cp_init_scale: float = 0.1
  cp_init_smooth: float = 0.0  # low-pass sigma for factor init noise
  # > 0: bounded factor tables v = 1 + b tanh(v_raw / b) — caps every
  # per-axis term in [1-b, 1+b] so 3-way products cannot run away
  # (candidate fix for the F>=64 lr_delay=0 divergence; see cpgrid.py)
  cp_factor_bound: float = 0.0
  # CP feature output transform (cpgrid.py feature_center/feature_scale
  # docs): center removes the product DC (zero-mean features), scale
  # < 1 shrinks them toward the instant-NGP small-init regime — the
  # round-5 scene-b stability knobs.
  cp_feature_center: bool = False
  cp_feature_scale: float = 1.0
  cp_pair_dim: int = 0     # rank-F2 pair products (decomposed tri-plane)
  # Encoder-output normalization. The round-3 sweep found a hard
  # divergence boundary at >=256 total encoder dims (F=64 or F=16+pair16
  # both diverge at any lr/init; F<=32 trains) — the products' common-
  # mode DC (init mean 1) couples all channels through the trunk.
  # 'center' subtracts the init mean; 'layernorm' removes the common
  # mode entirely.
  cp_feature_norm: str = "none"    # none | center | layernorm
  # fine hash levels for encoder_type 'cp_hash'
  cp_hash_resolution: int = 2048
  cp_hash_level_dim: int = 4
  cp_hash_log2: int = 19
  cp_hash_num_levels: int = 1
  cp_hash_base_resolution: int = 512   # only used when num_levels > 1
  # query mode: per-sample queries each of the n multisamples with its
  # own std (n x gathers, but fine cells survive where std is small);
  # the collapsed mode queries once at the interval mean — with
  # use_spread the erf variance includes the multisample spread, which
  # at fine resolutions zeroes the feature for all but tiny intervals.
  cp_hash_per_sample: bool = False
  cp_hash_use_spread: bool = True
  # train-time stochastic multisample selection for the collapsed query:
  # gather at ONE randomly chosen cone sample per interval per step — an
  # unbiased Monte Carlo estimate of the per-sample average at 1/n the
  # gather cost (per-sample mode: n x gathers). Eval (rng=None) queries
  # the interval mean, identical to the plain collapsed mode.
  cp_hash_dither: bool = False
  # middle ground between collapsed (1 query/interval, discards the
  # along-ray extent) and per-sample (n queries): partition the n
  # multisamples into k contiguous along-ray groups and query each
  # group's mean — k gathers/interval.
  cp_hash_split: int = 0
  # fine tri-plane for encoder_type 'cp_tri' (shares the cp_hash_* query
  # modes above; 3 x resolution^2 x level_dim dense params)
  cp_tri_resolution: int = 2048
  cp_tri_level_dim: int = 4
  # heads
  use_semantic: bool = False
  class_num: int = 19
  compute_dtype: Any = jnp.float32
  # RefNeRF machinery (models.py:362-375, ref_utils.py) — dormant in the
  # shipped waymo.gin (disable_density_normals=True) but available:
  disable_density_normals: bool = True
  enable_pred_normals: bool = False
  use_directional_enc: bool = False   # IDE instead of pos_enc(viewdirs)
  use_reflections: bool = False
  enable_pred_roughness: bool = False
  roughness_bias: float = -1.0


class ZipMLP(nn.Module):
  """Hash-grid density/rgb MLP with erf multisample downweighting."""
  cfg: ZipNerfConfig
  grid_resolution: int
  grid_level_dim: int
  disable_rgb: bool = False

  def setup(self):
    c = self.cfg
    # Mixed precision (reference trains under AMP autocast,
    # train.py:216-226): the MXU trunk runs in compute_dtype (params stay
    # f32); density/rgb/semantic heads and compositing stay f32.
    dt = c.compute_dtype
    if c.encoder_type == "hash":
      self.encoder = HashEncoding(
          num_levels=c.grid_num_levels, level_dim=self.grid_level_dim,
          base_resolution=c.grid_base_resolution,
          desired_resolution=self.grid_resolution,
          log2_hashmap_size=c.grid_log2_hashmap_size, name="grid")
    else:
      if c.encoder_type in ("cp", "cp_ipe", "cp_hash", "cp_tri"):
        from snerf_tpu.models.cpgrid import CPEncoding
        levels = c.cp_prop_num_levels if self.disable_rgb \
            else c.cp_num_levels
        dim = c.cp_prop_level_dim if self.disable_rgb else c.cp_level_dim
        self.encoder = CPEncoding(
            num_levels=levels, level_dim=dim,
            base_resolution=min(c.cp_base_resolution,
                                self.grid_resolution),
            max_resolution=min(c.cp_max_resolution, self.grid_resolution),
            bump_width=c.cp_bump_width, init_scale=c.cp_init_scale,
            init_smooth=c.cp_init_smooth,
            pair_dim=0 if self.disable_rgb else c.cp_pair_dim,
            factor_bound=c.cp_factor_bound,
            feature_center=c.cp_feature_center,
            feature_scale=c.cp_feature_scale,
            compute_dtype=dt, name="cp_grid")
        if c.encoder_type == "cp_hash" and not self.disable_rgb:
          base = (c.cp_hash_base_resolution if c.cp_hash_num_levels > 1
                  else c.cp_hash_resolution)
          self.hash_fine = HashEncoding(
              num_levels=c.cp_hash_num_levels,
              level_dim=c.cp_hash_level_dim,
              base_resolution=base,
              desired_resolution=c.cp_hash_resolution,
              log2_hashmap_size=c.cp_hash_log2, name="hash_fine")
        elif c.encoder_type == "cp_tri" and not self.disable_rgb:
          from snerf_tpu.models.triplane import TriplaneEncoding
          self.hash_fine = TriplaneEncoding(
              resolution=c.cp_tri_resolution,
              level_dim=c.cp_tri_level_dim, name="tri_fine")
      else:
        self.encoder = None
      self.ipe_layers = [
          nn.Dense(c.ipe_density_width, dtype=dt, name=f"ipe_{i}")
          for i in range(c.ipe_density_depth)]
    out_width = 1 if self.disable_rgb else c.bottleneck_width
    self.density_hidden = nn.Dense(c.density_hidden_width, dtype=dt,
                                   name="density_hidden")
    if c.density_zero_init:
      glorot = nn.initializers.lecun_normal()
      def dz_init(key, shape, dtype=jnp.float32):
        k = glorot(key, shape, dtype)
        return k.at[:, 0].set(0.0)
      self.density_out = nn.Dense(out_width, dtype=dt,
                                  kernel_init=dz_init,
                                  name="density_out")
    else:
      self.density_out = nn.Dense(out_width, dtype=dt,
                                  name="density_out")
    if c.enable_pred_normals:
      self.normals_head = nn.Dense(3, dtype=jnp.float32,
                                   name="normals_head")
    if not self.disable_rgb:
      self.view_layers = [
          nn.Dense(c.net_width_viewdirs, dtype=dt, name=f"view_{i}")
          for i in range(c.net_depth_viewdirs)]
      self.rgb_out = nn.Dense(3, dtype=jnp.float32, name="rgb_out")
      if c.enable_pred_roughness:
        self.roughness_head = nn.Dense(1, dtype=jnp.float32,
                                       name="roughness_head")
      if c.num_glo_features > 0:
        self.glo_0 = nn.Dense(128, dtype=dt, name="glo_0")
        self.glo_1 = nn.Dense(c.bottleneck_width * 2, dtype=dt,
                              name="glo_1")

  def _ipe_enc(self, z, new_std, train_frac, var3=None):
    """Annealable IPE of the contracted Gaussians, multisample-averaged.

    var3 (per-axis variance, shape of z) overrides the isotropic
    new_std**2 under the anisotropic cast."""
    c = self.cfg
    var = (var3 if var3 is not None else
           jnp.broadcast_to((new_std ** 2)[..., None], z.shape))
    enc = mip.integrated_pos_enc(z, var, 0, c.ipe_max_deg, diag=True)
    if c.ipe_anneal_frac > 0:
      # BARF-style coarse-to-fine degree window; enc layout is
      # [deg0_xyz, deg1_xyz, ... | same for cos] (ops/mip.py:124-129).
      from snerf_tpu.models.cpgrid import cosine_window
      alpha = jnp.clip(
          train_frac / c.ipe_anneal_frac, 0.0, 1.0) * c.ipe_max_deg
      win = cosine_window(alpha, c.ipe_max_deg)
      win = jnp.tile(jnp.repeat(win, 3), 2)
      enc = enc * win
    return enc.mean(axis=-2)  # mean over n multisamples

  def _aniso(self):
    return self.cfg.ipe_anisotropic and self.cfg.encoder_type == "ipe"

  def _cp_aniso(self):
    return (self.cfg.cp_anisotropic and self.cfg.encoder_type
            in ("cp", "cp_ipe", "cp_hash", "cp_tri"))

  def _trunk(self, h):
    """ipe_layers stack (+ optional skip-cat) + density_hidden."""
    skip = self.cfg.ipe_skip_layer
    inputs = h
    for i, layer in enumerate(self.ipe_layers):
      h = nn.relu(layer(h))
      if skip > 0 and i > 0 and i % skip == 0:
        h = jnp.concatenate([h, inputs], axis=-1)
    return nn.relu(self.density_hidden(h))

  def predict_density(self, means, stds, rng=None, train_frac=1.0):
    """means [..., n, 3], stds [..., n] -> (raw_density [...], x [..., W]).

    Contract -> [0,1]^3 -> hash features [., n, L, C], erf-downweighted
    mean over the n multisamples (models.py:484-518).
    """
    c = self.cfg
    if c.encoder_type == "mipcast" or self._aniso():
      # `stds` carries the per-interval DIAG covariance [..., S, 3]
      # from mip.cast_rays (see ZipNerfModel.__call__); no n axis.
      # mipcast: raw world coords (diagnostic, bounded scenes only —
      # mip's _encode_samples no-warp path, models/mipnerf.py:87-95).
      # ipe_anisotropic: scene_scale + contraction with closed-form
      # diag-Jacobian cov propagation (radius=1 == zip contract).
      # Density normals (grad-through-mean) unsupported on both.
      if self._aniso():
        s = c.scene_scale
        z, var = coord.warp_fn2_gaussian_diag(means * s,
                                              stds * (s * s),
                                              radius=1.0)
      else:
        z, var = means, stds
      enc = mip.integrated_pos_enc(z, var, 0, c.ipe_max_deg, diag=True)
      if c.ipe_anneal_frac > 0:
        from snerf_tpu.models.cpgrid import cosine_window
        alpha = jnp.clip(
            train_frac / c.ipe_anneal_frac, 0.0, 1.0) * c.ipe_max_deg
        win = cosine_window(alpha, c.ipe_max_deg)
        enc = enc * jnp.tile(jnp.repeat(win, 3), 2)
      h = self._trunk(enc)
      x = self.density_out(h)
      raw_density = x[..., 0]
      if rng is not None and c.density_noise > 0:
        raw_density = raw_density + c.density_noise * jax.random.normal(
            rng, raw_density.shape)
      return raw_density, x
    if self._cp_aniso():
      # anisotropic interval cast (see cp_anisotropic): `stds` carries
      # the per-interval DIAG covariance [..., S, 3] from
      # mip.cast_rays; propagate through the contraction and re-add an
      # n=1 multisample axis so the downstream shapes are unchanged.
      s = c.scene_scale
      z3, var3 = coord.warp_fn2_gaussian_diag(means * s,
                                              stds * (s * s),
                                              radius=1.0)
      z = z3[..., None, :]                     # [..., S, 1, 3]
      var3 = var3[..., None, :]
      new_std = jnp.sqrt(var3.mean(axis=-1))   # isotropic equivalent
    else:
      var3 = None
      z, new_std = coord.contract_mean_std(means * c.scene_scale,
                                           stds * c.scene_scale)
    if c.encoder_type == "hash":
      # contract maps into [-2, 2]; normalize to [0, 1] for the grid.
      x01 = (z / 2.0 + 1.0) / 2.0
      feats = self.encoder(x01)  # [..., n, L, C]
      g = jnp.asarray(self.encoder.grid_sizes)  # [L]
      w = jax.lax.erf(1.0 / jnp.sqrt(
          8.0 * (new_std[..., None] * g / 2.0) ** 2 + 1e-20))
      feats = (feats * w[..., None]).mean(axis=-3)  # mean over n
      feats = feats.reshape(*feats.shape[:-2], -1)
      h = nn.relu(self.density_hidden(feats))
    elif c.encoder_type in ("cp", "cp_ipe", "cp_hash", "cp_tri"):
      # Integrated CP-factor grid: dense-matmul encode (cpgrid.py); the
      # per-axis Gaussian profile integrates the feature field under
      # each multisample's Gaussian analytically.
      x01 = (z / 2.0 + 1.0) / 2.0
      # per-axis stds for the CP profiles under the anisotropic cast;
      # scalar paths (fine-hash erf) use the isotropic equivalent.
      std01 = (jnp.sqrt(var3) / 4.0 if var3 is not None
               else new_std / 4.0)
      std01_s = new_std / 4.0
      level_window = None
      if c.cp_anneal_frac > 0:
        from snerf_tpu.models.cpgrid import cosine_window
        nl = self.encoder.num_levels
        alpha = jnp.clip(
            train_frac / c.cp_anneal_frac, 0.0, 1.0) * nl
        level_window = cosine_window(alpha, nl)
      feats = self.encoder(x01, std01, level_window=level_window,
                           collapse=c.cp_collapse_multisamples)
      if c.cp_feature_norm == "center":
        feats = feats - 1.0
      elif c.cp_feature_norm == "layernorm":
        mu = feats.mean(axis=-1, keepdims=True)
        var = ((feats - mu) ** 2).mean(axis=-1, keepdims=True)
        feats = (feats - mu) * jax.lax.rsqrt(var + 1e-6)
      parts = [feats]
      if c.encoder_type in ("cp_ipe", "cp_hash", "cp_tri"):
        parts.append(self._ipe_enc(z, new_std, train_frac, var3=var3))
      if (c.encoder_type in ("cp_hash", "cp_tri")
          and hasattr(self, "hash_fine")):
        # fine hash level(s) on the nerf MLP only, erf-downweighted
        # (models.py:500-502). Gather budget at the reference config:
        # per-interval = levels x ~1M/step; per-sample = n x that —
        # both inside the measured gather-fast regime (PERF.md), unlike
        # the full 10-level hash's 0.37G.
        g = jnp.asarray(self.hash_fine.grid_sizes)      # [L]
        if c.cp_hash_per_sample:
          hfeat = self.hash_fine(x01)                   # [..., n, L, C]
          w = jax.lax.erf(1.0 / jnp.sqrt(
              8.0 * (std01_s[..., None] * g) ** 2 + 1e-20))
          hfeat = (hfeat * w[..., None]).mean(axis=-3)  # [..., L, C]
        elif c.cp_hash_split > 1:
          n = x01.shape[-2]
          k = min(c.cp_hash_split, n)
          gid = (jnp.arange(n) * k) // n                # group per sample
          G = (gid[None, :] == jnp.arange(k)[:, None])  # [k, n] one-hot
          W = G.astype(x01.dtype) / G.sum(-1, keepdims=True)
          gm = jnp.einsum("kn,...nd->...kd", W, x01)    # [..., k, 3]
          gv = jnp.einsum("kn,...n->...k", W, std01_s ** 2)
          if c.cp_hash_use_spread:
            back = jnp.einsum("nk,...kd->...nd", G.T.astype(x01.dtype),
                              gm)                       # group mean/sample
            gv = gv + jnp.einsum("kn,...n->...k", W,
                                 ((x01 - back) ** 2).mean(-1))
          hfeat = self.hash_fine(gm)                    # [..., k, L, C]
          w = jax.lax.erf(1.0 / jnp.sqrt(               # [..., k, L]
              8.0 * gv[..., None] * (g ** 2) + 1e-20))
          hfeat = (hfeat * w[..., None]).mean(axis=-3)  # [..., L, C]
        else:
          m1 = x01.mean(axis=-2, keepdims=True)         # [..., 1, 3]
          var1 = (std01_s ** 2).mean(axis=-1)           # [...]
          if c.cp_hash_use_spread:
            var1 = var1 + ((x01 - m1) ** 2).mean(axis=(-2, -1))
          if c.cp_hash_dither and rng is not None:
            n = x01.shape[-2]
            idx = jax.random.randint(
                jax.random.fold_in(rng, 7), x01.shape[:-2], 0, n)
            m1 = jnp.take_along_axis(
                x01, jnp.broadcast_to(idx[..., None, None],
                                      x01.shape[:-2] + (1, 3)), axis=-2)
          hfeat = self.hash_fine(m1)[..., 0, :, :]      # [..., L, C]
          w = jax.lax.erf(1.0 / jnp.sqrt(               # [..., L]
              8.0 * var1[..., None] * (g ** 2) + 1e-20))
          hfeat = hfeat * w[..., None]
        hfeat = hfeat.reshape(*hfeat.shape[:-2], -1)
        parts.append(hfeat.astype(feats.dtype))
      h = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
      h = self._trunk(h)
    else:
      # Gather-free TPU backbone: IPE of the contracted isotropic
      # Gaussians (the expected-sin variance decay plays the role of the
      # erf multisample downweighting), averaged over the n multisamples,
      # then a small MXU-bound trunk.
      h = self._trunk(self._ipe_enc(z, new_std, train_frac))
    x = self.density_out(h)
    raw_density = x[..., 0]
    if rng is not None and c.density_noise > 0:
      raw_density = raw_density + c.density_noise * jax.random.normal(
          rng, raw_density.shape)
    return raw_density, x

  def __call__(self, means, stds, viewdirs=None, glo_vec=None, rng=None,
               train_frac=1.0):
    c = self.cfg
    normals = normals_pred = None
    if not c.disable_density_normals:
      # density normals = -normalize(d sigma / d means) (models.py:553-573)
      def _dsum(m):
        return self.predict_density(m, stds, rng=None,
                                    train_frac=train_frac)[0].sum()
      raw_grad = jax.grad(_dsum)(means)
      from snerf_tpu.ops import ref_utils
      normals = -ref_utils.l2_normalize(raw_grad.mean(axis=-2))
    raw_density, x = self.predict_density(means, stds, rng=rng,
                                          train_frac=train_frac)
    density = nn.softplus(raw_density + c.density_bias)

    if c.enable_pred_normals:
      from snerf_tpu.ops import ref_utils
      grad_pred = self.normals_head(x.astype(jnp.float32))
      normals_pred = -ref_utils.l2_normalize(grad_pred)

    if self.disable_rgb:
      return dict(density=density,
                  rgb=jnp.zeros(density.shape + (3,)), semantic=None,
                  normals=normals, normals_pred=normals_pred)

    semantic = None
    if c.use_semantic:
      semantic = jax.nn.softmax(x[..., 1:1 + c.class_num], axis=-1)

    bottleneck = x
    if glo_vec is not None:
      g = nn.relu(self.glo_0(glo_vec))
      g = self.glo_1(g)
      g = jnp.broadcast_to(g[..., None, :],
                           bottleneck.shape[:-1] + (g.shape[-1],))
      scale, shift = jnp.split(g, 2, axis=-1)
      bottleneck = bottleneck * jnp.exp(scale) + shift

    roughness = None
    if c.enable_pred_roughness:
      roughness = nn.softplus(
          self.roughness_head(x.astype(jnp.float32)) + c.roughness_bias)

    parts = [bottleneck]
    if viewdirs is not None:
      if c.use_directional_enc:
        from snerf_tpu.ops import ref_utils
        ide_fn = ref_utils.generate_ide_fn(c.deg_view)
        normals_to_use = normals_pred if c.enable_pred_normals else normals
        if c.use_reflections and normals_to_use is not None:
          # reflect the point-to-camera direction about the normal
          # (models.py:636-646); per-sample directions
          dirs = ref_utils.reflect(
              -viewdirs[..., None, :], normals_to_use)
        else:
          dirs = jnp.broadcast_to(
              viewdirs[..., None, :],
              bottleneck.shape[:-1] + (3,))
        kappa_inv = (roughness if roughness is not None
                     else jnp.zeros_like(dirs[..., :1]))
        dir_enc = ide_fn(dirs, kappa_inv)
        dir_enc = jnp.broadcast_to(
            dir_enc, bottleneck.shape[:-1] + (dir_enc.shape[-1],))
      else:
        dir_enc = mip.pos_enc(viewdirs, 0, c.deg_view,
                              append_identity=True)
        dir_enc = jnp.broadcast_to(
            dir_enc[..., None, :],
            bottleneck.shape[:-1] + (dir_enc.shape[-1],))
      parts.append(dir_enc)
    h = jnp.concatenate(parts, axis=-1)
    inputs = h
    for i, layer in enumerate(self.view_layers):
      h = nn.relu(layer(h))
      if i == 0:  # skip_layer_dir = 0 (models.py:365)
        h = jnp.concatenate([h, inputs], axis=-1)
    rgb = nn.sigmoid(self.rgb_out(h))
    rgb = rgb * (1 + 2 * c.rgb_padding) - c.rgb_padding
    return dict(density=density, rgb=rgb, semantic=semantic,
                normals=normals, normals_pred=normals_pred)


class ZipNerfModel(nn.Module):
  """The 3-level proposal hierarchy (models.py:98-345)."""
  config: ZipNerfConfig

  def setup(self):
    c = self.config
    self.prop_mlps = [
        ZipMLP(cfg=c,
               grid_resolution=c.prop_grid_resolutions[
                   min(i, len(c.prop_grid_resolutions) - 1)],
               grid_level_dim=c.prop_grid_level_dim, disable_rgb=True,
               name=f"prop_mlp_{i}")
        for i in range(c.num_levels - 1)]
    self.nerf_mlp = ZipMLP(cfg=c, grid_resolution=c.nerf_grid_resolution,
                           grid_level_dim=c.nerf_grid_level_dim,
                           disable_rgb=False, name="nerf_mlp")
    if c.num_glo_features > 0:
      self.glo_vecs = nn.Embed(c.num_glo_embeddings, c.num_glo_features,
                               name="glo_vecs")

  def __call__(self, rays, rng=None, train_frac: float = 1.0,
               compute_extras: bool = False, zero_glo: bool = True):
    """rays: ops.rays.Rays with [..., 1] near/far. Returns
    (renderings, ray_history) — one rendering dict per level."""
    c = self.config
    keys = jax.random.split(rng, 2 * c.num_levels) if rng is not None \
        else [None] * (2 * c.num_levels)

    glo_vec = None
    if c.num_glo_features > 0:
      if zero_glo:
        glo_vec = jnp.zeros(rays.origins.shape[:-1] + (c.num_glo_features,))
      else:
        glo_vec = self.glo_vecs(rays.app[..., 0].astype(jnp.int32))

    _, s_to_t = coord.construct_ray_warps(
        c.raydist_fn, rays.near, rays.far, lam=c.power_lambda)

    init_s_near, init_s_far = 0.0, 1.0
    sdist = jnp.concatenate([
        jnp.full_like(rays.near, init_s_near),
        jnp.full_like(rays.far, init_s_far)], axis=-1)
    weights = jnp.ones_like(rays.near)
    prod_num_samples = 1

    renderings = []
    ray_history = []
    for i_level in range(c.num_levels):
      is_prop = i_level < c.num_levels - 1
      num_samples = (c.num_prop_samples[i_level] if is_prop
                     else c.num_nerf_samples)

      dilation = (c.dilation_bias + c.dilation_multiplier *
                  (init_s_far - init_s_near) / prod_num_samples)
      prod_num_samples *= num_samples

      if i_level > 0 and (c.dilation_bias > 0 or c.dilation_multiplier > 0):
        sdist, weights = stepfun.max_dilate_weights(
            sdist, weights, dilation, domain=(init_s_near, init_s_far),
            renormalize=True)
        sdist = sdist[..., 1:-1]
        weights = weights[..., 1:-1]

      if c.anneal_slope > 0:
        # Schlick bias (models.py:193-198)
        anneal = (c.anneal_slope * train_frac) / (
            (c.anneal_slope - 1) * train_frac + 1)
      else:
        anneal = 1.0

      logits_resample = jnp.where(
          sdist[..., 1:] > sdist[..., :-1],
          anneal * jnp.log(weights + c.resample_padding + 1e-30),
          -jnp.inf)

      sdist = stepfun.sample_intervals(
          keys[2 * i_level], sdist, logits_resample, num_samples,
          single_jitter=c.single_jitter,
          domain=(init_s_near, init_s_far))
      if c.stop_level_grad:
        sdist = jax.lax.stop_gradient(sdist)

      tdist = s_to_t(sdist)

      aniso_cast = (
          c.encoder_type == "mipcast"
          or (c.ipe_anisotropic and c.encoder_type == "ipe")
          or (c.cp_anisotropic and c.encoder_type
              in ("cp", "cp_ipe", "cp_hash", "cp_tri")))
      if aniso_cast:
        means, stds = mip.cast_rays(
            tdist, rays.origins, rays.directions, rays.radii,
            "cylinder", diag=True)
      else:
        base_x, base_y = _ray_basis(rays.directions)
        means, stds = render.cast_rays_multisample(
            keys[2 * i_level + 1], tdist, rays.origins, rays.directions,
            rays.radii[..., 0], base_x, base_y, n=c.sample_n,
            m=c.sample_m, std_scale=c.std_scale)

      mlp = self.prop_mlps[i_level] if is_prop else self.nerf_mlp
      ray_results = mlp(
          means, stds,
          viewdirs=rays.viewdirs if (c.use_viewdirs and not is_prop)
          else None,
          glo_vec=None if is_prop else glo_vec,
          rng=keys[2 * i_level + 1], train_frac=train_frac)

      weights = render.compute_alpha_weights(
          ray_results["density"], tdist, rays.directions,
          opaque_background=c.opaque_background)[0]

      if c.bg_intensity_range[0] == c.bg_intensity_range[1]:
        bg_rgbs = c.bg_intensity_range[0]
      elif rng is None:
        bg_rgbs = sum(c.bg_intensity_range) / 2
      else:
        bg_rgbs = jax.random.uniform(
            keys[2 * i_level], weights.shape[:-1] + (3,),
            minval=c.bg_intensity_range[0], maxval=c.bg_intensity_range[1])

      sem = ray_results["semantic"] if (not is_prop and c.use_semantic) \
          else None
      rendering = render.volumetric_rendering_zip(
          ray_results["rgb"], weights, tdist, bg_rgbs, rays.far,
          compute_extras=compute_extras, semantic=sem)
      renderings.append(rendering)
      ray_history.append(dict(sdist=sdist, tdist=tdist, weights=weights,
                              density=ray_results["density"],
                              normals=ray_results.get("normals"),
                              normals_pred=ray_results.get(
                                  "normals_pred")))
    return renderings, ray_history


def _ray_basis(directions):
  """Orthonormal (base_x, base_y) frame perpendicular to each ray.

  Parity: zipnerf stores base_x/base_y from the camera frame
  (camera_utils.py:453-564); for rays without camera context we build a
  stable Gram-Schmidt frame (same cone geometry, rotation-invariant stats).
  """
  d = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
  up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), d.shape)
  alt = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), d.shape)
  ref = jnp.where(jnp.abs(d[..., 2:3]) < 0.99, up, alt)
  bx = jnp.cross(ref, d)
  bx = bx / jnp.maximum(jnp.linalg.norm(bx, axis=-1, keepdims=True), 1e-8)
  by = jnp.cross(d, bx)
  return bx, by


def init_zipnerf(key, config: ZipNerfConfig, num_rays: int = 2):
  from snerf_tpu.ops.rays import Rays
  model = ZipNerfModel(config=config)
  d = jnp.ones((num_rays, 3), jnp.float32)
  rays = Rays(
      origins=jnp.zeros((num_rays, 3)), directions=d,
      viewdirs=d / jnp.linalg.norm(d, axis=-1, keepdims=True),
      radii=jnp.full((num_rays, 1), 0.001),
      lossmult=jnp.ones((num_rays, 1)),
      near=jnp.full((num_rays, 1), 0.1),
      far=jnp.full((num_rays, 1), 10.0),
      app=jnp.zeros((num_rays, 1), jnp.int32))
  variables = model.init(key, rays, rng=None)
  return model, variables
