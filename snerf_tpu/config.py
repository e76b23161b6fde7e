"""Unified config system: one dataclass serving all three reference roles
(SURVEY.md §5.6 — configargparse for s-nerf, gin for zipnerf, OmegaConf for
the simulator).

UX parity: `python train.py --config <file>` plus CLI overrides, where
<file> may be a reference-style `key = value` text config
(s-nerf/configs/nuScenes_depth_6cams format) or YAML. Flag names follow
reference utils/arg_parser.py:6-241. The resolved config is snapshotted
into the experiment dir (model_utils.py:72-81 behavior).
"""

from __future__ import annotations

import ast
import dataclasses
import os
from typing import Any, List, Optional


@dataclasses.dataclass
class Config:
  # --- experiment / paths (arg_parser.py) ---
  expname: str = "exp"
  basedir: str = "./exp"
  datadir: str = "./data"
  dataset_type: str = "nuscenes"    # nuscenes | waymo | llff | synthetic
  model: str = "mipnerf"            # mipnerf (S-NeRF) | zipnerf (S-NeRF++)
  config: Optional[str] = None      # config file path (filled by loader)

  # --- dataset ---
  H: int = 900
  W: int = 1600
  cam_num: int = 6
  datahold: int = 4
  bds_factor: float = 0.0
  no_align: bool = True
  colmap: bool = False
  half_train: bool = False
  fulltrain: bool = False
  skymask: bool = False
  near_far: bool = True            # near/far from depth bounds
  factor: int = 1                  # image downsample factor
  # foreground (moving-vehicle) branch: bbox-restricted ray sampling
  block_bg: bool = False
  car_sample_n: int = 9

  # --- model ---
  N_samples: int = 128
  N_fine: int = 128
  N_importance: int = 64           # legacy classic-NeRF path
  hidden_layer: int = 1024
  rgb_layer: int = 3
  proposal_hidden_layer: int = 256
  max_degree: int = 16
  multires_views: int = 4
  use_viewdirs: bool = True
  ray_shape: str = "cone"
  no_warp_sample: bool = False
  fn: Optional[int] = 1
  radius: float = 3.0
  transform_idx: int = 0           # 0=log 1=disparity 2=linear
  real: bool = True
  lindisp: bool = False
  disable_integration: bool = False
  density_noise: float = 0.0
  white_bkgd: bool = False
  encode_appearance: bool = False
  semantic: bool = False
  semantic_class_num: int = 19
  randomized: bool = True

  # --- training ---
  N_rgb: int = 4096
  N_iters: int = 200_000
  lrate: float = 5e-4
  lrate_final: float = 5e-6
  lrate_delay: int = 2500
  depth_loss: bool = False
  depth_lambda: float = 0.2
  disparity_depth: bool = False
  coarse_loss_mult: float = 0.1
  smooth_loss: bool = False
  smooth_lambda: float = 0.02
  N_patch: int = 8
  patch_sz: int = 8
  proposal_loss: bool = True
  proposal_lambda: float = 1.0
  semantic_lambda: float = 0.04
  pose_refine: bool = False
  depth_conf: bool = False
  conf_num: int = 1
  vgg_loss: bool = False
  # --flow (arg_parser.py:215): flow-consistency confidence mode. The
  # reference gathers flow_depends then its reproj_flow_err pdb's and
  # returns None (loss.py:181-216); here the mode is completed
  # (models/confidence.py "flow"). Needs the flow/ npy side channel.
  # Unlike the reference (assert conf_num == 1) any conf_num works —
  # flow just only attaches to the +-1 neighbors.
  flow: bool = False
  precompute_conf: bool = True
  tau: float = 0.3
  backcam: bool = False
  waymo: bool = False
  seg_mask: bool = False
  grad_max_norm: float = 0.0
  single_image: bool = True
  # EMA of params for eval/render (0 = off), mip/classic families —
  # the zip family's knob is zip_ema_decay
  ema_decay: float = 0.0

  # --- logging / checkpoints ---
  # lax.scan multi-step unroll: >1 keeps state on device between host
  # visits (one dispatch per `unroll_steps`); compile time grows with it
  unroll_steps: int = 1
  i_print: int = 100
  i_weights: int = 5000
  i_testset: int = 200_000
  # jax.profiler trace window: steps [profile_start, profile_start +
  # profile_steps) are traced into <exp_dir>/profile (view with
  # TensorBoard/xprof). 0 disables. SURVEY.md §5.1.
  profile_steps: int = 0
  profile_start: int = 20
  ckpt_keep: int = 3
  resume: bool = True

  # --- zipnerf (S-NeRF++ background; zipnerf/internal/configs.py) ---
  zip_batch_size: int = 32768
  zip_max_steps: int = 50000
  zip_lr_init: float = 0.01
  zip_lr_final: float = 0.001
  zip_lr_delay: int = 5000
  zip_num_prop_samples: Any = (64, 64)
  zip_num_nerf_samples: int = 32
  zip_glo_features: int = 0
  # hash (parity; gather-bound on TPU, see the runtime warning) |
  # ipe (TPU-fastest) | cp / cp_ipe (integrated-CP grid: quality-class
  # of hash, dense-matmul fwd+bwd — the round-3 recommended TPU arm)
  zip_encoder: str = "hash"
  zip_ipe_density_width: int = 256  # IPE/CP trunk width/depth
  zip_ipe_density_depth: int = 4
  zip_ipe_max_deg: int = 12
  zip_ipe_anneal_frac: float = 0.0  # BARF-style degree window (0 = off)
  # anisotropic interval-cast IPE through the contraction (the round-4
  # quality fix: +9 dB with the topology knobs on street-focal
  # geometry; models/zipnerf.py ipe_anisotropic)
  zip_ipe_anisotropic: bool = False
  zip_cp_anisotropic: bool = False  # same cast for the cp/cp_hash family
  zip_ipe_skip_layer: int = 0       # trunk skip-cat period (0 = off)
  zip_density_hidden_width: int = 64
  # tri-state: None = auto (True for the cp-family encoders, whose
  # feature DC otherwise kicks the density head into the measured
  # all-opaque collapse at F>=64 full lr — PERF.md round-4; False for
  # hash/ipe reference parity). Set True/False to override.
  zip_density_zero_init: Any = None
  # World pre-scale before the mip-360 contraction: ~1/far for bounded
  # metric scenes loaded without PCA normalization (keeps content inside
  # the unit ball); leave 1.0 for PCA-normalized unbounded scenes
  # (models/zipnerf.py scene_scale docstring).
  zip_scene_scale: float = 1.0
  # Initial density = softplus(bias). The reference's -1 (~0.31) makes
  # the INIT a near-opaque fog on long-ray geometries; more negative
  # values start transparent (models/zipnerf.py density_bias).
  zip_density_bias: float = -1.0
  # integrated-CP encoder (models/cpgrid.py)
  zip_cp_num_levels: int = 4
  zip_cp_level_dim: int = 16
  zip_cp_base_resolution: int = 128
  zip_cp_max_resolution: int = 1024
  zip_cp_anneal_frac: float = 0.0   # coarse-to-fine level window
  zip_cp_collapse: bool = True      # moment-matched multisample collapse
  zip_cp_pair_dim: int = 0          # rank-F2 pair products (tri-plane)
  zip_cp_init_smooth: float = 0.0   # low-pass sigma for factor init
  # > 0: bounded factor tables v = 1 + b tanh(v_raw/b) — structural cap
  # on CP product runaway (F>=64 stability; models/cpgrid.py)
  zip_cp_factor_bound: float = 0.0
  # CP feature output centering/scaling (models/cpgrid.py): zero-mean
  # and/or shrunk features at init — scene-b stability knobs (round 5)
  zip_cp_feature_center: bool = False
  zip_cp_feature_scale: float = 1.0
  # 'cp_hash': fine hash level(s) on the nerf MLP, per-interval or
  # per-multisample query (models/zipnerf.py cp_hash_* docs)
  zip_cp_hash_resolution: int = 2048
  zip_cp_hash_log2: int = 19
  zip_cp_hash_num_levels: int = 1
  zip_cp_hash_base_resolution: int = 512
  zip_cp_hash_per_sample: bool = False
  zip_cp_hash_use_spread: bool = True
  zip_cp_hash_dither: bool = False
  zip_cp_hash_split: int = 0
  # 'cp_tri': three dense fine 2D planes instead of the fine hash level
  # (models/triplane.py; shares the cp_hash_* query-mode flags)
  zip_cp_tri_resolution: int = 2048
  zip_cp_tri_level_dim: int = 4
  # grid/table params (hash or cp) train at this multiple of the base lr
  zip_encoder_lr_mult: float = 1.0
  # per-level encoder lr decay gamma^l (0 = off) and encoder-only grad
  # norm clip (0 = off): F>=64 stability knobs (train/zip_trainer.py)
  zip_encoder_level_lr_gamma: float = 0.0
  zip_encoder_grad_max_norm: float = 0.0
  # EMA of params for eval/render (0 = off); eval.py and the periodic
  # held-out renders read the EMA copy when maintained
  zip_ema_decay: float = 0.0
  zip_sample_n: int = 7
  zip_grid_num_levels: int = 10
  zip_log2_hashmap_size: int = 21
  zip_bottleneck_width: int = 256
  zip_prop_grid_resolutions: Any = (512, 2048)
  zip_nerf_grid_resolution: int = 8192
  # patch-quarter mixed batches + edge-aware smoothness (zipnerf
  # train.py:281-296, datasets.py:397-414); patch_size 1 = off (the
  # reference default; its shipped gin never raises it).
  zip_patch_size: int = 1
  zip_smoothness_loss_mult: float = 0.001
  zip_semantic_smoothness_loss_mult: float = 0.001
  # Mixed precision (reference AMP autocast, train.py:216-226): bf16 MXU
  # trunk, f32 heads/compositing. "float32" disables.
  zip_compute_dtype: str = "bfloat16"
  anti_interlevel_loss_mult: float = 0.01
  distortion_loss_mult: float = 0.005
  hash_decay_mult: float = 0.1
  zip_depth_loss_mult: float = 0.0
  zip_semantic_loss_mult: float = 0.04
  llffhold: int = 8
  # DTU (zipnerf datasets.py:1858-1934)
  dtu_light_cond: int = 2
  dtuhold: int = 8

  # --- eval ---
  lpips: bool = False              # optional perceptual metric (see
                                   # MetricHarness docstring)
  chunk: int = 4096
  # On-device lax.scan whole-image render (one dispatch instead of one
  # host round trip per chunk) — the TPU-first eval path; set False to
  # fall back to the reference-style chunked host loop.
  scan_render: bool = True
  # Tensor parallelism: shard the wide MLP trunks (+ hash table rows)
  # over a model mesh axis of this size (parallel/tp.py). 1 = pure data
  # parallel (the reference's only mode). Device count must divide.
  tp: int = 1
  render_factor: int = 0
  eval_test: bool = True
  eval_train: bool = False
  ckpt: int = -1                   # -1 = latest
  test_refine_iter: int = 0

  def exp_dir(self) -> str:
    return os.path.join(self.basedir, self.expname)

  # ---- adapters to the per-subsystem configs ----

  def model_config(self):
    import jax.numpy as jnp
    from snerf_tpu.models.mipnerf import MipNerfConfig
    t_transform = {0: "log", 1: "disparity", 2: "linear"}[self.transform_idx]
    return MipNerfConfig(
        num_samples=self.N_samples, num_fine=self.N_fine,
        resample_padding=0.01, use_viewdirs=self.use_viewdirs,
        lindisp=self.lindisp, ray_shape=self.ray_shape,
        max_deg_point=self.max_degree, deg_view=self.multires_views,
        density_noise=self.density_noise,
        disable_integration=self.disable_integration,
        no_warp_sample=self.no_warp_sample, warp_fn=self.fn,
        warp_radius=self.radius, t_transform=t_transform,
        hidden_layer=self.hidden_layer, rgb_layer=self.rgb_layer,
        proposal_hidden_layer=self.proposal_hidden_layer,
        encode_appearance=self.encode_appearance,
        semantic=self.semantic,
        semantic_class_num=self.semantic_class_num,
        compute_dtype=jnp.float32)

  def train_config(self):
    from snerf_tpu.train.trainer import TrainConfig
    return TrainConfig(
        n_rgb=self.N_rgb, n_iters=self.N_iters, lrate=self.lrate,
        lrate_final=self.lrate_final, lrate_delay_steps=self.lrate_delay,
        single_image=self.single_image, white_bkgd=self.white_bkgd,
        randomized=self.randomized, depth_loss=self.depth_loss,
        depth_lambda=self.depth_lambda,
        disparity_depth=self.disparity_depth,
        coarse_depth_mult=self.coarse_loss_mult,
        smooth_loss=self.smooth_loss, smooth_lambda=self.smooth_lambda,
        n_patch=self.N_patch, patch_sz=self.patch_sz,
        proposal_loss=self.proposal_loss,
        proposal_lambda=self.proposal_lambda,
        semantic=self.semantic, semantic_lambda=self.semantic_lambda,
        pose_refine=self.pose_refine, grad_max_norm=self.grad_max_norm,
        depth_conf=self.depth_conf, conf_num=self.conf_num,
        conf_tau=self.tau, conf_modes=self.conf_modes(),
        use_skymask_conf=self.skymask, ema_decay=self.ema_decay)

  def zip_model_config(self):
    import jax.numpy as jnp
    from snerf_tpu.models.zipnerf import ZipNerfConfig
    return ZipNerfConfig(
        compute_dtype=(jnp.bfloat16 if self.zip_compute_dtype
                       in ("bfloat16", "bf16") else jnp.float32),
        num_prop_samples=tuple(self.zip_num_prop_samples),
        num_nerf_samples=self.zip_num_nerf_samples,
        num_levels=len(tuple(self.zip_num_prop_samples)) + 1,
        num_glo_features=self.zip_glo_features,
        encoder_type=self.zip_encoder,
        ipe_density_width=self.zip_ipe_density_width,
        ipe_density_depth=self.zip_ipe_density_depth,
        ipe_max_deg=self.zip_ipe_max_deg,
        ipe_anneal_frac=self.zip_ipe_anneal_frac,
        ipe_anisotropic=self.zip_ipe_anisotropic,
        cp_anisotropic=self.zip_cp_anisotropic,
        ipe_skip_layer=self.zip_ipe_skip_layer,
        density_hidden_width=self.zip_density_hidden_width,
        # None = encoder-aware auto: ON for the cp-family encoders
        # (the measured F>=64 collapse cure, PERF.md round-4), OFF for
        # hash/ipe (reference parity).
        density_zero_init=(self.zip_encoder.startswith("cp")
                           if self.zip_density_zero_init is None
                           else bool(self.zip_density_zero_init)),
        scene_scale=self.zip_scene_scale,
        density_bias=self.zip_density_bias,
        cp_num_levels=self.zip_cp_num_levels,
        cp_level_dim=self.zip_cp_level_dim,
        cp_base_resolution=self.zip_cp_base_resolution,
        cp_max_resolution=self.zip_cp_max_resolution,
        cp_anneal_frac=self.zip_cp_anneal_frac,
        cp_collapse_multisamples=self.zip_cp_collapse,
        cp_pair_dim=self.zip_cp_pair_dim,
        cp_init_smooth=self.zip_cp_init_smooth,
        cp_factor_bound=self.zip_cp_factor_bound,
        cp_feature_center=self.zip_cp_feature_center,
        cp_feature_scale=self.zip_cp_feature_scale,
        cp_hash_resolution=self.zip_cp_hash_resolution,
        cp_hash_log2=self.zip_cp_hash_log2,
        cp_hash_num_levels=self.zip_cp_hash_num_levels,
        cp_hash_base_resolution=self.zip_cp_hash_base_resolution,
        cp_hash_per_sample=self.zip_cp_hash_per_sample,
        cp_hash_use_spread=self.zip_cp_hash_use_spread,
        cp_hash_dither=self.zip_cp_hash_dither,
        cp_hash_split=self.zip_cp_hash_split,
        cp_tri_resolution=self.zip_cp_tri_resolution,
        cp_tri_level_dim=self.zip_cp_tri_level_dim,
        sample_n=self.zip_sample_n,
        grid_num_levels=self.zip_grid_num_levels,
        grid_log2_hashmap_size=self.zip_log2_hashmap_size,
        bottleneck_width=self.zip_bottleneck_width,
        net_width_viewdirs=min(self.zip_bottleneck_width, 256),
        prop_grid_resolutions=tuple(self.zip_prop_grid_resolutions),
        nerf_grid_resolution=self.zip_nerf_grid_resolution,
        use_semantic=self.semantic, class_num=self.semantic_class_num)

  def zip_train_config(self):
    from snerf_tpu.train.zip_trainer import ZipTrainConfig
    # Encoder-aware lr defaults: 0.01 is the hash-table schedule
    # (reference config.gin); MLP-trunk encoders (ipe/cp) diverge above
    # ~2e-3 (PERF.md A/B: ipe 9.2 dB at 8e-3). Applied only when the
    # user left the flags at their dataclass defaults.
    lr_init, lr_final = self.zip_lr_init, self.zip_lr_final
    enc_mult = self.zip_encoder_lr_mult
    if self.zip_encoder != "hash":
      if lr_init == Config.zip_lr_init:
        lr_init = 0.002
      if lr_final == Config.zip_lr_final:
        lr_final = 0.0002
      if enc_mult == Config.zip_encoder_lr_mult:
        enc_mult = 4.0
    return ZipTrainConfig(
        batch_size=self.zip_batch_size, max_steps=self.zip_max_steps,
        lr_init=lr_init, lr_final=lr_final,
        lr_delay_steps=self.zip_lr_delay,
        anti_interlevel_loss_mult=self.anti_interlevel_loss_mult,
        distortion_loss_mult=self.distortion_loss_mult,
        hash_decay_mult=self.hash_decay_mult,
        depth_loss_mult=self.zip_depth_loss_mult,
        depth_complete=(self.dataset_type == "waymo"),
        semantic_loss_mult=self.zip_semantic_loss_mult if self.semantic
        else 0.0,
        patch_size=self.zip_patch_size,
        smoothness_loss_mult=self.zip_smoothness_loss_mult,
        semantic_smoothness_loss_mult=(
            self.zip_semantic_smoothness_loss_mult),
        encoder_lr_mult=enc_mult,
        encoder_level_lr_gamma=self.zip_encoder_level_lr_gamma,
        encoder_grad_max_norm=self.zip_encoder_grad_max_norm,
        ema_decay=self.zip_ema_decay,
        randomized=self.randomized)

  def conf_modes(self):
    """Confidence mode list (build_confidence_model confidence.py:171-181).
    The vgg mode activates when feature weights are available (plug-in
    contract, SURVEY §7 step 5 — pretrained VGG cannot be downloaded in a
    zero-egress build; snerf_tpu.models.features falls back to a seeded
    random feature pyramid when --vgg_loss is set without weights)."""
    modes = ["rgb", "ssim", "depth"]
    if self.vgg_loss:
      modes.append("vgg")
    if self.flow:
      modes.append("flow")
    return tuple(modes)


def _coerce(value: str) -> Any:
  """Parse a config-file / CLI value string into a python value."""
  s = value.strip()
  if s.lower() in ("true", "false"):
    return s.lower() == "true"
  if s.lower() in ("none", "null"):
    return None
  try:
    return ast.literal_eval(s)
  except (ValueError, SyntaxError):
    return s


# gin bindings (zipnerf configs/*.gin) -> Config fields. Unmapped gin
# keys are accepted and ignored with a warning (gin exposes ~100 knobs).
_GIN_MAP = {
    "Config.exp_name": "expname",
    "Config.data_dir": "datadir",
    "Config.dataset_loader": "dataset_type",
    "Config.near": None,   # zipnerf near/far are auto-scaled by the
    "Config.far": None,    # loader (datasets.py:836-841); ignored here
    "Config.factor": "factor",
    "Config.batch_size": "zip_batch_size",
    "Config.max_steps": "zip_max_steps",
    "Config.lr_init": "zip_lr_init",
    "Config.lr_final": "zip_lr_final",
    "Config.lr_delay_steps": "zip_lr_delay",
    "Config.render_chunk_size": "chunk",
    "Config.anti_interlevel_loss_mult": "anti_interlevel_loss_mult",
    "Config.distortion_loss_mult": "distortion_loss_mult",
    "Config.hash_decay_mults": "hash_decay_mult",
    "Config.use_semantic": "semantic",
    "Config.llffhold": "llffhold",
    "Model.num_nerf_samples": "zip_num_nerf_samples",
    "Model.num_prop_samples": "zip_num_prop_samples",
    "Model.num_glo_features": "zip_glo_features",
    "NerfMLP.class_num": "semantic_class_num",
}


def parse_gin_file(path: str) -> dict:
  """Minimal gin-binding reader for the reference's zipnerf .gin configs
  (`Class.field = value` lines) mapped onto our Config fields."""
  out = {"model": "zipnerf"}
  with open(path) as f:
    for line in f:
      line = line.split("#")[0].strip()
      if not line or "=" not in line:
        continue
      k, v = line.split("=", 1)
      k = k.strip()
      if k in _GIN_MAP:
        field = _GIN_MAP[k]
        if field is not None:
          out[field] = _coerce(v)
      # unknown gin bindings: accepted and ignored (raydist_fn,
      # opaque_background etc. are already the zip model defaults)
  return out


def parse_config_file(path: str) -> dict:
  """Parse YAML, gin, or reference-style `key = value` text configs."""
  if path.endswith(".gin"):
    return parse_gin_file(path)
  with open(path) as f:
    text = f.read()
  if path.endswith((".yaml", ".yml")):
    import yaml
    return yaml.safe_load(text) or {}
  out = {}
  for line in text.splitlines():
    line = line.split("#")[0].strip()
    if not line or "=" not in line:
      continue
    k, v = line.split("=", 1)
    out[k.strip()] = _coerce(v)
  return out


_FIELD_ALIASES = {
    # reference flag -> Config field (renames / merged flags)
    "i_weight": "i_weights",
    "raw_noise_std": "density_noise",
    "patch_size": "patch_sz",
    "coarse_depth_mult": "coarse_loss_mult",
    "no_batching": "single_image",
}

_IGNORED_FLAGS = {
    # accepted-and-ignored legacy flags (classic-NeRF / llff path knobs that
    # have dedicated fields elsewhere or no TPU meaning)
    "random_sample", "N_depth", "netdepth", "netwidth", "netdepth_fine",
    "netwidth_fine", "netchunk", "lrate_decay", "no_reload", "ft_path",
    "perturb", "i_embed", "multires", "render_only", "render_test",
    "render_test_ray", "render_train", "render_mypath", "precrop_iters",
    "precrop_frac", "testskip", "shape", "half_res", "no_ndc", "spherify",
    "i_img", "i_video", "debug", "alpha_model_path",
    "no_coarse", "train_scene", "test_scene", "colmap_depth",
    "weighted_loss", "relative_loss",
    "reg_loss", "reg_lambda", "weight_decay_mult", "distributed", "log",
    "translation", "conf_max", "load_poses",
    "far_bound", "no_reproj", "no_geometry", "render_sky", "half_test",
    "semantic_loss_type",
}


def load_config(argv: Optional[List[str]] = None,
                defaults: Optional[dict] = None) -> Config:
  """--config <file> first, then CLI --key value overrides."""
  import argparse
  parser = argparse.ArgumentParser(add_help=False)
  parser.add_argument("--config", type=str, default=None)
  known, rest = parser.parse_known_args(argv)

  values = dict(defaults or {})
  if known.config:
    values.update(parse_config_file(known.config))

  # CLI overrides: --key value or --key=value (value optional => True)
  i = 0
  while i < len(rest):
    tok = rest[i]
    if not tok.startswith("--"):
      raise ValueError(f"unexpected argument {tok!r}")
    tok = tok[2:]
    if "=" in tok:
      k, v = tok.split("=", 1)
      values[k] = _coerce(v)
      i += 1
    elif i + 1 < len(rest) and not rest[i + 1].startswith("--"):
      values[tok] = _coerce(rest[i + 1])
      i += 2
    else:
      values[tok] = True
      i += 1

  field_names = {f.name for f in dataclasses.fields(Config)}
  kwargs = {}
  for k, v in values.items():
    k = _FIELD_ALIASES.get(k, k)
    if k in field_names:
      kwargs[k] = v
    elif k in _IGNORED_FLAGS or k in _FIELD_ALIASES.values():
      continue
    else:
      raise ValueError(f"unknown config key {k!r}")
  cfg = Config(**kwargs)
  cfg.config = known.config
  return cfg


def load_config_with_snapshot(argv=None) -> Config:
  """load_config, but based on the experiment's args.txt snapshot
  (written by snapshot_config at train time) when one exists.

  Eval/render must rebuild the EXACT train-time state structure (e.g. a
  --depth_conf run adds conf_params/conf_opt_state to the checkpoint
  tree, --hidden_layer changes every kernel shape); the snapshot IS the
  fully-resolved train-time config, so it outranks the --config file
  (which the first pass only uses to locate basedir/expname — its other
  values were already folded into the snapshot at train time, and any
  later edits to it must not silently diverge from the checkpoint).
  Priority: fresh CLI flags > snapshot > --config file > defaults.
  """
  cfg = load_config(argv)
  snap = os.path.join(cfg.exp_dir(), "args.txt")
  if os.path.exists(snap):
    # re-parse with the snapshot as the base and WITHOUT the --config
    # file (its contents are already inside the snapshot).
    rest = []
    args = list(argv) if argv is not None else []
    i = 0
    while i < len(args):
      if args[i] == "--config":
        i += 2
        continue
      if args[i].startswith("--config="):
        i += 1
        continue
      rest.append(args[i])
      i += 1
    cfg = load_config(rest, defaults=parse_config_file(snap))
  return cfg


def snapshot_config(cfg: Config):
  """Dump resolved config + original file into the experiment dir
  (model_utils.py:72-81 parity: args.txt + config.txt)."""
  exp = cfg.exp_dir()
  os.makedirs(exp, exist_ok=True)
  with open(os.path.join(exp, "args.txt"), "w") as f:
    for field in sorted(dataclasses.fields(Config), key=lambda x: x.name):
      f.write(f"{field.name} = {getattr(cfg, field.name)}\n")
  if cfg.config and os.path.exists(cfg.config):
    with open(cfg.config) as src, \
         open(os.path.join(exp, "config.txt"), "w") as dst:
      dst.write(src.read())
