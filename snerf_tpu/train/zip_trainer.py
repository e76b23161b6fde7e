"""zip-nerf (S-NeRF++ background) training step.

Behavioral parity targets (re-derived):
  reference s-nerfpp/zipnerf/train.py:30-539 (loop: posenet warmup window,
  data charb + inverse-depth + semantic NLL + patch smoothness losses),
  internal/train_utils.py:55-243 (charb data loss, anti-interlevel with
  pulse widths [0.03, 0.003], distortion 0.005, hash decay 0.1, grad
  clip + nan scrub), internal/configs.py:60-85 (multipliers).

Same TPU architecture as trainer.py: one jitted step, on-device sampling,
data-mesh sharding; the hash tables are replicated (they fit HBM,
SURVEY §2.5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from snerf_tpu.data import sampler
from snerf_tpu.models.hashgrid import hash_decay_loss, make_grid_spec
from snerf_tpu.models.zipnerf import ZipNerfConfig, ZipNerfModel
from snerf_tpu.ops import math as smath
from snerf_tpu.train import losses as L


@dataclasses.dataclass(frozen=True)
class ZipTrainConfig:
  """zipnerf schedule (config.gin: 50k steps, batch 32768; configs.py)."""
  batch_size: int = 32768
  max_steps: int = 50_000
  lr_init: float = 0.01
  lr_final: float = 0.001
  lr_delay_steps: int = 5000
  lr_delay_mult: float = 1e-8
  adam_beta1: float = 0.9
  adam_beta2: float = 0.99
  adam_eps: float = 1e-15
  grad_max_norm: float = 0.001
  grad_max_val: float = 0.0
  # loss multipliers
  data_loss_mult: float = 1.0
  charb_padding: float = 0.001
  anti_interlevel_loss_mult: float = 0.01
  pulse_width: Tuple[float, ...] = (0.03, 0.003)
  distortion_loss_mult: float = 0.005
  hash_decay_mult: float = 0.1
  depth_loss_mult: float = 0.0       # inverse-depth loss (train.py:255-258)
  # Waymo depth-completion loss on masked (object) pixels
  # (train.py:262-273): |1/d - 1/gt| on depth>0 & mask, x depth_loss_mult
  # x 0.2. Enabled by the waymo dataset path.
  depth_complete: bool = False
  semantic_loss_mult: float = 0.04   # NLL x 0.04 (train.py:299-303)
  # patch-quarter mixed batches (datasets.py:397-414): when patch_size > 1,
  # a quarter of the batch is ps x ps patches used ONLY by the smoothness
  # losses below (and excluded from data/depth/semantic losses).
  patch_size: int = 1
  smoothness_loss_mult: float = 0.001           # smo_lam (train.py:283)
  semantic_smoothness_loss_mult: float = 0.001  # s_lam (train.py:284)
  # RefNeRF regularizers (train_utils.py:176-231); 0 = off (the shipped
  # waymo.gin disables density normals, so these are dormant by default)
  orientation_loss_mult: float = 0.0
  orientation_coarse_loss_mult: float = 0.0
  orientation_loss_target: str = "normals_pred"
  predicted_normal_loss_mult: float = 0.0
  predicted_normal_coarse_loss_mult: float = 0.0
  single_image: bool = False         # zipnerf samples across all images
  randomized: bool = True
  # posenet warmup window (zipnerf train.py:177-214: refine poses with a
  # dedicated optimizer only for start_step < s < end_step)
  pose_refine: bool = False
  pose_start_step: int = 1000
  pose_end_step: int = 10_000
  pose_lr: float = 1e-4
  # Per-group lr: grid/table params (hash 'grid' or cp 'cp_grid' modules)
  # train at encoder_lr_mult x the base schedule. Table-style params
  # tolerate (and want) hash-class lrs ~4x above what MLP trunks survive
  # (PERF.md round-2 A/B: ipe diverges at 8e-3, hash thrives there).
  encoder_lr_mult: float = 1.0
  # Per-level lr decay inside the CP/hash tables: level l trains at
  # encoder_lr_mult * gamma^l (fine levels see fewer samples per cell,
  # i.e. noisier per-row gradients — a candidate mechanism for the
  # F>=64 lr_delay=0 divergence). 0 disables (single 'grid' group).
  encoder_level_lr_gamma: float = 0.0
  # Separate norm clip on the encoder-table grads only, applied before
  # the global clip (isolates the table group's clipping from the
  # trunk's — with one global budget a hot table grad silently scales
  # down the trunk grads too). 0 disables.
  encoder_grad_max_norm: float = 0.0
  # Exponential moving average of params for eval (0 = off). Maintained
  # on-device inside the jitted step (one fused axpy over the param
  # pytree — negligible vs the fwd/bwd); renders/eval should read
  # eval_params(state). Step-warmed: d_t = min(d, (1+t)/(10+t)).
  ema_decay: float = 0.0
  # Stability diagnostics: add pre-clip grad norms (split grid/net with
  # the same label walk as the optimizer) to the step metrics. Two tree
  # reductions fused into the step — for probe scripts, off in prod.
  debug_grad_norms: bool = False


class ZipTrainState(flax.struct.PyTreeNode):
  step: jnp.ndarray
  params: Any
  opt_state: Any
  pose_params: Any = None
  pose_opt_state: Any = None
  ema_params: Any = None


def eval_params(state):
  """Params to render/eval with: the EMA copy when maintained.

  Accepts any train-state pytree (the mip TrainState has no EMA)."""
  ema = getattr(state, "ema_params", None)
  return state.params if ema is None else ema


def make_zip_lr_schedule(cfg: ZipTrainConfig):
  import functools
  return functools.partial(
      smath.learning_rate_decay, lr_init=cfg.lr_init,
      lr_final=cfg.lr_final, max_steps=cfg.max_steps,
      lr_delay_steps=cfg.lr_delay_steps, lr_delay_mult=cfg.lr_delay_mult)


def estimate_hash_rays_per_sec(model_cfg: ZipNerfConfig,
                               cfg: ZipTrainConfig) -> float:
  """Predicted rays/s of the hash encoder on a gather-bound TPU.

  The v5e primitive survey (PERF.md) measured the XLA row gather at
  ~169 M idx/s and the backward scatter-add at ~20 M idx/s effective,
  both serial-unit-bound (independent of table size); the end-to-end
  zip hash step lands within 10% of the prediction from these rates.
  """
  samples = (sum(model_cfg.num_prop_samples) + model_cfg.num_nerf_samples)
  gathers = (cfg.batch_size * samples * model_cfg.sample_n * 8
             * model_cfg.grid_num_levels)
  t = gathers / 169e6 + gathers / 20e6
  return cfg.batch_size / t


def maybe_warn_hash_on_tpu(model_cfg: ZipNerfConfig,
                           cfg: ZipTrainConfig,
                           platform: str = None) -> str:
  """Loud chip-aware caveat (VERDICT r2 weak #2): zip_encoder=hash at a
  budget that maps to <1k rays/s on a SparseCore-less TPU is a
  multi-week configuration; say so before committing the user to it.
  Returns the warning string (also printed), or '' if fine."""
  if model_cfg.encoder_type != "hash":
    return ""
  if platform is None:
    import jax
    platform = jax.devices()[0].platform
  if platform not in ("tpu", "axon"):
    return ""
  rps = estimate_hash_rays_per_sec(model_cfg, cfg)
  if rps >= 1000:
    return ""
  days = cfg.max_steps * cfg.batch_size / rps / 86400
  msg = (
      f"WARNING: zip_encoder='hash' at this sample budget is predicted to "
      f"run ~{rps:,.0f} rays/s on this TPU (gather/scatter-unit bound; "
      f"PERF.md primitive survey) — ~{days:,.1f} days for "
      f"{cfg.max_steps:,} steps. TPU-fast encoders behind the same API: "
      f"--zip_encoder ipe (~52k rays/s) or --zip_encoder cp_ipe "
      f"(integrated-CP grid; see configs/waymo_zipnerf_tpu). "
      f"On SparseCore parts (v5p/v6e) the hash path is the "
      f"quality-parity choice.")
  print(msg, flush=True)
  return msg


def _make_tx(cfg: ZipTrainConfig):
  base = make_zip_lr_schedule(cfg)
  adam = lambda mult: optax.adam(
      learning_rate=lambda step: mult * base(step),
      b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_eps)
  gamma = cfg.encoder_level_lr_gamma
  if cfg.encoder_lr_mult == 1.0 and gamma <= 0:
    return adam(1.0)

  import re
  lvl_re = re.compile(r"^[vp](\d+)$")

  def label_fn(params):
    def walk(tree, in_grid):
      if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
          m = lvl_re.match(str(k)) if (in_grid and gamma > 0) else None
          if m is not None and not isinstance(v, dict):
            out[k] = f"grid{min(int(m.group(1)), 7)}"
          else:
            out[k] = walk(v, in_grid or k in ("grid", "cp_grid"))
        return out
      return "grid" if in_grid else "net"
    return walk(params, False)

  txs = {"grid": adam(cfg.encoder_lr_mult), "net": adam(1.0)}
  if gamma > 0:
    for l in range(8):
      txs[f"grid{l}"] = adam(cfg.encoder_lr_mult * gamma ** l)
  return optax.multi_transform(txs, label_fn)


def create_zip_train_state(key, model_cfg: ZipNerfConfig,
                           cfg: ZipTrainConfig,
                           num_images: int = 0):
  from snerf_tpu.models.zipnerf import init_zipnerf
  model, variables = init_zipnerf(key, model_cfg)
  params = variables["params"]
  tx = _make_tx(cfg)
  state = ZipTrainState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=tx.init(params))
  if cfg.ema_decay > 0:
    # distinct buffers, NOT an alias of params: the train step donates
    # the whole state, and XLA rejects donating the same buffer twice
    state = state.replace(
        ema_params=jax.tree_util.tree_map(jnp.copy, params))
  if cfg.pose_refine and num_images > 0:
    from snerf_tpu.models.posenet import LearnPose
    pose_model = LearnPose(num_cams=num_images)
    pose_vars = pose_model.init(jax.random.fold_in(key, 7),
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 3, 4)))
    pose_tx = optax.sgd(cfg.pose_lr)  # zipnerf uses SGD for the posenet
    state = state.replace(pose_params=pose_vars["params"],
                          pose_opt_state=pose_tx.init(pose_vars["params"]))
  return model, state


def _grid_specs(model_cfg: ZipNerfConfig):
  """(param path, GridSpec) for every hash table in the model."""
  if getattr(model_cfg, "encoder_type", "hash") != "hash":
    return []  # IPE backbone has no tables (no hash-decay loss)
  specs = []
  for i, res in enumerate(model_cfg.prop_grid_resolutions
                          [:model_cfg.num_levels - 1]):
    specs.append((f"prop_mlp_{i}", make_grid_spec(
        model_cfg.grid_num_levels, model_cfg.prop_grid_level_dim,
        model_cfg.grid_base_resolution, res,
        model_cfg.grid_log2_hashmap_size)))
  specs.append(("nerf_mlp", make_grid_spec(
      model_cfg.grid_num_levels, model_cfg.nerf_grid_level_dim,
      model_cfg.grid_base_resolution, model_cfg.nerf_grid_resolution,
      model_cfg.grid_log2_hashmap_size)))
  return specs


def make_zip_train_step(model: ZipNerfModel,
                        model_cfg: ZipNerfConfig,
                        cfg: ZipTrainConfig,
                        device_scene: dict,
                        i_train,
                        near: float,
                        far: float,
                        donate: bool = True,
                        mesh=None):
  tx = _make_tx(cfg)
  i_train = jnp.asarray(i_train, jnp.int32)
  specs = _grid_specs(model_cfg)
  pose_model = None
  pose_tx = None
  if cfg.pose_refine:
    from snerf_tpu.models.posenet import LearnPose
    pose_model = LearnPose(num_cams=device_scene["poses"].shape[0])
    pose_tx = optax.sgd(cfg.pose_lr)
  init_poses = device_scene["poses"]

  # patch-quarter mixed batches (datasets.py:397-414): ~1/4 of the rays are
  # ps x ps patches, appended after the random pixels.
  ps = cfg.patch_size
  n_patches = (cfg.batch_size // 4) // (ps * ps) if ps > 1 else 0
  n_patch_rays = n_patches * ps * ps
  n_pix = cfg.batch_size - n_patch_rays

  # device_scene is threaded through the jit as an ARGUMENT (bound by
  # functools.partial below): as a closure constant the whole scene
  # lowers into the HLO program body, which the tunneled TPU's
  # remote-compile endpoint rejects at real scene sizes (PERF.md).
  def loss_fn(device_scene, params, pose_params, key, train_frac,
              depth_on):
    k_sample, k_model = jax.random.split(key)
    pose_table = init_poses
    if pose_model is not None:
      pose_table = pose_model.apply(
          {"params": pose_params},
          jnp.arange(init_poses.shape[0]), init_poses)
    rays, targets = sampler.sample_batch(
        k_sample, device_scene, i_train, n_pix, near, far,
        single_image=cfg.single_image, n_patches=n_patches,
        patch_size=ps, use_pose_table=pose_table)
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      sh = NamedSharding(mesh, P(mesh.axis_names[0]))
      constrain = lambda x: jax.lax.with_sharding_constraint(x, sh)
      rays = jax.tree_util.tree_map(constrain, rays)
      targets = jax.tree_util.tree_map(constrain, targets)

    renderings, ray_history = model.apply(
        {"params": params}, rays,
        rng=k_model if cfg.randomized else None,
        train_frac=train_frac)
    final = renderings[-1]

    # mask_rgb logic (zipnerf train.py:231-249): the data/depth/semantic
    # losses exclude object-masked pixels AND the patch quarter; patches
    # feed only the smoothness losses.
    total_rays = n_pix + n_patch_rays
    pix_part = jnp.arange(total_rays) < n_pix
    objmask = targets.get("skymask")  # True = masked (object / padding)
    mask_rgb = pix_part if objmask is None else (pix_part & ~objmask)
    data = L.charbonnier_loss(final["rgb"], targets["rgb"],
                              mask=mask_rgb[..., None],
                              padding=cfg.charb_padding)
    total = cfg.data_loss_mult * data
    metrics = {"loss_data": data,
               "psnr": smath.mse_to_psnr(L.masked_mean(
                   (final["rgb"] - targets["rgb"]) ** 2,
                   mask_rgb[..., None]))}

    # anti-aliased interlevel (train_utils.py:132-164)
    if cfg.anti_interlevel_loss_mult > 0:
      c = jax.lax.stop_gradient(ray_history[-1]["sdist"])
      w = jax.lax.stop_gradient(ray_history[-1]["weights"])
      il = 0.0
      for i, rh in enumerate(ray_history[:-1]):
        il = il + L.interlevel_loss_anti(
            rh["sdist"], rh["weights"], c, w,
            blur_r=cfg.pulse_width[min(i, len(cfg.pulse_width) - 1)],
            weight=1.0)
      il = il * cfg.anti_interlevel_loss_mult
      total = total + il
      metrics["loss_interlevel"] = il

    if cfg.distortion_loss_mult > 0:
      dist = L.distortion_loss(ray_history[-1]["sdist"],
                               ray_history[-1]["weights"],
                               weight=cfg.distortion_loss_mult)
      total = total + dist
      metrics["loss_distortion"] = dist

    if cfg.orientation_loss_mult > 0 or cfg.orientation_coarse_loss_mult > 0:
      # RefNeRF orientation regularizer (train_utils.py:176-193):
      # penalize normals facing away from the camera
      ol = 0.0
      v = -rays.viewdirs
      for i, rh in enumerate(ray_history):
        n = rh.get(cfg.orientation_loss_target)
        if n is None:
          continue
        n_dot_v = (n * v[..., None, :]).sum(axis=-1)
        term = jnp.mean(jnp.sum(
            rh["weights"] * jnp.maximum(n_dot_v, 0.0) ** 2, axis=-1))
        mult = (cfg.orientation_coarse_loss_mult
                if i < len(ray_history) - 1 else cfg.orientation_loss_mult)
        ol = ol + mult * term
      total = total + ol
      metrics["loss_orientation"] = ol

    if (cfg.predicted_normal_loss_mult > 0 or
        cfg.predicted_normal_coarse_loss_mult > 0):
      # predicted-normal supervision (train_utils.py:215-231)
      pnl = 0.0
      for i, rh in enumerate(ray_history):
        n, npred = rh.get("normals"), rh.get("normals_pred")
        if n is None or npred is None:
          continue
        term = jnp.mean(jnp.sum(
            rh["weights"] * (1.0 - jnp.sum(n * npred, axis=-1)), axis=-1))
        mult = (cfg.predicted_normal_coarse_loss_mult
                if i < len(ray_history) - 1
                else cfg.predicted_normal_loss_mult)
        pnl = pnl + mult * term
      total = total + pnl
      metrics["loss_predicted_normals"] = pnl

    if cfg.hash_decay_mult > 0 and specs:
      hd = 0.0
      for name, spec in specs:
        hd = hd + hash_decay_loss(params[name]["grid"]["table"], spec,
                                  weight=1.0)
      hd = hd * cfg.hash_decay_mult
      total = total + hd
      metrics["loss_hash_decay"] = hd

    if cfg.depth_loss_mult > 0 and "depth" in targets:
      # inverse-depth L1 (zipnerf train.py:255-258,276-278); gated off
      # inside the pose-refine window (train.py:256 dep_lam = 0), masked
      # to unpatched, unmasked pixels with valid depth.
      eps = 1e-5
      err = jnp.abs(1.0 / (final["depth"] + eps) -
                    1.0 / (targets["depth"] + eps))
      dl = L.masked_mean(err, (targets["depth"] > 0) & mask_rgb)
      total = total + cfg.depth_loss_mult * depth_on * dl
      metrics["loss_depth"] = dl

      if cfg.depth_complete and objmask is not None:
        # Waymo depth-completion on masked objects (train.py:262-273):
        # depth>0 & mask & not-patch, x dep_lam x 0.2.
        com_mask = (targets["depth"] > 0) & objmask & pix_part
        dcl = L.masked_mean(err, com_mask)
        total = total + cfg.depth_loss_mult * 0.2 * dcl
        metrics["loss_depth_complete"] = dcl

    if cfg.semantic_loss_mult > 0 and "semantic" in targets and \
        final.get("semantic") is not None:
      # NLL on composited softmax probabilities (train.py:299-303) over
      # mask_rgb (sem_mask = mask_rgb, train.py:300); labels < 0
      # (unlabeled images) also masked out
      probs = jnp.clip(final["semantic"], 1e-6, 1.0)
      lab = targets["semantic"].astype(jnp.int32)
      labeled = (lab >= 0) & mask_rgb
      nll = -jnp.log(jnp.take_along_axis(
          probs, jnp.maximum(lab, 0)[..., None], axis=-1))[..., 0]
      sl = cfg.semantic_loss_mult * L.masked_mean(nll, labeled)
      total = total + sl
      metrics["loss_semantic"] = sl

    if n_patches > 0:
      # edge-aware patch smoothness (train.py:281-296): inverse-depth and
      # semantic maps, on the patch quarter, masked pixels excluded.
      pshape = (n_patches, ps, ps)
      rgb_p = targets["rgb"][n_pix:].reshape(*pshape, 3)
      valid_p = None
      if objmask is not None:
        valid_p = (~objmask[n_pix:]).reshape(pshape)
      if cfg.smoothness_loss_mult > 0:
        dep_p = final["depth"][n_pix:].reshape(pshape)
        sm = L.zip_smooth_loss(rgb_p, dep_p, valid_p,
                               weight=cfg.smoothness_loss_mult)
        sm = jnp.nan_to_num(sm)
        total = total + sm
        metrics["loss_smooth"] = sm
      if (cfg.semantic_smoothness_loss_mult > 0 and
          final.get("semantic") is not None):
        sem_p = final["semantic"][n_pix:].reshape(
            *pshape, final["semantic"].shape[-1])
        ssm = L.zip_semantic_smooth_loss(
            rgb_p, sem_p, valid_p,
            weight=cfg.semantic_smoothness_loss_mult)
        ssm = jnp.nan_to_num(ssm)
        total = total + ssm
        metrics["loss_semantic_smooth"] = ssm

    metrics["loss"] = total
    return total, metrics

  def train_step(device_scene, state: ZipTrainState, key):
    lf = functools.partial(loss_fn, device_scene)
    train_frac = jnp.clip(state.step / cfg.max_steps, 0.0, 1.0)
    # the inverse-depth loss is disabled inside the pose-refine window
    # (train.py:256: dep_lam = 0 while refining poses)
    depth_on = 1.0
    if cfg.pose_refine:
      in_window = ((state.step > cfg.pose_start_step) &
                   (state.step < cfg.pose_end_step))
      depth_on = 1.0 - in_window.astype(jnp.float32)
    if pose_model is not None:
      (_, metrics), (grads, pose_grads) = jax.value_and_grad(
          lf, argnums=(0, 1), has_aux=True)(
              state.params, state.pose_params, key, train_frac, depth_on)
    else:
      (_, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
          state.params, state.pose_params, key, train_frac, depth_on)
      pose_grads = None
    if cfg.debug_grad_norms:
      def group_sq(tree, in_grid):
        tot = {"grid": 0.0, "net": 0.0}
        for k, v in tree.items():
          if isinstance(v, dict):
            sub = group_sq(v, in_grid or k in ("grid", "cp_grid"))
            tot = {g: tot[g] + sub[g] for g in tot}
          else:
            g = "grid" if (in_grid or k in ("grid", "cp_grid")) else "net"
            tot[g] = tot[g] + jnp.sum(jnp.square(v))
        return tot
      sq = group_sq(grads, False)
      metrics["gnorm_grid"] = jnp.sqrt(sq["grid"])
      metrics["gnorm_net"] = jnp.sqrt(sq["net"])
    if cfg.encoder_grad_max_norm > 0:
      def walk_scale(tree, in_grid, s):
        return {k: (walk_scale(v, in_grid or k in ("grid", "cp_grid"), s)
                    if isinstance(v, dict)
                    else (v * s if (in_grid or k in ("grid", "cp_grid"))
                          else v))
                for k, v in tree.items()}
      def walk_sq(tree, in_grid):
        tot = 0.0
        for k, v in tree.items():
          ig = in_grid or k in ("grid", "cp_grid")
          tot = tot + (walk_sq(v, ig) if isinstance(v, dict)
                       else (jnp.sum(jnp.square(v)) if ig else 0.0))
        return tot
      gn = jnp.sqrt(walk_sq(grads, False))
      s = jnp.minimum(1.0, cfg.encoder_grad_max_norm / (gn + 1e-12))
      grads = walk_scale(grads, False, s)
    grads = smath.clip_gradients(
        grads,
        max_val=cfg.grad_max_val if cfg.grad_max_val > 0 else None,
        max_norm=cfg.grad_max_norm if cfg.grad_max_norm > 0 else None)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    state = state.replace(step=state.step + 1, params=new_params,
                          opt_state=new_opt)
    if cfg.ema_decay > 0 and state.ema_params is not None:
      t = state.step.astype(jnp.float32)
      d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
      state = state.replace(ema_params=jax.tree_util.tree_map(
          lambda e, p: d * e + (1.0 - d) * p, state.ema_params,
          new_params))
    if pose_model is not None:
      # gate pose updates to the warmup window (train.py:177-214)
      in_window = ((state.step > cfg.pose_start_step) &
                   (state.step < cfg.pose_end_step)).astype(jnp.float32)
      pose_grads = jax.tree_util.tree_map(
          lambda g: jnp.nan_to_num(g) * in_window, pose_grads)
      p_updates, new_pose_opt = pose_tx.update(
          pose_grads, state.pose_opt_state, state.pose_params)
      state = state.replace(
          pose_params=optax.apply_updates(state.pose_params, p_updates),
          pose_opt_state=new_pose_opt)
    return state, metrics

  donate_argnums = (1,) if donate else ()
  return functools.partial(
      jax.jit(train_step, donate_argnums=donate_argnums), device_scene)
