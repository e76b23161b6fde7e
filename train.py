#!/usr/bin/env python
"""S-NeRF training CLI: `python train.py --config <file> [--key value ...]`.

Behavioral parity target: reference s-nerf/train.py:29-300 (config parse,
dataset load, model/pose/conf build, resume, hot loop with losses, periodic
logging + checkpointing). TPU-native: the hot loop is ONE jitted step over
a data mesh; the scene lives in HBM; logging/checkpointing are async.
"""

from __future__ import annotations

import functools
import os
import sys
import time


def build_mesh_and_place(cfg, state, resumed: bool):
  """Device mesh from config (+ state placement).

  --tp N > 1 builds a 2-D (data, model) mesh and shards the wide MLP /
  hash table over the model axis (parallel/tp.py — a TPU extension, the
  reference has no TP). Otherwise a 1-D data mesh; on resume the
  orbax-restored (device-0) state is re-replicated over it.
  """
  import jax
  n = len(jax.devices())
  if n <= 1:
    if resumed:
      # host-restored (numpy) state -> one batched transfer now, so the
      # first step doesn't pay an implicit per-leaf conversion
      state = jax.device_put(state)
    return None, state
  tp = max(int(getattr(cfg, "tp", 1) or 1), 1)
  if tp > 1:
    if n % tp:
      raise ValueError(f"--tp {tp} does not divide {n} devices")
    from snerf_tpu.parallel import make_mesh_2d, shard_state
    mesh = make_mesh_2d(n // tp, tp)
    return mesh, shard_state(state, mesh)
  from snerf_tpu.parallel import make_mesh, replicate_sharding
  mesh = make_mesh()
  if resumed:
    # orbax restores onto device 0; replicate over the mesh so the
    # sharded step accepts it
    state = jax.device_put(state, replicate_sharding(mesh))
  return mesh, state


def load_scene(cfg):
  if cfg.dataset_type == "synthetic":
    from snerf_tpu.data import make_synthetic_scene
    return make_synthetic_scene(num_images=max(6, cfg.cam_num),
                                H=cfg.H, W=cfg.W, datahold=cfg.datahold)
  elif cfg.dataset_type == "nuscenes":
    from snerf_tpu.data.scene import load_nuscenes_scene
    return load_nuscenes_scene(
        cfg.datadir, bd_factor=cfg.bds_factor, cam_num=cfg.cam_num,
        datahold=cfg.datahold, sky_mask=cfg.skymask,
        load_depth=cfg.depth_loss or cfg.near_far,
        load_semantic=cfg.semantic, no_align=cfg.no_align,
        colmap=cfg.colmap)
  elif cfg.dataset_type == "waymo":
    from snerf_tpu.data.waymo import load_waymo_scene
    return load_waymo_scene(cfg.datadir, llffhold=cfg.llffhold,
                            factor=cfg.factor,
                            load_semantic=cfg.semantic)
  elif cfg.dataset_type == "llff":
    from snerf_tpu.data.llff import load_llff_scene
    return load_llff_scene(cfg.datadir, factor=max(cfg.factor, 1),
                           llffhold=cfg.llffhold,
                           block_bg=cfg.block_bg,
                           car_sample_n=cfg.car_sample_n)
  elif cfg.dataset_type == "dtu":
    from snerf_tpu.data.dtu import load_dtu_scene
    return load_dtu_scene(cfg.datadir, factor=max(cfg.factor, 1),
                          dtu_light_cond=cfg.dtu_light_cond,
                          dtuhold=cfg.dtuhold)
  elif cfg.dataset_type == "tnt":
    from snerf_tpu.data.tnt import load_tnt_scene
    return load_tnt_scene(cfg.datadir)
  else:
    raise ValueError(f"unknown dataset_type {cfg.dataset_type!r}")


def main(argv=None):
  import jax
  import numpy as np

  from snerf_tpu.config import load_config, snapshot_config
  from snerf_tpu.data.sampler import scene_to_device

  from snerf_tpu.train import checkpoints as ckpt_lib
  from snerf_tpu.train.trainer import create_train_state, make_train_step

  cfg = load_config(argv)
  snapshot_config(cfg)
  exp_dir = cfg.exp_dir()
  ckpt_dir = os.path.join(exp_dir, "checkpoints")

  scene = load_scene(cfg)
  if cfg.half_train and scene.i_train is not None:
    scene.i_train = scene.i_train[::2]
  if cfg.fulltrain:
    scene.i_train = np.arange(scene.num_images)
  dev_scene = scene_to_device(scene)

  if cfg.model == "zipnerf":
    return train_zipnerf(cfg, scene, dev_scene, exp_dir, ckpt_dir)

  tcfg = cfg.train_config()
  model, pose_model, state = build_model_state(cfg, tcfg,
                                               scene.num_images)

  start_step = 0
  if cfg.resume:
    state, restored = ckpt_lib.restore_checkpoint(ckpt_dir, state,
                                                  host=True)
    if restored is not None:
      start_step = int(restored)
      print(f"resumed from step {start_step}")

  conf_maps = None
  if cfg.depth_conf and scene.depths is not None:
    from snerf_tpu.models.confidence import precompute_conf_maps
    feature_fn = None
    if cfg.vgg_loss:
      from snerf_tpu.models.features import make_feature_fn
      feature_fn = make_feature_fn()
    print(f"precomputing confidence maps ({tcfg.conf_modes}) ...")
    conf_maps = precompute_conf_maps(
        tcfg.conf_modes, scene, conf_num=cfg.conf_num, tau=cfg.tau,
        feature_fn=feature_fn)
    print(f"conf maps: {conf_maps.shape} {conf_maps.dtype}")

  from snerf_tpu.utils.logging import ExperimentLogger
  logger = ExperimentLogger(exp_dir)
  mesh, state = build_mesh_and_place(cfg, state, resumed=start_step > 0)
  ctx = mesh or _nullcontext()
  with ctx:
    unroll = max(int(cfg.unroll_steps), 1)
    if unroll > 1:
      from snerf_tpu.train.trainer import make_train_loop
      raw = make_train_step(model, pose_model, tcfg, dev_scene,
                            scene.i_train, scene.near, scene.far,
                            mesh=mesh, conf_maps=conf_maps, jit=False)
      loop_fn = make_train_loop(raw, unroll, donate=True)
      step_fn = None
    else:
      step_fn = make_train_step(model, pose_model, tcfg, dev_scene,
                                scene.i_train, scene.near, scene.far,
                                mesh=mesh, conf_maps=conf_maps)
    key = jax.random.PRNGKey(start_step + 1)
    t0 = time.perf_counter()
    rays_done = 0
    metrics = {}
    i = start_step
    prof = _ProfileWindow(cfg, exp_dir)
    for i in range(start_step + unroll, cfg.N_iters + 1, unroll):
      prof.tick(i)
      key, k = jax.random.split(key)
      if unroll > 1:
        state, metrics = loop_fn(state, k)
      else:
        state, metrics = step_fn(state, k)
      rays_done += cfg.N_rgb * unroll
      if i % cfg.i_print == 0:
        m = {k_: float(v) for k_, v in metrics.items()}
        dt = time.perf_counter() - t0
        rps = rays_done / dt
        print(f"[{i}] loss={m['loss']:.5f} psnr={m.get('psnr', 0):.2f} "
              f"rays/sec={rps:.0f}")
        logger.scalars(i, {"rays_per_sec": rps, **m})
        # parity: confidence-lambda + pose-rotation histograms
        # (reference train.py:225-241)
        if state.conf_params is not None:
          logger.histogram(i, "confidence_lambdas",
                           state.conf_params["lambdas"])
        if state.pose_params is not None:
          logger.histogram(i, "pose_rotations", state.pose_params["r"])
        t0 = time.perf_counter()
        rays_done = 0
      if cfg.i_testset > 0 and i % cfg.i_testset == 0 and \
          len(scene.i_test):
        from snerf_tpu.train.zip_trainer import eval_params
        psnr, img = _eval_one_view(model, eval_params(state), scene, cfg)
        print(f"[{i}] test view PSNR = {psnr:.2f}")
        logger.scalars(i, {"test_psnr": psnr})
        logger.image(i, "test_render", img)
      if i % cfg.i_weights == 0 or i == cfg.N_iters:
        ckpt_lib.save_checkpoint(ckpt_dir, state, i, keep=cfg.ckpt_keep,
                                 wait=(i == cfg.N_iters))
        if state.pose_params is not None:
          # separate pose-net checkpoint stream (reference
          # train.py:275-280)
          ckpt_lib.save_pose_checkpoint(exp_dir, state.pose_params, i,
                                        keep=cfg.ckpt_keep,
                                        wait=(i == cfg.N_iters))
        print(f"saved checkpoint at step {i}")
    prof.close()
  logger.close()
  return state


def _render_one_test_view(render_fn, scene, cfg):
  """Shared core of the periodic in-training evals (reference
  train_render_every, zipnerf/train.py:458-476): render the first
  held-out view, return (psnr, rgb image).

  Large images render downscaled (render_factor, else 4x) — the
  periodic eval is a progress signal, not the final metric, and a
  full-res frame over the tunneled chip stalls training for minutes.
  """
  import jax.numpy as jnp
  import numpy as np

  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.train.renderer import render_image

  ti = int(scene.i_test[0])
  H, W = scene.hw
  rf = 0
  if H * W > 128 * 128:
    rf = cfg.render_factor if cfg.render_factor > 1 else 4
  rays = rays_for_image(
      jnp.asarray(scene.poses[ti]), jnp.asarray(scene.intrinsics[ti]),
      H, W, scene.near, scene.far, render_factor=rf)
  out = render_image(render_fn, rays, chunk=cfg.chunk)
  gt = scene.images[ti].astype(np.float32) / 255.0
  if out["rgb"].shape[:2] != gt.shape[:2]:
    import cv2
    gt = cv2.resize(gt, (out["rgb"].shape[1], out["rgb"].shape[0]))
  mse = float(np.mean((np.asarray(out["rgb"]) - gt) ** 2))
  return -10.0 * np.log10(max(mse, 1e-10)), np.clip(out["rgb"], 0, 1)


def _eval_one_view(model, params, scene, cfg):
  """One held-out mip-model view during training; params passed as an
  argument (not baked in) so the SAME compile serves every periodic
  eval of the run."""
  import functools

  from snerf_tpu.train.renderer import make_param_render_fn

  render_fn = functools.partial(
      make_param_render_fn(model, cfg.white_bkgd), params)
  return _render_one_test_view(render_fn, scene, cfg)


def build_model_state(cfg, tcfg, num_images, seed: int = 0):
  """Model family dispatch shared by train/eval/render CLIs."""
  import jax
  from snerf_tpu.train.trainer import create_train_state

  if cfg.model == "classic":
    from snerf_tpu.models.classic import (
        ClassicNerfAdapter, ClassicNerfConfig)
    mcfg = ClassicNerfConfig(
        n_samples=cfg.N_samples, n_importance=cfg.N_importance,
        multires_views=cfg.multires_views,
        use_viewdirs=cfg.use_viewdirs, raw_noise_std=cfg.density_noise,
        white_bkgd=cfg.white_bkgd, lindisp=cfg.lindisp)
    return create_train_state(
        jax.random.PRNGKey(seed), mcfg, tcfg, num_images,
        model=ClassicNerfAdapter(config=mcfg))
  mcfg = cfg.model_config()
  return create_train_state(jax.random.PRNGKey(seed), mcfg, tcfg,
                            num_images)


def train_zipnerf(cfg, scene, dev_scene, exp_dir, ckpt_dir):
  """zip-nerf (S-NeRF++ background) training path
  (parity: s-nerfpp/zipnerf/train.py main loop)."""
  import jax

  from snerf_tpu.train import checkpoints as ckpt_lib
  from snerf_tpu.train.zip_trainer import (
      create_zip_train_state, eval_params, make_zip_train_step)

  from snerf_tpu.utils.logging import ExperimentLogger

  mcfg = cfg.zip_model_config()
  tcfg = cfg.zip_train_config()
  from snerf_tpu.train.zip_trainer import maybe_warn_hash_on_tpu
  maybe_warn_hash_on_tpu(mcfg, tcfg)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
  logger = ExperimentLogger(exp_dir)

  start_step = 0
  if cfg.resume:
    state, restored = ckpt_lib.restore_checkpoint(ckpt_dir, state,
                                                  host=True)
    if restored is not None:
      start_step = int(restored)
      print(f"resumed from step {start_step}")

  mesh, state = build_mesh_and_place(cfg, state, resumed=start_step > 0)
  ctx = mesh or _nullcontext()
  with ctx:
    step_fn = make_zip_train_step(model, mcfg, tcfg, dev_scene,
                                  scene.i_train, scene.near, scene.far,
                                  mesh=mesh)
    key = jax.random.PRNGKey(start_step + 1)
    t0 = time.perf_counter()
    rays_done = 0
    prof = _ProfileWindow(cfg, exp_dir)
    for i in range(start_step + 1, tcfg.max_steps + 1):
      prof.tick(i)
      key, k = jax.random.split(key)
      state, metrics = step_fn(state, k)
      rays_done += tcfg.batch_size
      if i % cfg.i_print == 0:
        m = {k_: float(v) for k_, v in metrics.items()}
        dt = time.perf_counter() - t0
        rps = rays_done / dt
        print(f"[{i}] loss={m['loss']:.5f} psnr={m.get('psnr', 0):.2f} "
              f"rays/sec={rps:.0f}")
        # train_rays_per_sec is the reference's TB metric of record
        # (zipnerf train.py:356-358,400); the logger mirrors to
        # train_log.jsonl
        logger.scalars(i, {"rays_per_sec": rps, **m})
        t0 = time.perf_counter()
        rays_done = 0
      if cfg.i_testset > 0 and i % cfg.i_testset == 0 and \
          len(scene.i_test):
        psnr = _zip_eval_one_view(mcfg, eval_params(state), scene, cfg)
        print(f"[{i}] test view PSNR = {psnr:.2f}")
        logger.scalars(i, {"test_psnr": psnr})
        t0 = time.perf_counter()
        rays_done = 0
      if i % cfg.i_weights == 0 or i == tcfg.max_steps:
        ckpt_lib.save_checkpoint(ckpt_dir, state, i, keep=cfg.ckpt_keep,
                                 wait=(i == tcfg.max_steps))
        print(f"saved checkpoint at step {i}")
    prof.close()
  logger.close()
  return state


class _ProfileWindow:
  """jax.profiler trace over ~profile_steps training steps starting at
  the first loop tick >= profile_start (SURVEY.md §5.1) — traces land
  in <exp_dir>/profile for TensorBoard/xprof. Tick indices may stride
  by unroll_steps, so the window anchors on the first tick actually
  seen instead of assuming every step index is visited."""

  def __init__(self, cfg, exp_dir):
    self.n = int(getattr(cfg, "profile_steps", 0) or 0)
    self.start = int(getattr(cfg, "profile_start", 20) or 0)
    self.dir = os.path.join(exp_dir, "profile")
    self.active = False
    self.done = False
    self.started_at = 0

  def tick(self, i):
    if not self.n or self.done:
      return
    import jax
    if not self.active and i >= self.start:
      jax.profiler.start_trace(self.dir)
      self.active = True
      self.started_at = i
      print(f"[profile] tracing ~{self.n} steps from step {i} "
            f"-> {self.dir}")
    elif self.active and i >= self.started_at + self.n:
      jax.profiler.stop_trace()
      self.active = False
      self.done = True

  def close(self):
    if self.active:
      import jax
      jax.profiler.stop_trace()
      self.active = False
      self.done = True


def _zip_eval_one_view(mcfg, params, scene, cfg):
  """One held-out view PSNR during zip training: an f32-activation
  twin of the training model (same f32 params, 5x faster XLA compile
  than bf16 — PERF.md) through the shared params-as-argument renderer,
  so one compile serves the whole run."""
  import dataclasses
  import functools as _ft

  import jax.numpy as jnp

  from snerf_tpu.models.zipnerf import ZipNerfModel
  from snerf_tpu.train.renderer import make_zip_param_render_fn

  eval_model = ZipNerfModel(
      config=dataclasses.replace(mcfg, compute_dtype=jnp.float32))
  render_fn = _ft.partial(make_zip_param_render_fn(eval_model), params)
  return _render_one_test_view(render_fn, scene, cfg)[0]


class _nullcontext:
  def __enter__(self):
    return None

  def __exit__(self, *a):
    return False


if __name__ == "__main__":
  main(sys.argv[1:])
