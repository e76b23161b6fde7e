#!/usr/bin/env python
"""S-NeRF evaluation CLI: render held-out views, report PSNR/SSIM, dump
rgb png + depth npy + semantic npy.

Behavioral parity target: reference s-nerf/eval.py:32-205 (load config +
ckpt, chunked full-image renders of the test split, PSNR, depth/semantic
dumps, optional test-time pose refinement).
"""

from __future__ import annotations

import json
import os
import sys


def refine_test_poses(model, params, scene, idxs, n_iters: int = 100,
                      n_rays: int = 1024, lr: float = 1e-3,
                      white_bkgd: bool = False):
  """Photometric test-time pose refinement (reference eval.py:82-114):
  freeze the NeRF, learn one SE(3) delta per test image."""
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from snerf_tpu.data.raygen import pixels_to_rays
  from snerf_tpu.models.posenet import LearnPose

  n = len(idxs)
  H, W = scene.hw
  init_poses = jnp.asarray(scene.poses[idxs], jnp.float32)
  images = jnp.asarray(scene.images[idxs])
  Ks = jnp.asarray(scene.intrinsics[idxs], jnp.float32)

  pose_model = LearnPose(num_cams=n)
  pose_vars = pose_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 3, 4)))
  pose_params = pose_vars["params"]
  tx = optax.adam(lr)
  opt = tx.init(pose_params)

  # model params + images are jit ARGUMENTS, not closure constants —
  # closure device arrays embed into the HLO body (remote-compile 413
  # over the tunneled TPU for hash-table-sized params; PERF.md).
  @jax.jit
  def step(nerf_params, imgs, pose_params, opt, key):
    k_img, k_pix = jax.random.split(key)
    img_i = jax.random.randint(k_img, (), 0, n)
    pix = jax.random.randint(k_pix, (n_rays,), 0, H * W)
    py, px = pix // W, pix % W

    def loss_fn(pp):
      table = pose_model.apply({"params": pp}, jnp.arange(n), init_poses)
      rays = pixels_to_rays(px.astype(jnp.float32),
                            py.astype(jnp.float32),
                            table[img_i], Ks[img_i],
                            scene.near, scene.far)
      ret = model.apply({"params": nerf_params}, rays, rng=None,
                        white_bkgd=white_bkgd)
      tgt = imgs[img_i, py, px].astype(jnp.float32) / 255.0
      return jnp.mean((ret[-1]["rgb"] - tgt) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(pose_params)
    updates, opt = tx.update(g, opt, pose_params)
    return optax.apply_updates(pose_params, updates), opt, loss

  key = jax.random.PRNGKey(1)
  for _ in range(n_iters):
    key, k = jax.random.split(key)
    pose_params, opt, loss = step(params, images, pose_params, opt, k)
  table = pose_model.apply({"params": pose_params}, jnp.arange(n),
                           init_poses)
  return np.asarray(table)


def main(argv=None):
  import jax
  import jax.numpy as jnp
  import numpy as np

  from snerf_tpu.config import load_config_with_snapshot
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.parallel import make_mesh
  from snerf_tpu.train import checkpoints as ckpt_lib
  from snerf_tpu.train.renderer import (
      make_eval_render_fn, make_zip_param_render_fn, render_image,
      render_image_scan)
  from snerf_tpu.utils.metrics import MetricHarness
  from snerf_tpu.utils.ref_import import repo_train_module
  load_scene = repo_train_module().load_scene

  cfg = load_config_with_snapshot(argv)
  exp_dir = cfg.exp_dir()
  ckpt_dir = os.path.join(exp_dir, "checkpoints")

  scene = load_scene(cfg)
  step = None if cfg.ckpt < 0 else cfg.ckpt
  # Init on host + restore to host, then one batched device_put of the
  # params (skips the remote init compile and the per-shard H2D of the
  # optimizer moments — eval only needs params).
  with jax.default_device(jax.devices("cpu")[0]):
    if cfg.model == "zipnerf":
      import dataclasses
      from snerf_tpu.train.zip_trainer import create_zip_train_state
      # f32 activations at eval: bf16 compute_dtype costs 5x in XLA
      # compile time (PERF.md) and buys nothing forward-only.
      zmcfg = dataclasses.replace(cfg.zip_model_config(),
                                  compute_dtype=jnp.float32)
      ztcfg = cfg.zip_train_config()
      model, state = create_zip_train_state(jax.random.PRNGKey(0), zmcfg,
                                            ztcfg)
    else:
      model, pose_model, state = repo_train_module().build_model_state(
          cfg, cfg.train_config(), scene.num_images)
  state, restored = ckpt_lib.restore_checkpoint(ckpt_dir, state,
                                                step=step, host=True)
  if restored is None:
    raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
  state = state.replace(params=jax.device_put(state.params))
  print(f"evaluating checkpoint step {restored}")

  out_dir = os.path.join(exp_dir, f"testset_{restored:06d}")
  os.makedirs(out_dir, exist_ok=True)

  idxs = scene.i_test if cfg.eval_test else scene.i_train

  # Test-time pose refinement: freeze the NeRF, fit per-test-image SE(3)
  # deltas on photometric loss (reference eval.py:82-114).
  refined_poses = None
  if cfg.test_refine_iter > 0 and cfg.model != "zipnerf":
    refined_poses = refine_test_poses(
        model, state.params, scene, np.asarray(idxs),
        n_iters=cfg.test_refine_iter, n_rays=min(cfg.N_rgb, 1024),
        white_bkgd=cfg.white_bkgd)
    print(f"refined {len(idxs)} test poses "
          f"({cfg.test_refine_iter} iters)")

  mesh = make_mesh() if len(jax.devices()) > 1 else None
  if cfg.model == "zipnerf":
    from snerf_tpu.train.zip_trainer import eval_params
    params = jax.device_put(eval_params(state))

    import functools
    render_fn = functools.partial(make_zip_param_render_fn(model), params)
  else:
    from snerf_tpu.train.zip_trainer import eval_params
    render_fn = make_eval_render_fn(model, eval_params(state),
                                    white_bkgd=cfg.white_bkgd)
  harness = MetricHarness(lpips=cfg.lpips)
  H, W = scene.hw
  results = []
  miou_eval = None
  if cfg.semantic and scene.semantics is not None:
    from snerf_tpu.utils.metrics import MiouEvaluator
    miou_eval = MiouEvaluator(cfg.semantic_class_num)
  import time as _time
  t_eval0 = _time.perf_counter()
  rays_done = 0
  steady_rays = 0   # rays after the first (compile-bearing) image
  t_steady0 = None
  for pos, ti in enumerate(np.asarray(idxs)):
    if pos == 1:
      t_steady0 = _time.perf_counter()
    pose = (refined_poses[pos] if refined_poses is not None
            else scene.poses[ti])
    rays = rays_for_image(
        jnp.asarray(pose), jnp.asarray(scene.intrinsics[ti]),
        H, W, scene.near, scene.far,
        render_factor=cfg.render_factor)
    render = render_image_scan if cfg.scan_render else render_image
    out = render(render_fn, rays, chunk=cfg.chunk, mesh=mesh)
    gt = scene.images[ti].astype(np.float32) / 255.0
    if cfg.render_factor:
      import cv2
      gt = cv2.resize(gt, (out["rgb"].shape[1], out["rgb"].shape[0]))
    m = harness(jnp.asarray(out["rgb"]), jnp.asarray(gt))
    results.append({"img": int(ti), **m})
    rays_done += out["rgb"].shape[0] * out["rgb"].shape[1]
    if pos >= 1:
      steady_rays += out["rgb"].shape[0] * out["rgb"].shape[1]
    print(f"img {ti}: psnr={m['psnr']:.2f} ssim={m['ssim']:.4f}")
    if miou_eval is not None and "semantic" in out:
      pred_lab = np.argmax(out["semantic"], axis=-1)
      gt_lab = scene.semantics[ti]
      if gt_lab.shape == pred_lab.shape and (gt_lab >= 0).any():
        miou_eval.add_batch(gt_lab[gt_lab >= 0],
                            pred_lab[gt_lab >= 0])

    import imageio.v2 as imageio
    imageio.imwrite(os.path.join(out_dir, f"{ti:03d}.png"),
                    (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8))
    np.save(os.path.join(out_dir, f"{ti:03d}_depth.npy"),
            out["distance"][..., 0])
    if "semantic" in out:
      np.save(os.path.join(out_dir, f"{ti:03d}_semantic.npy"),
              np.argmax(out["semantic"], axis=-1).astype(np.int32))

  mean_psnr = float(np.mean([r["psnr"] for r in results]))
  mean_ssim = float(np.mean([r["ssim"] for r in results]))
  eval_rays_per_sec = rays_done / max(
      _time.perf_counter() - t_eval0, 1e-9)
  summary = {"step": int(restored), "mean_psnr": mean_psnr,
             "mean_ssim": mean_ssim,
             "eval_rays_per_sec": round(eval_rays_per_sec, 1),
             "per_image": results}
  if t_steady0 is not None and steady_rays:
    # first image carries the XLA compile; report warm throughput too
    summary["eval_rays_per_sec_warm"] = round(
        steady_rays / max(_time.perf_counter() - t_steady0, 1e-9), 1)
  if miou_eval is not None:
    summary["miou"] = miou_eval.miou()
    print(f"mIoU = {summary['miou']:.4f}")
  msg = f"eval rays/sec = {eval_rays_per_sec:.0f}"
  if "eval_rays_per_sec_warm" in summary:
    msg += f" (warm: {summary['eval_rays_per_sec_warm']:.0f})"
  print(msg)
  with open(os.path.join(out_dir, "metrics.json"), "w") as f:
    json.dump(summary, f, indent=2)
  print(f"mean: psnr={mean_psnr:.2f} ssim={mean_ssim:.4f}")
  return summary


if __name__ == "__main__":
  main(sys.argv[1:])
