#!/usr/bin/env python
"""Batch render CLI: render trained scenes at test / novel / random poses.

Behavioral parity target: reference
s-nerfpp/zipnerf/random_render_waymo_seq.py:112-228 — load checkpoint,
render RENDER_N random novel poses (WAYMO_RENDER), save rgb/, depth/
(uint16 /sf x256), semantic/ (argmax labels), raw_target_poses.npy,
intrinsic.npy, render_poses.npy. This is the S-NeRF++ simulation
pipeline's background-render entry (api_code/background_zipnerf.py).

Usage: python render.py --config <file> [--render_n 70 --render_mode
random|test|path]
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
  import imageio.v2 as imageio
  import jax
  import jax.numpy as jnp
  import numpy as np

  from snerf_tpu.config import load_config_with_snapshot
  from snerf_tpu.data import camera_utils
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.data.waymo import generate_random_render_poses, render2raw
  from snerf_tpu.parallel import make_mesh
  from snerf_tpu.train import checkpoints as ckpt_lib
  from snerf_tpu.train.renderer import render_image, render_image_scan
  from snerf_tpu.utils.ref_import import repo_train_module
  load_scene = repo_train_module().load_scene

  # render-only extra flags
  extra = {"render_n": 70, "render_mode": "test", "render_seed": 0,
           "out_dir": None}
  argv = list(argv or [])
  for k in list(extra):
    if f"--{k}" in argv:
      i = argv.index(f"--{k}")
      extra[k] = argv[i + 1]
      del argv[i:i + 2]
  cfg = load_config_with_snapshot(argv)
  exp_dir = cfg.exp_dir()
  ckpt_dir = os.path.join(exp_dir, "checkpoints")
  out_dir = extra["out_dir"] or os.path.join(exp_dir, "render")
  for sub in ("rgb", "depth", "semantic"):
    os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

  scene = load_scene(cfg)
  step = None if cfg.ckpt < 0 else cfg.ckpt
  # Init on host + restore to host: skips a remote init compile and the
  # shard-by-shard device_put of the optimizer moments (render only
  # needs params; see checkpoints._host_target).
  with jax.default_device(jax.devices("cpu")[0]):
    if cfg.model == "zipnerf":
      import dataclasses
      from snerf_tpu.train.zip_trainer import create_zip_train_state
      # Forward-only paths run f32 activations: bf16 compute_dtype
      # quintuples the XLA compile (464s vs 90s measured, PERF.md) for
      # zero steady-state gain, and render recompiles per image shape.
      zmcfg = dataclasses.replace(cfg.zip_model_config(),
                                  compute_dtype=jnp.float32)
      model, state = create_zip_train_state(
          jax.random.PRNGKey(0), zmcfg, cfg.zip_train_config())
    else:
      model, _, state = repo_train_module().build_model_state(
          cfg, cfg.train_config(), scene.num_images)
  state, restored = ckpt_lib.restore_checkpoint(ckpt_dir, state,
                                                step=step, host=True)
  if restored is None:
    raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
  print(f"rendering from checkpoint step {restored}")

  H, W = scene.hw
  hws = None
  mode = extra["render_mode"]
  n_render = int(extra["render_n"])
  if mode == "random":
    # WAYMO_RENDER / NUSCENES_RENDER-style novel poses around the
    # training trajectory. Per-pose image sizes: forward vs side
    # cameras may differ.
    hw_fwd = np.array([H, W])
    hw_side = np.array([H, W])
    if cfg.dataset_type == "nuscenes":
      # full 6-camera rig per sample (NUSCENES_RENDER parity)
      from snerf_tpu.data.waymo import generate_nuscenes_render_poses
      pose_set = generate_nuscenes_render_poses(
          scene.poses, scene.intrinsics, hw_fwd, scene.scale,
          n_render=max(n_render // max(cfg.cam_num, 1), 1),
          cam_num=max(cfg.cam_num, 1),
          seed=int(extra["render_seed"]))
    else:
      pose_set = generate_random_render_poses(
          scene.poses, scene.intrinsics[0], scene.intrinsics[-1],
          hw_fwd, hw_side, scene.scale,
          n_render=n_render, seed=int(extra["render_seed"]))
    poses = pose_set.poses[:, :3, :]
    Ks = pose_set.intrinsics
    hws = pose_set.hws
    transform = getattr(scene, "pca_transform", np.eye(4))
    raw = render2raw(pose_set.poses, transform, scene.scale, np.eye(4))
    np.save(os.path.join(out_dir, "raw_target_poses.npy"), raw)
    np.save(os.path.join(out_dir, "render_poses.npy"), pose_set.poses)
    np.save(os.path.join(out_dir, "intrinsic.npy"), Ks)
  elif mode == "path":
    poses = camera_utils.generate_ellipse_path(scene.poses,
                                               n_frames=n_render)
    Ks = np.tile(scene.intrinsics[:1], (len(poses), 1, 1))
    np.save(os.path.join(out_dir, "render_poses.npy"), poses)
    np.save(os.path.join(out_dir, "intrinsic.npy"), Ks)
  else:  # test split
    idxs = np.asarray(scene.i_test)[:n_render]
    poses = scene.poses[idxs]
    Ks = scene.intrinsics[idxs]

  import functools
  from snerf_tpu.train.zip_trainer import eval_params
  params = jax.device_put(eval_params(state))  # one batched h->d move
  if cfg.model == "zipnerf":
    from snerf_tpu.train.renderer import make_zip_param_render_fn
    render_fn = functools.partial(make_zip_param_render_fn(model), params)
  else:
    from snerf_tpu.train.renderer import make_eval_render_fn
    render_fn = make_eval_render_fn(model, params,
                                    white_bkgd=cfg.white_bkgd)

  mesh = make_mesh() if len(jax.devices()) > 1 else None
  for i in range(len(poses)):
    hi, wi = (int(hws[i][0]), int(hws[i][1])) if hws is not None \
        else (H, W)
    rays = rays_for_image(
        jnp.asarray(poses[i]), jnp.asarray(Ks[i]), hi, wi,
        scene.near, scene.far, render_factor=cfg.render_factor)
    render = render_image_scan if cfg.scan_render else render_image
    out = render(render_fn, rays, chunk=cfg.chunk, mesh=mesh)
    imageio.imwrite(
        os.path.join(out_dir, "rgb", f"{i:05d}.png"),
        (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8))
    # depth as uint16 png: metric depth / scale * 256
    # (random_render_waymo_seq.py:196-204 contract)
    d = out["distance"][..., 0] / max(scene.scale, 1e-12) * 256.0
    imageio.imwrite(
        os.path.join(out_dir, "depth", f"{i:05d}.png"),
        np.clip(d, 0, 65535).astype(np.uint16))
    if "semantic" in out:
      np.save(os.path.join(out_dir, "semantic", f"{i:05d}.npy"),
              np.argmax(out["semantic"], axis=-1).astype(np.int32))
    print(f"rendered {i + 1}/{len(poses)}")
  print(f"outputs under {out_dir}")


if __name__ == "__main__":
  main(sys.argv[1:])
