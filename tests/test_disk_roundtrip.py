"""Disk roundtrips: write scene dirs with the preprocess writers, read
them with the training loaders, take real train steps — the full
file-contract path (images / depths / poses_bounds.npy)."""

import os

import numpy as np
import pytest

from snerf_tpu.data import make_synthetic_scene


def write_nuscenes_dir(tmp_path, scene):
  """Lay a synthetic scene out as an S-NeRF nuScenes scene dir."""
  import imageio.v2 as imageio
  from PIL import Image
  from snerf_tpu.preprocess.nuscenes import build_poses_bounds

  (tmp_path / "images").mkdir()
  (tmp_path / "depths").mkdir()
  n = scene.num_images
  H, W = scene.hw
  c2ws = np.tile(np.eye(4)[None], (n, 1, 1))
  # loader convention [r, u, -t]; writer expects raw c2w whose recenter+
  # flip produces it. Build the inverse of the loader's flip:
  # writer poses go through [r1, r0, -r2] flip then loader flips back.
  for i in range(n):
    c2ws[i, :3, :4] = scene.poses[i]
    imageio.imwrite(tmp_path / "images" / f"{i:04d}.png",
                    scene.images[i])
    d16 = np.clip(scene.depths[i] * 256, 0, 65535).astype(np.uint16)
    Image.fromarray(d16).save(tmp_path / "depths" / f"{i:04d}.png")
  arr = build_poses_bounds(c2ws, scene.intrinsics, (H, W))
  np.save(tmp_path / "poses_bounds.npy", arr)


def test_nuscenes_dir_roundtrip_and_train(tmp_path):
  # keep all depths > 2 m: the loader clips below 2 m (street-scene
  # contract, load_nuscenes.py:188-192)
  scene = make_synthetic_scene(num_images=6, H=24, W=32, radius=5.0,
                               near=2.5, far=9.0)
  write_nuscenes_dir(tmp_path, scene)

  from snerf_tpu.data.scene import load_nuscenes_scene
  loaded = load_nuscenes_scene(str(tmp_path), bd_factor=0.0,
                               cam_num=0, datahold=6, no_align=True)
  assert loaded.images.shape == scene.images.shape
  assert loaded.depths.shape == scene.depths.shape
  assert loaded.near > 0 and loaded.far > loaded.near
  # depth values survive the x256 png roundtrip
  np.testing.assert_allclose(loaded.depths, scene.depths, atol=0.02)

  # a couple of real train steps through the loaded scene
  import jax
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.mipnerf import MipNerfConfig
  from snerf_tpu.train.trainer import (
      TrainConfig, create_train_state, make_train_step)
  dev = scene_to_device(loaded)
  mcfg = MipNerfConfig(num_samples=8, num_fine=8, hidden_layer=16,
                       proposal_hidden_layer=16, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=32, n_iters=10, depth_loss=True)
  model, pm, state = create_train_state(jax.random.PRNGKey(0), mcfg,
                                        tcfg, loaded.num_images)
  step = make_train_step(model, pm, tcfg, dev, loaded.i_train,
                         loaded.near, loaded.far, donate=False)
  state, m = step(state, jax.random.PRNGKey(1))
  assert np.isfinite(float(m["loss"]))


def test_waymo_preprocess_to_loader_roundtrip(tmp_path):
  """preprocess.waymo writer -> data.waymo loader consistency."""
  import cv2
  from snerf_tpu.preprocess.waymo import preprocess_waymo_scene

  rng = np.random.RandomState(0)
  kitti = tmp_path / "kitti"
  H_small = 886  # side cams arrive unpadded
  frames = 4
  # calib/pose/image_0..4 layout
  (kitti / "calib").mkdir(parents=True)
  (kitti / "pose").mkdir()
  for cam in range(5):
    (kitti / f"image_{cam}").mkdir()
  K_line = "P%d: " + " ".join(["721.5", "0", "960", "0",
                               "0", "721.5", "640", "0",
                               "0", "0", "1", "0"])
  for f in range(frames):
    lines = []
    for cam in range(5):
      lines.append((K_line % cam) + "\n")
    for cam in range(5):
      # lidar2cam = identity-ish with small offset
      m = np.eye(4)[:3]
      m[0, 3] = 0.1 * cam
      lines.append(f"Tr_velo_to_cam_{cam}: " +
                   " ".join(str(v) for v in m.ravel()) + "\n")
    with open(kitti / "calib" / f"{f:04d}.txt", "w") as fh:
      fh.writelines(lines)
    pose = np.eye(4)
    pose[0, 3] = f * 2.0
    np.savetxt(kitti / "pose" / f"{f:04d}.txt", pose)
    for cam in range(5):
      h = 1280 if cam < 3 else H_small
      cv2.imwrite(str(kitti / f"image_{cam}" / f"{f:04d}.png"),
                  rng.randint(0, 255, (h, 1920, 3), np.uint8))

  out = tmp_path / "scene"
  arr = preprocess_waymo_scene(str(kitti), str(out), img_num=3)
  assert arr.shape == (15, 19)
  assert len(os.listdir(out / "images")) == 15

  from snerf_tpu.data.waymo import load_waymo_scene
  scene = load_waymo_scene(str(out), llffhold=5, load_depth=False,
                           load_semantic=False)
  assert scene.images.shape[1:] == (1280, 1920, 3)
  assert scene.poses.shape[1:] == (3, 4)
  assert scene.near > 0 and scene.far > scene.near
  # side-camera frames carry the row-886 validity mask
  assert scene.skymask is not None
  assert scene.skymask[-1][900:].all()  # padded rows masked
  assert not scene.skymask[0].any()     # front cam unmasked
