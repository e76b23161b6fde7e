"""Blender (NeRF-synthetic) dataset loader.

Behavioral parity target: the Blender route of the zipnerf dataset
framework (s-nerfpp/zipnerf/internal/datasets.py Blender class):
transforms_{split}.json with camera_angle_x + per-frame transform_matrix,
white-background compositing of RGBA pngs, near/far 2/6 convention.
"""

from __future__ import annotations

import json
import os

import numpy as np

from snerf_tpu.data.scene import Scene


def load_blender_scene(datadir: str, split: str = "train",
                       white_bkgd: bool = True, factor: int = 1,
                       near: float = 2.0, far: float = 6.0) -> Scene:
  import imageio.v2 as imageio
  with open(os.path.join(datadir, f"transforms_{split}.json")) as f:
    meta = json.load(f)

  images, poses = [], []
  for frame in meta["frames"]:
    fpath = os.path.join(datadir, frame["file_path"] + ".png")
    img = np.asarray(imageio.imread(fpath), np.float32) / 255.0
    if img.shape[-1] == 4:
      alpha = img[..., 3:4]
      rgb = img[..., :3]
      img = rgb * alpha + (1.0 - alpha) if white_bkgd else rgb * alpha
    if factor > 1:
      import cv2
      img = cv2.resize(img, (img.shape[1] // factor,
                             img.shape[0] // factor))
    images.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    poses.append(np.asarray(frame["transform_matrix"],
                            np.float32)[:3, :4])
  images = np.stack(images)
  poses = np.stack(poses)
  N, H, W = images.shape[:3]
  focal = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
  K = np.zeros((N, 3, 3), np.float32)
  K[:, 0, 0] = K[:, 1, 1] = focal
  K[:, 0, 2] = W / 2
  K[:, 1, 2] = H / 2
  K[:, 2, 2] = 1

  return Scene(images=images, poses=poses, intrinsics=K, near=near,
               far=far, cam_index=np.zeros(N, np.int32),
               i_train=np.arange(N), i_test=np.array([], np.int32),
               scale=1.0)
