"""LLFF dataset loader (classic-NeRF route).

Behavioral parity target (re-derived): reference
s-nerf/dataloader/load_llff.py:1-442 (factor-downsampled images,
poses_bounds n x 17, [down, right, back] -> [right, up, back] axis flip,
recenter, bd_factor rescale, spherify option, spiral render path,
llffhold split) and dataloader.py:9-59 (near/far selection).
"""

from __future__ import annotations

import os

import numpy as np

from snerf_tpu.data import camera_utils
from snerf_tpu.data.scene import Scene, _recenter_poses


def _load_images(datadir: str, factor: int = 1):
  import cv2
  import imageio.v2 as imageio
  suffix = "" if factor <= 1 else f"_{factor}"
  imgdir = os.path.join(datadir, "images" + suffix)
  if not os.path.isdir(imgdir):
    imgdir = os.path.join(datadir, "images")
  files = sorted(f for f in os.listdir(imgdir)
                 if f.lower().endswith((".jpg", ".jpeg", ".png")))
  imgs = []
  for f in files:
    img = np.asarray(imageio.imread(os.path.join(imgdir, f)))[..., :3]
    if suffix == "" and factor > 1:
      img = cv2.resize(img, (img.shape[1] // factor,
                             img.shape[0] // factor))
    imgs.append(img)
  return np.stack(imgs)


def spherify_poses(poses, bds):
  """Rescale/recenter for inward-facing 360 captures
  (load_llff.py spherify branch)."""
  p34_to_44 = lambda p: np.concatenate(
      [p, np.tile(np.array([[[0, 0, 0, 1.0]]]), (p.shape[0], 1, 1))], 1)
  rays_d = poses[:, :3, 2:3]
  rays_o = poses[:, :3, 3:4]

  def min_line_dist(rays_o, rays_d):
    a_i = np.eye(3) - rays_d * np.transpose(rays_d, [0, 2, 1])
    b_i = -a_i @ rays_o
    return np.squeeze(-np.linalg.inv(
        (np.transpose(a_i, [0, 2, 1]) @ a_i).mean(0)) @ b_i.mean(0))

  pt_mindist = min_line_dist(rays_o, rays_d)
  center = pt_mindist
  up = (poses[:, :3, 3] - center).mean(0)
  vec0 = camera_utils._normalize(up)
  vec1 = camera_utils._normalize(np.cross([0.1, 0.2, 0.3], vec0))
  vec2 = camera_utils._normalize(np.cross(vec0, vec1))
  c2w = np.stack([vec1, vec2, vec0, center], 1)
  poses_reset = (np.linalg.inv(p34_to_44(c2w[None]))
                 @ p34_to_44(poses[:, :3, :4]))[:, :3, :4]
  rad = np.sqrt(np.mean(np.sum(poses_reset[:, :3, 3] ** 2, -1)))
  sc = 1.0 / rad
  poses_reset[:, :3, 3] *= sc
  bds = bds * sc
  return poses_reset.astype(np.float32), bds


def load_llff_scene(datadir: str, factor: int = 8,
                    bd_factor: float = 0.75, recenter: bool = True,
                    spherify: bool = False, llffhold: int = 8,
                    no_ndc: bool = True, block_bg: bool = False,
                    car_sample_n: int = 9) -> Scene:
  images = _load_images(datadir, factor)
  N, H, W = images.shape[:3]

  poses_arr = np.load(os.path.join(datadir, "poses_bounds.npy"))
  poses = poses_arr[:, :-2].reshape([-1, 3, 5])
  bds = poses_arr[:, -2:]
  # [down, right, back] -> [right, up, back] (load_llff.py convention)
  poses = np.concatenate(
      [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], 2)
  hwf = poses[0, :3, 4].copy()
  actual_factor = hwf[0] / H
  focal = hwf[2] / actual_factor

  sc = 1.0 if bd_factor == 0 else 1.0 / (bds.min() * bd_factor)
  poses = poses[:, :3, :4].astype(np.float32)
  poses[:, :3, 3] *= sc
  bds = bds * sc
  if recenter:
    poses, _ = _recenter_poses(poses)
  if spherify:
    poses, bds = spherify_poses(poses, bds)

  K = np.zeros((N, 3, 3), np.float32)
  K[:, 0, 0] = focal
  K[:, 1, 1] = focal
  K[:, 0, 2] = W / 2
  K[:, 1, 2] = H / 2
  K[:, 2, 2] = 1

  if no_ndc:
    near = float(bds.min()) * 0.9
    far = float(bds.max()) * 1.0
  else:
    near, far = 0.0, 1.0

  # foreground (moving-vehicle) branch: per-image vehicle bboxes
  # (reference dataloader.py:17-19 loads bboxes/<n>_bboxes.pt)
  bboxes = None
  if block_bg:
    bbox_path = os.path.join(datadir, "bboxes",
                             f"{car_sample_n}_bboxes.pt")
    if os.path.exists(bbox_path):
      import torch
      bboxes = np.asarray(torch.load(bbox_path,
                                     map_location="cpu")).astype(
                                         np.float32)
      if factor > 1:
        bboxes = bboxes / factor

  i_test = np.arange(N)[::llffhold] if llffhold > 0 else np.array([], int)
  i_train = np.array([i for i in range(N)
                      if i not in set(i_test.tolist())])
  render_poses = camera_utils.generate_spiral_path(poses, bds)
  scene = Scene(images=images.astype(np.uint8), poses=poses,
                intrinsics=K, near=near, far=far,
                cam_index=np.zeros(N, np.int32),
                i_train=i_train, i_test=i_test, scale=sc,
                render_poses=render_poses, bboxes=bboxes)
  return scene
