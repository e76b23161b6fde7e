"""Waymo (KITTI-format) -> S-NeRF++ training layout.

Behavioral parity target (re-derived): reference
scripts/waymo_preprocess.py:9-119 + scripts/pose.py:4-31 —
c2w = ego_pose @ inv(lidar2cam) per camera, first frame dropped (no flow),
poses normalized to the first camera, side cameras padded to 1280 x 1920
with 886 valid rows, poses_bounds n x 19, depth pngs copied as uint16.
"""

from __future__ import annotations

import os
import numpy as np

SIDE_VALID_ROWS = 886
CAMS = ["image_0", "image_1", "image_2", "image_3", "image_4"]


def read_kitti_calib(path: str):
  """One calib file -> (K [5,3,3], lidar2cam [5,4,4]) (pose.py:4-24)."""
  with open(path) as f:
    raw = f.readlines()
  L = [line.split()[1:] for line in raw]
  K = np.array(L[:5], np.float64).reshape(-1, 3, 4)[:, :, :3]
  l2c = np.zeros((5, 4, 4))
  for j, row in enumerate(L[-5:]):
    m = np.eye(4)
    m[:3, :4] = np.array(row, np.float64).reshape(3, 4)
    l2c[j] = m
  return K, l2c


def load_calibs(datadir: str):
  """All frames' calibs -> (K [5,N,3,3], cam2lidar [5,N,4,4])."""
  calib_dir = os.path.join(datadir, "calib")
  files = sorted(os.listdir(calib_dir), key=lambda x: int(x.split(".")[0]))
  Ks, l2cs = [], []
  for fname in files:
    K, l2c = read_kitti_calib(os.path.join(calib_dir, fname))
    Ks.append(K)
    l2cs.append(l2c)
  K = np.stack(Ks, 0).transpose([1, 0, 2, 3])
  l2c = np.stack(l2cs, 0).transpose([1, 0, 2, 3])
  return K, np.linalg.inv(l2c)


def load_ego_poses(datadir: str):
  pose_dir = os.path.join(datadir, "pose")
  files = sorted(os.listdir(pose_dir), key=lambda x: int(x.split(".")[0]))
  return np.stack([np.loadtxt(os.path.join(pose_dir, f)) for f in files])


def build_waymo_poses_bounds(c2w, K, img_num: int, hw=(1280, 1920),
                             near: float = 1.0, far: float = 100.0):
  """c2w [5, N, 4, 4], K [5, N, 3, 3] -> (poses_bounds [5*img_num, 19],
  c2w_full) (waymo_preprocess.py:8-23: drop frame 0, normalize to cam 0
  frame 0, axis flip)."""
  c2w_used = c2w[:, 1:1 + img_num].reshape(-1, 4, 4)
  K_used = K[:, 1:1 + img_num].reshape(-1, 3, 3)
  c2w_n = np.linalg.inv(c2w_used[0]) @ c2w_used
  hwf = np.stack([K_used[:, 0, 2], K_used[:, 1, 2],
                  (K_used[:, 0, 0] + K_used[:, 1, 1]) / 2], axis=1)
  poses = np.concatenate([c2w_n[:, :3, :4], hwf[:, :, None]], axis=-1)
  poses = np.concatenate(
      [poses[:, :, 1:2], poses[:, :, 0:1], -poses[:, :, 2:3],
       poses[:, :, 3:4], poses[:, :, 4:5]], -1)
  H, W = hw
  rows = [np.concatenate([poses[i].ravel(), [near, far], [H, W]], 0)
          for i in range(poses.shape[0])]
  return np.stack(rows), c2w


def pad_side_camera(img, hw=(1280, 1920)):
  """Pad a side-camera image to full size, content in the top 886 rows
  (waymo_preprocess.py:80-81,106-107)."""
  H, W = hw
  out_shape = (H, W) + img.shape[2:]
  out = np.zeros(out_shape, img.dtype)
  out[:img.shape[0], :img.shape[1]] = img
  return out


def preprocess_waymo_scene(datadir: str, savedir: str, img_num: int = 50,
                           hw=(1280, 1920), near: float = 1.0,
                           far: float = 100.0,
                           depthdir: str = None):
  """Full conversion: poses + images + depth (waymo_preprocess.py main)."""
  import cv2
  from PIL import Image

  os.makedirs(savedir, exist_ok=True)
  K, cam2lidar = load_calibs(datadir)
  ego = load_ego_poses(datadir)
  # cam2lidar: [5, N, 4, 4]; ego: [N, 4, 4]; c2w = ego @ cam2lidar
  c2w = np.einsum("nij,cnjk->cnik", ego, cam2lidar)
  np.save(os.path.join(savedir, "c2w.npy"), c2w)
  np.save(os.path.join(savedir, "intrinsic.npy"), K)
  poses_bounds, _ = build_waymo_poses_bounds(c2w, K, img_num, hw, near,
                                             far)
  np.save(os.path.join(savedir, "poses_bounds.npy"), poses_bounds)

  H, W = hw
  img_out = os.path.join(savedir, "images")
  os.makedirs(img_out, exist_ok=True)
  idx = 0
  for cam in CAMS:
    cam_dir = os.path.join(datadir, cam)
    files = sorted(os.listdir(cam_dir), key=lambda x: int(x.split(".")[0]))
    for j, fname in enumerate(files[1:1 + img_num]):
      img = cv2.imread(os.path.join(cam_dir, fname))
      if cam in ("image_3", "image_4"):
        img = pad_side_camera(img, hw)
      cv2.imwrite(os.path.join(img_out, f"{idx:04d}.png"), img)
      idx += 1

  if depthdir:
    dep_out = os.path.join(savedir, "depth")
    os.makedirs(dep_out, exist_ok=True)
    idx = 0
    for cam in CAMS:
      cam_dir = os.path.join(depthdir, cam)
      files = sorted(os.listdir(cam_dir),
                     key=lambda x: int(x.split(".")[0]))
      for fname in files[1:1 + img_num]:
        d = cv2.imread(os.path.join(cam_dir, fname), -1)
        if cam in ("image_3", "image_4"):
          d = pad_side_camera(d, hw)
        Image.fromarray(d.astype(np.uint16)).save(
            os.path.join(dep_out, f"{idx:04d}.png"))
        idx += 1
  return poses_bounds
