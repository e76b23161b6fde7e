"""DTU multi-view-stereo dataset loader.

Behavioral parity target (file contract re-derived): reference
s-nerfpp/zipnerf/internal/datasets.py:1858-1934 (DTU) — per-scan
rect_{i:03d}_{light}.png images with ../../cal18/pos_{i:03d}.txt 3x4
projection matrices, decomposed into K / R / t; poses recentered,
rescaled by the max |translation|, flipped to OpenGL axes; train/test
split by `dtuhold` stride (test = idx % dtuhold == 0).
"""

from __future__ import annotations

import os

import numpy as np

from snerf_tpu.data.scene import Scene, _recenter_poses


def decompose_projection(P):
  """3x4 projection -> (K [3,3], c2w [3,4]) via RQ decomposition."""
  import cv2
  K, R, t = cv2.decomposeProjectionMatrix(np.asarray(P, np.float64))[:3]
  K = K / K[2, 2]
  pose = np.eye(4, dtype=np.float32)
  pose[:3, :3] = R.T
  pose[:3, 3] = (t[:3] / t[3])[:, 0]
  return K.astype(np.float32), pose[:3]


def load_dtu_scene(datadir: str, factor: int = 1,
                   dtu_light_cond: int = 2, dtuhold: int = 8) -> Scene:
  import cv2
  names = [n for n in os.listdir(datadir) if n.startswith("rect_")]
  n_images = len(names) // 8 if len(names) >= 8 else len(names)
  if n_images == 0:
    raise FileNotFoundError(f"no rect_*.png under {datadir}")

  images, Ks, poses = [], [], []
  for i in range(1, n_images + 1):
    if dtu_light_cond < 7:
      light = f"{dtu_light_cond}_r" + ("5000" if i < 50 else "7000")
    else:
      light = "max"
    fname = os.path.join(datadir, f"rect_{i:03d}_{light}.png")
    img = cv2.imread(fname, cv2.IMREAD_COLOR)[..., ::-1]
    if factor > 1:
      img = cv2.resize(img, (img.shape[1] // factor,
                             img.shape[0] // factor),
                       interpolation=cv2.INTER_AREA)
    images.append(img)
    proj = np.loadtxt(os.path.join(datadir, "..", "..", "cal18",
                                   f"pos_{i:03d}.txt"), dtype=np.float32)
    K, pose = decompose_projection(proj)
    if factor > 1:
      K = np.diag([1.0 / factor, 1.0 / factor, 1.0]).astype(np.float32) @ K
    Ks.append(K)
    poses.append(pose)

  images = np.stack(images)
  Ks = np.stack(Ks)
  poses = np.stack(poses).astype(np.float32)

  poses, _ = _recenter_poses(poses)
  scale = np.max(np.abs(poses[:, :3, 3]))
  poses[:, :3, 3] /= max(scale, 1e-9)
  # flip y/z to the OpenGL [r, u, -t] convention used by raygen
  poses = poses @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)

  idx = np.arange(n_images)
  i_test = idx[idx % dtuhold == 0]
  i_train = idx[idx % dtuhold != 0]
  return Scene(images=images.astype(np.uint8), poses=poses[:, :3, :4],
               intrinsics=Ks, near=0.1, far=6.0,
               i_train=i_train, i_test=i_test, scale=1.0 / max(scale, 1e-9))
