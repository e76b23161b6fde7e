"""Tanks and Temples (NeRF++ processing) dataset loader.

Behavioral parity target (file contract re-derived): reference
s-nerfpp/zipnerf/internal/datasets.py:1745-1791 (TanksAndTemplesNerfPP)
— <root>/{train,test,camera_path}/{rgb, pose, intrinsics} triplets; 4x4
pose txts flipped to OpenGL axes; one shared focal length from the
first intrinsics file.
"""

from __future__ import annotations

import os

import numpy as np

from snerf_tpu.data.scene import Scene


def _load_split(basedir: str):
  import cv2

  def load_txts(sub, shape):
    d = os.path.join(basedir, sub)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    return np.stack([np.loadtxt(f).reshape(shape) for f in files])

  poses = load_txts("pose", (4, 4)).astype(np.float32)
  poses = poses @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
  intrinsics = load_txts("intrinsics", (4, 4)).astype(np.float32)
  rgb_dir = os.path.join(basedir, "rgb")
  imgs = np.stack([
      cv2.imread(os.path.join(rgb_dir, f), cv2.IMREAD_COLOR)[..., ::-1]
      for f in sorted(os.listdir(rgb_dir))])
  return imgs, poses, intrinsics


def load_tnt_scene(datadir: str, near: float = 0.1,
                   far: float = 10.0) -> Scene:
  """Load train+test splits into one Scene (split recorded in
  i_train/i_test)."""
  tr_imgs, tr_poses, tr_K = _load_split(os.path.join(datadir, "train"))
  te_imgs, te_poses, te_K = _load_split(os.path.join(datadir, "test"))
  images = np.concatenate([tr_imgs, te_imgs])
  poses = np.concatenate([tr_poses, te_poses])[:, :3, :4]
  # one shared focal from the first intrinsics (datasets.py:1788-1791);
  # principal point at the image center
  H, W = images.shape[1:3]
  focal = float(tr_K[0, 0, 0])
  K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
               np.float32)
  Ks = np.tile(K[None], (len(images), 1, 1))
  n_tr = len(tr_imgs)
  return Scene(images=images.astype(np.uint8), poses=poses,
               intrinsics=Ks, near=near, far=far,
               i_train=np.arange(n_tr),
               i_test=np.arange(n_tr, len(images)))


def load_tnt_fvs_scene(datadir: str, factor: int = 0, llffhold: int = 8,
                       near: float = 0.1, far: float = 10.0) -> Scene:
  """Tanks and Temples, Free View Synthesis processing.

  File contract re-derived from reference datasets.py:1793-1855
  (TanksAndTemplesFVS): <root>/dense/ibr3d_* size dirs (sorted,
  reversed, indexed by `factor`), im_*.png images, Ks/Rs/ts npys holding
  colmap world-to-cam; poses inverted to c2w, flipped to OpenGL axes,
  then PCA-normalized. Split: every llffhold-th image is test.
  """
  import cv2

  basedir = os.path.join(datadir, "dense")
  sizes = [f for f in sorted(os.listdir(basedir)) if f.startswith("ibr3d")]
  sizes = sizes[::-1]
  if factor >= len(sizes):
    raise ValueError(f"factor {factor} larger than {len(sizes)}")
  basedir = os.path.join(basedir, sizes[factor])

  files = [f for f in sorted(os.listdir(basedir)) if f.startswith("im_")]
  images = np.stack([
      cv2.imread(os.path.join(basedir, f), cv2.IMREAD_COLOR)[..., ::-1]
      for f in files])

  Ks = np.load(os.path.join(basedir, "Ks.npy"))
  Rs = np.load(os.path.join(basedir, "Rs.npy"))
  ts = np.load(os.path.join(basedir, "ts.npy"))

  from snerf_tpu.data.camera_utils import pad_poses, transform_poses_pca
  w2c = np.concatenate([Rs, ts[..., None]], axis=-1)
  c2w = np.linalg.inv(pad_poses(w2c))[:, :3, :4]
  c2w = c2w @ np.diag([1.0, -1.0, -1.0, 1.0])
  poses, _, _ = transform_poses_pca(c2w)

  H, W = images.shape[1:3]
  focal = float(Ks[0, 0, 0])
  K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
               np.float32)
  idx = np.arange(len(images))
  return Scene(images=images.astype(np.uint8),
               poses=poses.astype(np.float32),
               intrinsics=np.tile(K[None], (len(images), 1, 1)),
               near=near, far=far,
               i_train=idx[idx % llffhold != 0],
               i_test=idx[idx % llffhold == 0])
