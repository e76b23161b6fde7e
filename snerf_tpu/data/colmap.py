"""COLMAP sparse-model reader (cameras/images/points3D, .bin and .txt).

Behavioral parity target: the vendored pycolmap scene reader
(s-nerfpp/zipnerf/internal/pycolmap/pycolmap/scene_manager.py) used by
the LLFF-style dataset route — reimplemented from the public COLMAP
binary format spec (this is a file-format reader, not model code).
"""

from __future__ import annotations

import dataclasses
import os
import struct
from typing import Dict, Tuple

import numpy as np

# COLMAP camera model ids -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4), 3: ("RADIAL", 5), 4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8), 6: ("FULL_OPENCV", 12), 7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4), 9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


@dataclasses.dataclass
class ColmapCamera:
  model: str
  width: int
  height: int
  params: np.ndarray

  def K(self) -> np.ndarray:
    k = np.eye(3)
    if self.model == "SIMPLE_PINHOLE" or self.model.startswith(
        "SIMPLE_RADIAL") or self.model == "RADIAL":
      f, cx, cy = self.params[:3]
      k[0, 0] = k[1, 1] = f
    else:
      fx, fy, cx, cy = self.params[:4]
      k[0, 0], k[1, 1] = fx, fy
    k[0, 2], k[1, 2] = cx, cy
    return k

  def distortion(self) -> np.ndarray:
    if self.model in ("SIMPLE_PINHOLE", "PINHOLE"):
      return np.zeros(0)
    if self.model in ("SIMPLE_RADIAL", "SIMPLE_RADIAL_FISHEYE"):
      return self.params[3:4]
    if self.model in ("RADIAL", "RADIAL_FISHEYE"):
      return self.params[3:5]
    return self.params[4:]


@dataclasses.dataclass
class ColmapImage:
  qvec: np.ndarray    # (w, x, y, z)
  tvec: np.ndarray
  camera_id: int
  name: str

  def R(self) -> np.ndarray:
    w, x, y, z = self.qvec
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
         2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
         2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w),
         1 - 2 * (x * x + y * y)]])

  def w2c(self) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = self.R()
    m[:3, 3] = self.tvec
    return m

  def c2w(self) -> np.ndarray:
    return np.linalg.inv(self.w2c())


def _read(fid, fmt):
  return struct.unpack(fmt, fid.read(struct.calcsize(fmt)))


def read_cameras_bin(path: str) -> Dict[int, ColmapCamera]:
  out = {}
  with open(path, "rb") as f:
    (n,) = _read(f, "<Q")
    for _ in range(n):
      cam_id, model_id, w, h = _read(f, "<iiQQ")
      name, n_params = CAMERA_MODELS[model_id]
      params = np.array(_read(f, f"<{n_params}d"))
      out[cam_id] = ColmapCamera(name, int(w), int(h), params)
  return out


def read_images_bin(path: str) -> Dict[int, ColmapImage]:
  out = {}
  with open(path, "rb") as f:
    (n,) = _read(f, "<Q")
    for _ in range(n):
      img_id = _read(f, "<i")[0]
      qvec = np.array(_read(f, "<4d"))
      tvec = np.array(_read(f, "<3d"))
      cam_id = _read(f, "<i")[0]
      name = b""
      while True:
        c = f.read(1)
        if c == b"\x00":
          break
        name += c
      (n_pts,) = _read(f, "<Q")
      f.read(24 * n_pts)  # skip 2D points (x, y, point3D_id)
      out[img_id] = ColmapImage(qvec, tvec, cam_id, name.decode())
  return out


def read_points3d_bin(path: str) -> Tuple[np.ndarray, np.ndarray,
                                          np.ndarray]:
  """Returns (xyz [N,3], rgb [N,3], error [N])."""
  xyz, rgb, err = [], [], []
  with open(path, "rb") as f:
    (n,) = _read(f, "<Q")
    for _ in range(n):
      _read(f, "<Q")  # point id
      xyz.append(_read(f, "<3d"))
      rgb.append(_read(f, "<3B"))
      err.append(_read(f, "<d")[0])
      (track_len,) = _read(f, "<Q")
      f.read(8 * track_len)
  return (np.array(xyz), np.array(rgb, np.uint8), np.array(err))


def read_cameras_txt(path: str) -> Dict[int, ColmapCamera]:
  out = {}
  with open(path) as f:
    for line in f:
      if line.startswith("#") or not line.strip():
        continue
      p = line.split()
      out[int(p[0])] = ColmapCamera(
          p[1], int(p[2]), int(p[3]), np.array([float(x) for x in p[4:]]))
  return out


def read_images_txt(path: str) -> Dict[int, ColmapImage]:
  out = {}
  with open(path) as f:
    lines = [ln for ln in f if not ln.startswith("#") and ln.strip()]
  for i in range(0, len(lines), 2):  # every other line is 2D points
    p = lines[i].split()
    out[int(p[0])] = ColmapImage(
        np.array([float(x) for x in p[1:5]]),
        np.array([float(x) for x in p[5:8]]), int(p[8]), p[9])
  return out


def load_colmap_model(model_dir: str):
  """Load a sparse model dir (binary preferred, text fallback).

  Returns (cameras dict, images dict sorted by name, points3d or None).
  """
  def pick(stem):
    b = os.path.join(model_dir, stem + ".bin")
    t = os.path.join(model_dir, stem + ".txt")
    return (b, "bin") if os.path.exists(b) else (t, "txt")

  cam_path, kind = pick("cameras")
  cameras = (read_cameras_bin(cam_path) if kind == "bin"
             else read_cameras_txt(cam_path))
  img_path, kind = pick("images")
  images = (read_images_bin(img_path) if kind == "bin"
            else read_images_txt(img_path))
  pts = None
  p3d, kind = pick("points3D")
  if os.path.exists(p3d) and kind == "bin":
    pts = read_points3d_bin(p3d)
  return cameras, images, pts


def colmap_to_poses(cameras, images):
  """(cameras, images) -> (c2w [N,3,4] in [r, u, -t] loader convention,
  K [N,3,3], names) sorted by image name."""
  items = sorted(images.values(), key=lambda im: im.name)
  poses, Ks, names = [], [], []
  for im in items:
    c2w = im.c2w()[:3]
    # COLMAP camera: +x right, +y down, +z forward -> [r, u, -t]
    flip = np.diag([1.0, -1.0, -1.0])
    c2w = np.concatenate([c2w[:3, :3] @ flip, c2w[:3, 3:4]], axis=1)
    poses.append(c2w)
    Ks.append(cameras[im.camera_id].K())
    names.append(im.name)
  return np.stack(poses), np.stack(Ks), names
