"""Mesh assets: OBJ/PLY loading, category normalization, placement.

Behavioral parity targets (re-derived):
  reference s-nerfpp/api_code/mesh_renderer.py:14-34 (center_mesh_bottom:
  recenter xy on the bbox center, rest the bottom on z=0, scale to a
  category target size), api_code/mesh_api.py:8-72 (asset bank choice),
  stage1_code/utils_render.py process_mesh/process_ply (yaw + translate).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

# Category -> target length (m) used to normalize asset scale
# (mesh_renderer.py center_mesh_bottom size table).
CATEGORY_SIZES = {
    "vehicle": 4.5,
    "person": 1.75,
    "bicycle": 1.8,
    "motorcycle": 2.1,
    "object": 1.0,
}


def load_obj(path: str):
  """Minimal OBJ reader: (verts [V,3], faces [F,3], colors [V,3] or None).

  Supports `v x y z [r g b]` and `f a b c` (1-based, polygon fan split).
  """
  verts, colors, faces = [], [], []
  with open(path) as f:
    for line in f:
      if line.startswith("v "):
        parts = line.split()
        verts.append([float(x) for x in parts[1:4]])
        if len(parts) >= 7:
          colors.append([float(x) for x in parts[4:7]])
      elif line.startswith("f "):
        idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:]]
        for k in range(1, len(idx) - 1):
          faces.append([idx[0], idx[k], idx[k + 1]])
  v = np.asarray(verts, np.float32)
  c = np.asarray(colors, np.float32) if colors else None
  return v, np.asarray(faces, np.int32), c


def save_obj(path: str, verts, faces, colors=None):
  with open(path, "w") as f:
    for i, v in enumerate(verts):
      if colors is not None:
        f.write(f"v {v[0]} {v[1]} {v[2]} "
                f"{colors[i][0]} {colors[i][1]} {colors[i][2]}\n")
      else:
        f.write(f"v {v[0]} {v[1]} {v[2]}\n")
    for face in faces:
      f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


def center_mesh_bottom(verts, category: str = "vehicle",
                       target_size: Optional[float] = None):
  """Recenter xy, rest bottom on z=0, scale the longest horizontal extent
  to the category size (mesh_renderer.py:14-34)."""
  v = np.asarray(verts, np.float32).copy()
  mins = v.min(0)
  maxs = v.max(0)
  center = (mins + maxs) / 2
  v[:, 0] -= center[0]
  v[:, 1] -= center[1]
  v[:, 2] -= mins[2]
  size = target_size or CATEGORY_SIZES.get(category, 1.0)
  extent = max(maxs[0] - mins[0], maxs[1] - mins[1])
  if extent > 0:
    v *= size / extent
  return v


def place_mesh(verts, position, yaw_deg: float = 0.0):
  """Rotate about +z by yaw then translate to `position` (process_mesh)."""
  a = np.deg2rad(yaw_deg)
  c, s = np.cos(a), np.sin(a)
  rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
  return verts @ rot.T + np.asarray(position, np.float32)


def mesh_extents(verts):
  """Axis-aligned (after placement-normalization) h/w/l extents."""
  ext = verts.max(0) - verts.min(0)
  return float(ext[2]), float(ext[1]), float(ext[0])  # h, w, l


def foreground_preprocess(rgba, gamma: float = 1.0):
  """4-channel render -> (rgb [H,W,3] float, mask [H,W] bool) with an
  optional gamma appearance tweak (parity:
  stage1_code/foreground_preprocess.py:1-37)."""
  rgba = np.asarray(rgba, np.float32)
  if rgba.max() > 1.5:
    rgba = rgba / 255.0
  rgb = rgba[..., :3]
  mask = rgba[..., 3] > 0.5
  if gamma != 1.0:
    rgb = np.clip(rgb, 0, 1) ** gamma
  rgb = rgb * mask[..., None]
  return rgb, mask


class AssetBank:
  """Textured-mesh asset directory (mesh_api.py:8-72 parity): one
  subdirectory per category holding .obj assets."""

  def __init__(self, root: str):
    self.root = root

  def list_assets(self, category: str):
    d = os.path.join(self.root, category)
    if not os.path.isdir(d):
      return []
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".obj"))

  def sample(self, category: str, rng: np.random.RandomState):
    assets = self.list_assets(category)
    if not assets:
      raise FileNotFoundError(f"no {category} assets under {self.root}")
    path = assets[rng.randint(len(assets))]
    verts, faces, colors = load_obj(path)
    verts = center_mesh_bottom(verts, category)
    return verts, faces, colors, path
