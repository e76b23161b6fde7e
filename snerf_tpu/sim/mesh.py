"""Mesh assets: OBJ/PLY loading, category normalization, placement.

Behavioral parity targets (re-derived):
  reference s-nerfpp/api_code/mesh_renderer.py:14-34 (center_mesh_bottom:
  recenter xy on the bbox center, rest the bottom on z=0, scale to a
  category target size), api_code/mesh_api.py:8-72 (asset bank choice),
  stage1_code/utils_render.py process_mesh/process_ply (yaw + translate).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

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


@dataclasses.dataclass
class MeshAsset:
  """A loadable foreground asset: vertex-colored and/or UV-textured."""
  verts: np.ndarray                       # [V, 3]
  faces: np.ndarray                       # [F, 3]
  colors: Optional[np.ndarray] = None     # [V, 3] in [0, 1]
  uvs: Optional[np.ndarray] = None        # [V, 2] (post seam-split)
  texture: Optional[np.ndarray] = None    # [Ht, Wt, 3] float [0, 1]
  path: str = ""


def load_obj(path: str):
  """Minimal OBJ reader: (verts [V,3], faces [F,3], colors [V,3] or None).

  Supports `v x y z [r g b]` and `f a b c` (1-based, polygon fan split).
  """
  a = load_obj_asset(path)
  return a.verts, a.faces, a.colors


def _load_mtl_texture(mtl_path: str):
  """First map_Kd texture of a .mtl file -> float [H, W, 3] or None."""
  if not os.path.exists(mtl_path):
    return None
  tex_file = None
  with open(mtl_path) as f:
    for line in f:
      if line.strip().startswith("map_Kd"):
        tex_file = line.split(None, 1)[1].strip()
        break
  if tex_file is None:
    return None
  tex_path = os.path.join(os.path.dirname(mtl_path), tex_file)
  if not os.path.exists(tex_path):
    return None
  import cv2
  img = cv2.imread(tex_path, cv2.IMREAD_COLOR)
  if img is None:
    return None
  return img[..., ::-1].astype(np.float32) / 255.0


def load_obj_asset(path: str) -> MeshAsset:
  """Full OBJ reader with UV texturing (TEXTure-style banks,
  mesh_api.py:8-72 / mesh_renderer.py:67-89 parity).

  Supports `v x y z [r g b]`, `vt u v`, `f a[/at] b[/bt] c[/ct]`
  (1-based, polygon fan split), and `mtllib` -> first material's map_Kd
  texture image. Vertices are split at UV seams so uvs are per-vertex.
  """
  raw_v, raw_c, raw_vt = [], [], []
  face_tuples = []  # [(v_idx, vt_idx or -1) x 3]
  mtl = None
  with open(path) as f:
    for line in f:
      if line.startswith("v "):
        parts = line.split()
        raw_v.append([float(x) for x in parts[1:4]])
        if len(parts) >= 7:
          raw_c.append([float(x) for x in parts[4:7]])
      elif line.startswith("vt "):
        parts = line.split()
        raw_vt.append([float(parts[1]), float(parts[2])])
      elif line.startswith("mtllib "):
        mtl = line.split(None, 1)[1].strip()
      elif line.startswith("f "):
        refs = []
        for p in line.split()[1:]:
          sub = p.split("/")
          vi = int(sub[0]) - 1
          ti = int(sub[1]) - 1 if len(sub) > 1 and sub[1] else -1
          refs.append((vi, ti))
        for k in range(1, len(refs) - 1):
          face_tuples.append([refs[0], refs[k], refs[k + 1]])
  v = np.asarray(raw_v, np.float32)
  c = np.asarray(raw_c, np.float32) if raw_c else None
  texture = None
  if mtl is not None:
    texture = _load_mtl_texture(os.path.join(os.path.dirname(path), mtl))

  has_uv = bool(raw_vt) and any(t[1] >= 0 for face in face_tuples
                                for t in face)
  if not has_uv:
    faces = np.asarray([[t[0] for t in face] for face in face_tuples],
                       np.int32)
    return MeshAsset(verts=v, faces=faces, colors=c, path=path)

  # split vertices at UV seams: one output vertex per unique (v, vt)
  vt = np.asarray(raw_vt, np.float32)
  pair_to_new = {}
  new_v, new_c, new_uv, faces = [], [], [], []
  for face in face_tuples:
    fo = []
    for (vi, ti) in face:
      key = (vi, ti)
      if key not in pair_to_new:
        pair_to_new[key] = len(new_v)
        new_v.append(v[vi])
        new_uv.append(vt[ti] if ti >= 0 else np.zeros(2, np.float32))
        if c is not None:
          new_c.append(c[vi])
      fo.append(pair_to_new[key])
    faces.append(fo)
  return MeshAsset(
      verts=np.asarray(new_v, np.float32),
      faces=np.asarray(faces, np.int32),
      colors=np.asarray(new_c, np.float32) if c is not None else None,
      uvs=np.asarray(new_uv, np.float32),
      texture=texture, path=path)


def sample_texture(texture, uv):
  """Bilinear texture sample. uv [..., 2] in [0, 1] (OBJ convention:
  v origin at the image bottom — mesh_renderer.py:80-81 flips v);
  border padding. Returns [..., 3]."""
  H, W = texture.shape[:2]
  u = np.clip(uv[..., 0], 0.0, 1.0) * W - 0.5
  vv = np.clip(1.0 - uv[..., 1], 0.0, 1.0) * H - 0.5
  x0 = np.floor(u).astype(np.int64)
  y0 = np.floor(vv).astype(np.int64)
  fx = (u - x0)[..., None]
  fy = (vv - y0)[..., None]
  x0c = np.clip(x0, 0, W - 1)
  x1c = np.clip(x0 + 1, 0, W - 1)
  y0c = np.clip(y0, 0, H - 1)
  y1c = np.clip(y0 + 1, 0, H - 1)
  t00 = texture[y0c, x0c]
  t01 = texture[y0c, x1c]
  t10 = texture[y1c, x0c]
  t11 = texture[y1c, x1c]
  top = t00 * (1 - fx) + t01 * fx
  bot = t10 * (1 - fx) + t11 * fx
  return top * (1 - fy) + bot * fy


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


def save_obj_textured(path: str, verts, faces, uvs, texture):
  """Write an OBJ + .mtl + texture png (the TEXTure bank layout)."""
  import cv2
  base = os.path.splitext(path)[0]
  mtl_name = os.path.basename(base) + ".mtl"
  tex_name = os.path.basename(base) + ".png"
  with open(path, "w") as f:
    f.write(f"mtllib {mtl_name}\n")
    for v in verts:
      f.write(f"v {v[0]} {v[1]} {v[2]}\n")
    for uv in uvs:
      f.write(f"vt {uv[0]} {uv[1]}\n")
    f.write("usemtl material0\n")
    for face in faces:
      f.write("f " + " ".join(f"{i + 1}/{i + 1}" for i in face) + "\n")
  with open(base + ".mtl", "w") as f:
    f.write(f"newmtl material0\nmap_Kd {tex_name}\n")
  img = np.clip(np.asarray(texture) * 255, 0, 255).astype(np.uint8)
  cv2.imwrite(base + ".png", img[..., ::-1])


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
  """Mesh asset directory (mesh_api.py:8-72 parity): one subdirectory
  per category. Three asset layouts are accepted, mirroring the
  reference's TEXTure_ckpt banks:

    <root>/<category>/<name>.obj                 flat (vertex-colored or
                                                 textured via .mtl)
    <root>/<category>/<name>/mesh/mesh.obj       TEXTure output layout
    <root>/person/<name>/<mode>/NNN.obj          animated person frame
                                                 sequences (walk/run/jump;
                                                 mesh_api.get_person_ckpt)
  """

  def __init__(self, root: str):
    self.root = root

  def list_assets(self, category: str):
    d = os.path.join(self.root, category)
    if not os.path.isdir(d):
      return []
    out = []
    for name in sorted(os.listdir(d)):
      p = os.path.join(d, name)
      if name.endswith(".obj"):
        out.append(p)
      elif os.path.isdir(p):
        nested = os.path.join(p, "mesh", "mesh.obj")
        if os.path.exists(nested):
          out.append(nested)
    return out

  def list_sequences(self, category: str = "person"):
    """Animated frame sequences: directories of per-frame .obj files
    (mesh_api.py:8-20). Returns a list of sorted frame-path lists."""
    d = os.path.join(self.root, category)
    if not os.path.isdir(d):
      return []
    seqs = []
    for name in sorted(os.listdir(d)):
      p = os.path.join(d, name)
      if not os.path.isdir(p):
        continue
      for mode in sorted(os.listdir(p)):
        md = os.path.join(p, mode)
        if not os.path.isdir(md):
          continue
        frames = sorted(os.path.join(md, f) for f in os.listdir(md)
                        if f.endswith(".obj"))
        if frames:
          seqs.append(frames)
    return seqs

  def sample(self, category: str, rng: np.random.RandomState):
    """(verts, faces, colors, path) — legacy vertex-attr interface."""
    a = self.sample_asset(category, rng)
    return a.verts, a.faces, a.colors, a.path

  def sample_asset(self, category: str,
                   rng: np.random.RandomState) -> MeshAsset:
    assets = self.list_assets(category)
    if not assets:
      raise FileNotFoundError(f"no {category} assets under {self.root}")
    path = assets[rng.randint(len(assets))]
    a = load_obj_asset(path)
    a.verts = center_mesh_bottom(a.verts, category)
    return a

  def sample_sequence(self, rng: np.random.RandomState,
                      category: str = "person") -> List[MeshAsset]:
    """One animated sequence as a list of per-frame MeshAssets, scale
    normalized consistently across frames (first frame's extent)."""
    seqs = self.list_sequences(category)
    if not seqs:
      raise FileNotFoundError(f"no {category} sequences under {self.root}")
    frames = seqs[rng.randint(len(seqs))]
    assets = [load_obj_asset(p) for p in frames]
    first = assets[0].verts
    mins, maxs = first.min(0), first.max(0)
    size = CATEGORY_SIZES.get(category, 1.0)
    extent = max(maxs[0] - mins[0], maxs[1] - mins[1])
    scale = size / extent if extent > 0 else 1.0
    center = (mins + maxs) / 2
    for a in assets:
      v = a.verts.copy()
      v[:, 0] -= center[0]
      v[:, 1] -= center[1]
      v[:, 2] -= mins[2]
      a.verts = v * scale
    return assets
