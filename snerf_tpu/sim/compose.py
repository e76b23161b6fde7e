"""Stage 1: foreground/background composition with occlusion + bboxes.

Behavioral parity targets (re-derived, in-process instead of
filesystem-IPC):
  reference s-nerfpp/stage1_code/utils_render.py:691-824 (occlusion order
  via mesh raytracing at the mask-intersection centroid), :255-305 (fuse:
  paste with depth test, update depth/semantic, bbox, lighting),
  :306-326 (boundary band for inpainting), :543-628 (get_bbox_result:
  KITTI fields, occlusion levels at 1%/50%/99%, truncation),
  :1008-1053 (handle_lighting: match instance brightness to background).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from snerf_tpu.sim import native
from snerf_tpu.sim.mesh import mesh_extents, place_mesh


@dataclasses.dataclass
class Instance:
  """A placed foreground asset (vertex-colored or UV-textured)."""
  verts: np.ndarray              # [V, 3] canonical (bottom at z=0)
  faces: np.ndarray              # [F, 3]
  colors: Optional[np.ndarray]   # [V, 3] in [0, 1] or None
  position: np.ndarray           # [3] world
  yaw_deg: float
  category: str = "vehicle"
  uvs: Optional[np.ndarray] = None      # [V, 2] seam-split UVs
  texture: Optional[np.ndarray] = None  # [Ht, Wt, 3] float [0, 1]

  def world_verts(self):
    return place_mesh(self.verts, self.position, self.yaw_deg)


def render_instance(inst: Instance, w2c, K, hw):
  """Rasterize one instance into the target view.

  Returns (rgb [H,W,3], depth [H,W], mask [H,W]) — the mesh_renderer.py
  forward pass (nvdiffrast+kaolin replacement). Textured instances
  rasterize perspective-correct UVs and bilinearly sample the texture
  (mesh_renderer.py:67-89 grid_sample path)."""
  from snerf_tpu.sim.mesh import sample_texture
  vw = inst.world_verts()
  vc = vw @ w2c[:3, :3].T + w2c[:3, 3]
  if inst.texture is not None and inst.uvs is not None:
    uv_img, depth, mask = native.rasterize(vc, inst.faces, inst.uvs, K,
                                           hw)
    rgb = np.zeros(hw + (3,), np.float32)
    rgb[mask] = sample_texture(inst.texture, uv_img[mask])
    return rgb, depth, mask
  attrs = inst.colors if inst.colors is not None else \
      np.full((len(vw), 3), 0.5, np.float32)
  rgb, depth, mask = native.rasterize(vc, inst.faces, attrs, K, hw)
  return rgb, depth, mask


def _centroid_distance_order(instances: List[Instance], ray_o):
  """Far-first order by raycast distance to each instance centroid — the
  tie-breaker / cycle fallback (also the reference's own abandoned
  fallback, utils_render.py:816-824)."""
  dists = []
  for inst in instances:
    vw = inst.world_verts()
    center = vw.mean(0)
    d = center - ray_o
    d = d / (np.linalg.norm(d) + 1e-12)
    t, _ = native.raycast(vw, inst.faces, ray_o[None].astype(np.float32),
                          d[None].astype(np.float32))
    dists.append(float(t[0]) if np.isfinite(t[0])
                 else float(np.linalg.norm(center - ray_o)))
  return list(np.argsort(dists)[::-1])


def occlusion_order(instances: List[Instance], w2c, K, hw):
  """Back-to-front paint order, exact pairwise raycast decision.

  Parity: utils_render.py:691-824 (occlution_order) — rasterize each
  instance's mask; for every pair with overlapping masks cast ONE ray
  through the mask-intersection centroid, compare first-hit distances to
  decide who occludes whom; topological-sort the DAG so occluders paint
  last. Pairs without overlap impose no constraint. A cycle (mutually
  interpenetrating instances; the reference raises) degrades to the
  centroid-distance order.
  """
  n = len(instances)
  if n <= 1:
    return list(range(n))
  c2w = np.linalg.inv(_pad44(w2c))
  ray_o = c2w[:3, 3].astype(np.float32)
  Kinv = np.linalg.inv(np.asarray(K, np.float64))

  masks, worlds = [], []
  for inst in instances:
    _, _, mask = render_instance(inst, w2c, K, hw)
    masks.append(mask)
    worlds.append(inst.world_verts().astype(np.float32))

  def first_hit(i, d):
    t, _ = native.raycast(worlds[i], instances[i].faces, ray_o[None],
                          d[None].astype(np.float32))
    if np.isfinite(t[0]):
      return float(t[0])
    return float(np.linalg.norm(worlds[i].mean(0) - ray_o))

  # adjacency: adj[i, j] = 1 means i must be painted before j
  adj = np.zeros((n, n), np.uint8)
  for i in range(n):
    for j in range(i + 1, n):
      inter = masks[i] & masks[j]
      if not inter.any():
        continue
      ys, xs = np.nonzero(inter)
      pix = np.array([xs.mean(), ys.mean(), 1.0])
      d = c2w[:3, :3] @ (Kinv @ pix)   # +z-forward pinhole (native.py:63)
      d = (d / np.linalg.norm(d)).astype(np.float32)
      if first_hit(i, d) < first_hit(j, d):
        adj[j, i] = 1                  # i occludes j -> j paints first
      else:
        adj[i, j] = 1

  # topological sort (utils_render.py:794-807): repeatedly emit the
  # lowest-index node with no unpainted predecessor
  order = []
  emitted = np.zeros(n, bool)
  while len(order) < n:
    for i in range(n):
      if not emitted[i] and not adj[~emitted][:, i].any():
        order.append(i)
        emitted[i] = True
        break
    else:
      return _centroid_distance_order(instances, ray_o)  # cycle
  return order


def handle_lighting(fg_rgb, bg_rgb, mask, strength: float = 0.5):
  """Shift instance brightness toward the local background level
  (handle_lighting, utils_render.py:1008-1053)."""
  if mask.sum() == 0:
    return fg_rgb
  fg_mean = fg_rgb[mask].mean()
  bg_mean = bg_rgb[~mask].mean() if (~mask).any() else fg_mean
  out = fg_rgb.copy()
  out[mask] = np.clip(
      fg_rgb[mask] + strength * (bg_mean - fg_mean), 0, 1)
  return out


def boundary_band(mask, r: int = 3):
  """Dilate XOR erode band around a paste mask — the inpainting region
  (get_bound_im, utils_render.py:306-326)."""
  import cv2
  m = mask.astype(np.uint8) * 255
  kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (max(1, r),
                                                      max(1, r)))
  larger = cv2.dilate(m, kernel)
  smaller = cv2.erode(m, kernel)
  return np.logical_xor(larger > 0, smaller > 0)


def occlusion_level(occlusion_per: float) -> int:
  """KITTI occlusion bucket (get_bbox_result, utils_render.py:560-568)."""
  if occlusion_per < 0.01:
    return 0
  if occlusion_per < 0.5:
    return 1
  if occlusion_per < 0.99:
    return 2
  return 3


_CATEGORY_KITTI = {"vehicle": "Car", "person": "Pedestrian",
                   "bicycle": "Bicycle", "motorcycle": "Motorcycle",
                   "object": "Object"}


def projected_truncation(inst: Instance, w2c, K, hw) -> float:
  """KITTI truncation = fraction of the projected (pre-clip) 2D bbox that
  falls outside the frame. Computed from the full mesh projection (the
  rasterized mask is already clipped, so it cannot express truncation;
  the reference leaves the field at 0 — utils_render.py:616)."""
  H, W = hw
  vw = inst.world_verts()
  vc = vw @ np.asarray(w2c)[:3, :3].T + np.asarray(w2c)[:3, 3]
  z = vc[:, 2]
  in_front = z > 1e-6
  if not in_front.any():
    return 1.0
  Km = np.asarray(K, np.float64)
  x = Km[0, 0] * vc[in_front, 0] / z[in_front] + Km[0, 2]
  y = Km[1, 1] * vc[in_front, 1] / z[in_front] + Km[1, 2]
  x0, x1 = float(x.min()), float(x.max())
  y0, y1 = float(y.min()), float(y.max())
  full = max(x1 - x0, 1e-9) * max(y1 - y0, 1e-9)
  cx0, cx1 = np.clip([x0, x1], 0, W - 1)
  cy0, cy1 = np.clip([y0, y1], 0, H - 1)
  clipped = max(cx1 - cx0, 0.0) * max(cy1 - cy0, 0.0)
  frac_behind = 1.0 - in_front.mean()   # verts behind the camera
  return float(np.clip(1.0 - clipped / full + frac_behind, 0.0, 1.0))


def bbox_result(inst: Instance, w2c, K, hw, mask, occlusion_per: float):
  """KITTI-format detection dict (get_bbox_result parity)."""
  H, W = hw
  ys, xs = np.where(mask)
  if xs.size == 0:
    xmin = ymin = xmax = ymax = 0
    truncated = 1.0
  else:
    xmin, xmax = int(xs.min()), int(xs.max())
    ymin, ymax = int(ys.min()), int(ys.max())
    truncated = projected_truncation(inst, w2c, K, hw)

  center_h = np.concatenate([inst.position, [1.0]])
  pos_cam = (_pad44(w2c) @ center_h)[:3]
  h, w, l = mesh_extents(inst.verts)

  # rot_y: yaw in the camera frame (KITTI convention; utils_render.py
  # :593-600 composes w2c rotation with the placement yaw)
  a = np.deg2rad(inst.yaw_deg)
  rot_z = np.array([[np.cos(a), -np.sin(a), 0],
                    [np.sin(a), np.cos(a), 0], [0, 0, 1]])
  rot_axis = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.0]])
  rot_y_mat = w2c[:3, :3] @ rot_z @ rot_axis.T
  rot_y = float(np.arctan2(rot_y_mat[0, 2], rot_y_mat[2, 2]))

  alpha = rot_y - float(np.arctan2(pos_cam[0], pos_cam[2]))
  return {
      "category": _CATEGORY_KITTI.get(inst.category, "Object"),
      "truncated": float(truncated),
      "occlusion": occlusion_level(occlusion_per),
      "alpha": alpha,
      "xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax,
      "height": h, "width": w, "length": l,
      "pos_x": float(pos_cam[0]), "pos_y": float(pos_cam[1]),
      "pos_z": float(pos_cam[2]), "rot_y": rot_y,
  }


def compose_view(bg_rgb, bg_depth, bg_semantic, instances: List[Instance],
                 w2c, K, semantic_id: int = 13,
                 lighting_strength: float = 0.5):
  """Paint all instances into a rendered background view.

  bg_rgb [H,W,3] float [0,1]; bg_depth [H,W] metric; bg_semantic [H,W]
  int or None. Returns dict(rgb, depth, semantic, bboxes, masks,
  inpaint_band). Depth-tested per pixel against both the background and
  previously painted instances (fuse + handle_occlusion_paste parity).
  """
  H, W = bg_depth.shape
  hw = (H, W)
  out_rgb = bg_rgb.copy()
  out_depth = bg_depth.copy()
  out_sem = None if bg_semantic is None else bg_semantic.copy()

  order = occlusion_order(instances, w2c, K, hw) if len(instances) > 1 \
      else list(range(len(instances)))
  bboxes, masks = [], []
  band = np.zeros((H, W), bool)
  relight = np.zeros((H, W), bool)
  for i in order:
    inst = instances[i]
    rgb, depth, mask = render_instance(inst, w2c, K, hw)
    visible = mask & ((out_depth <= 0) | (depth < out_depth))
    occl_per = 1.0 - visible.sum() / max(mask.sum(), 1)
    rgb = handle_lighting(rgb, out_rgb, visible,
                          strength=lighting_strength)
    out_rgb[visible] = rgb[visible]
    out_depth[visible] = depth[visible]
    if out_sem is not None:
      out_sem[visible] = semantic_id
    band |= boundary_band(visible)
    # relight pass operates on the union of VEHICLE masks only
    # (generate_images.py:160-164 "We only do this for vehicles")
    if getattr(inst, "category", "vehicle") == "vehicle":
      relight |= visible
    bboxes.append(bbox_result(inst, w2c, K, hw, visible, occl_per))
    masks.append(visible)
  return dict(rgb=out_rgb, depth=out_depth, semantic=out_sem,
              bboxes=bboxes, masks=masks, inpaint_band=band,
              relight_mask=relight)


def _pad44(m):
  if m.shape == (4, 4):
    return m
  out = np.eye(4, dtype=np.float64)
  out[:3, :4] = m
  return out
