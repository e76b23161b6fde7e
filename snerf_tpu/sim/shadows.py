"""Stage 3: ground-projected sun shadows.

Behavioral parity targets (re-derived):
  reference s-nerfpp/stage3_code/utils.py:130-155 (project_to_ground:
  slide vertices along the sun vector [sin p cos y, sin p sin y, cos p]
  until z = ground), mesh_shadow.py:21-113 (points -> 2D mask ->
  interpolate/close -> blur with kernel proportional to extent/5 ->
  darken image x (1 - 0.55 * mask), occlusion-checked against object
  masks).
"""

from __future__ import annotations

import numpy as np


def project_to_ground(points_3d, pitch_deg: float, yaw_deg: float,
                      ground_height=None):
  """Slide [N, 3] world points along the sun direction onto the ground
  plane (utils.py:130-155)."""
  pts = np.asarray(points_3d, np.float64)
  if pts.size == 0:
    return pts
  if ground_height is None:
    ground_height = np.min(pts[:, 2])
  p = np.deg2rad(pitch_deg)
  y = np.deg2rad(yaw_deg)
  light = np.array([np.sin(p) * np.cos(y), np.sin(p) * np.sin(y),
                    np.cos(p)])
  coef = (pts[:, 2] - ground_height) / light[2]
  return pts - light[None] * coef[:, None]


def points_to_mask(points_2d, hw):
  """Scatter projected points into a binary mask (mesh_shadow step 4)."""
  H, W = hw
  mask = np.zeros((H, W), np.uint8)
  x = np.round(points_2d[:, 0]).astype(int)
  y = np.round(points_2d[:, 1]).astype(int)
  keep = (x >= 0) & (x < W) & (y >= 0) & (y < H)
  mask[y[keep], x[keep]] = 255
  return mask


def interpolate_mask(mask, r: int = 20, iterations: int = 3):
  """Morphological closing to turn the point scatter into a region
  (mesh_shadow interpolate, step 5)."""
  import cv2
  kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (max(1, r),
                                                      max(1, r)))
  return cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel,
                          iterations=iterations)


def apply_shadow(image, shadow_mask, object_masks=None,
                 light_scale: float = 0.55):
  """Blur the shadow proportional to its extent and darken the image
  (mesh_shadow.py blur_shadow): out = img * (1 - 0.55 * blurred_mask),
  skipping pixels covered by foreground objects."""
  import cv2
  img = np.asarray(image, np.float32)
  m = shadow_mask > 0
  if not m.any():
    return img.astype(np.uint8) if img.max() > 1.5 else img
  ys, xs = np.where(m)
  w_size = max(1, int((xs.max() - xs.min()) // 5))
  h_size = max(1, int((ys.max() - ys.min()) // 5))
  blurred = cv2.blur(m.astype(np.float32), (w_size, h_size))
  if object_masks is not None:
    blurred = blurred * (~object_masks).astype(np.float32)
  weighted = light_scale * blurred
  out = img * (1.0 - weighted[..., None] if img.ndim == 3 else
               1.0 - weighted)
  return out.astype(img.dtype) if img.dtype == np.uint8 else out


def render_shadow(inst_world_verts, w2c, K, hw, pitch_deg: float = 30.0,
                  yaw_deg: float = 45.0, ground_height=None,
                  interpolate_r: int = 20):
  """Full shadow mask for one instance in one view."""
  ground_pts = project_to_ground(inst_world_verts, pitch_deg, yaw_deg,
                                 ground_height)
  cam = ground_pts @ np.asarray(w2c)[:3, :3].T + np.asarray(w2c)[:3, 3]
  z = np.maximum(cam[:, 2], 1e-6)
  valid = cam[:, 2] > 1e-6
  uv = np.stack([K[0, 0] * cam[:, 0] / z + K[0, 2],
                 K[1, 1] * cam[:, 1] / z + K[1, 2]], axis=1)[valid]
  mask = points_to_mask(uv, hw)
  return interpolate_mask(mask, r=interpolate_r)
