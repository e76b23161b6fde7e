"""Visualization toolbox: depth/semantic colormaps, overlays.

Behavioral parity targets (re-derived):
  reference s-nerf/utils/vis_tools.py (visualize_depth/gray colormaps,
  lidar overlays), s-nerfpp/zipnerf/internal/vis.py:179-278 (depth/acc
  colormap suite), random_render_waymo_seq.py:25-33 (cityscapes-19
  semantic palette), annotate_code/visualize.py (2D/3D box drawing).
"""

from __future__ import annotations

import numpy as np

# Cityscapes 19-class palette (random_render_waymo_seq.py:25-33).
CITYSCAPES_PALETTE = np.array([
    [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
    [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
    [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
    [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
    [0, 0, 230], [119, 11, 32]], np.uint8)


def visualize_depth(depth, near=None, far=None, curve_fn=np.log1p):
  """Depth -> turbo-like rgb uint8 (vis.py:179-230 behavior: curve-map,
  normalize to percentiles, colormap)."""
  d = np.asarray(depth, np.float64)
  valid = np.isfinite(d) & (d > 0)
  if near is None:
    near = np.percentile(d[valid], 1) if valid.any() else 0.0
  if far is None:
    far = np.percentile(d[valid], 99) if valid.any() else 1.0
  x = curve_fn(np.clip(d, near, far))
  lo, hi = curve_fn(near), curve_fn(far)
  x = (x - lo) / max(hi - lo, 1e-10)
  return _colormap_turbo(1.0 - x)


def visualize_gray(x):
  """[0,1] scalar map -> gray uint8 (vis_tools.visualize_gray)."""
  return (np.clip(np.asarray(x), 0, 1) * 255).astype(np.uint8)


def semantic_to_rgb(labels, palette=CITYSCAPES_PALETTE):
  lab = np.clip(np.asarray(labels, np.int64), 0, len(palette) - 1)
  return palette[lab]


def overlay_points(image, xs, ys, values=None, radius: int = 1):
  """Scatter colored points (LiDAR overlay, vis_tools.py)."""
  out = np.asarray(image).copy()
  H, W = out.shape[:2]
  colors = (_colormap_turbo(
      (values - values.min()) / max(np.ptp(values), 1e-10))
      if values is not None else
      np.tile(np.array([255, 0, 0], np.uint8), (len(xs), 1)))
  for x, y, c in zip(np.round(xs).astype(int), np.round(ys).astype(int),
                     colors):
    y0, y1 = max(0, y - radius), min(H, y + radius + 1)
    x0, x1 = max(0, x - radius), min(W, x + radius + 1)
    out[y0:y1, x0:x1] = c
  return out


def draw_bbox_2d(image, bboxes, color=(0, 255, 0)):
  """Draw KITTI 2D boxes (annotate_code/visualize.py parity)."""
  import cv2
  out = np.ascontiguousarray(np.asarray(image).copy())
  for b in bboxes:
    cv2.rectangle(out, (int(b["xmin"]), int(b["ymin"])),
                  (int(b["xmax"]), int(b["ymax"])), color, 1)
    cv2.putText(out, b["category"], (int(b["xmin"]), int(b["ymin"]) - 2),
                cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
  return out


def kitti_bbox_corners(b):
  """8 corners of a KITTI 3D box in CAMERA coordinates (annotate_code/
  visualize.py convention: x right, y down, z forward; box bottom at
  pos_y, dims h/w/l, yaw rot_y about the camera y axis)."""
  h, w, l = b["height"], b["width"], b["length"]
  x = np.array([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2,
                -l / 2])
  y = np.array([0, 0, 0, 0, -h, -h, -h, -h])
  z = np.array([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2,
                w / 2])
  ry = b["rot_y"]
  rot = np.array([[np.cos(ry), 0, np.sin(ry)],
                  [0, 1, 0],
                  [-np.sin(ry), 0, np.cos(ry)]])
  pts = rot @ np.stack([x, y, z])
  return (pts + np.array([[b["pos_x"]], [b["pos_y"]],
                          [b["pos_z"]]])).T  # [8, 3]


_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7),
              (7, 4), (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_bbox_3d(image, bboxes, K, color=(255, 128, 0)):
  """Project and draw KITTI 3D boxes (visualize_one_rec parity)."""
  import cv2
  out = np.ascontiguousarray(np.asarray(image).copy())
  K = np.asarray(K)
  for b in bboxes:
    corners = kitti_bbox_corners(b)
    z = corners[:, 2]
    if (z <= 0.1).any():
      continue
    uv = (corners @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    for (a, c) in _BOX_EDGES:
      cv2.line(out, tuple(np.round(uv[a]).astype(int)),
               tuple(np.round(uv[c]).astype(int)), color, 1)
  return out


def _colormap_turbo(x):
  """Compact turbo colormap approximation; x in [0,1] -> rgb uint8."""
  x = np.clip(np.asarray(x, np.float64), 0, 1)
  r = np.clip(1.61 - np.abs(4.0 * x - 2.82), 0, 1)
  g = np.clip(1.61 - np.abs(4.0 * x - 1.61), 0, 1)
  b = np.clip(1.61 - np.abs(4.0 * x - 0.65), 0, 1)
  return (np.stack([r, g, b], -1) * 255).astype(np.uint8)
