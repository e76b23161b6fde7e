"""Stage 0: foreground placement from rendered depth + semantics.

Behavioral parity targets (re-derived):
  reference s-nerfpp/stage0_code/utils_render.py:74-135
  (get_semantic_points: unproject rendered depth via K^-1 then c2w,
  random 1% keep, depth < 60 m), :185-208 (find_max_region keeps the
  largest contour), :210-363 (build_bev: 0.1 m grid, 95% scale,
  morphology close on drivable / open on undrivable+obstacle, markers
  255/127/64, height map), :364-474 (sample_pos_from_bev: camera-frustum
  visibility cone, rejection sampling on surrounding undrivable/obstacle
  ratios, ground height from the local height map).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

DRIVABLE_MARK = 255
UNDRIVABLE_MARK = 127
OBSTACLE_MARK = 64


def unproject_depth_semantic(depths, semantics, intrinsics, c2ws,
                             drop_ratio: float = 0.99,
                             max_depth: float = 60.0,
                             rng: Optional[np.random.RandomState] = None):
  """Rendered views -> world points + labels (get_semantic_points).

  depths [V, H, W] (metric), semantics [V, H, W] int, intrinsics
  [V, 3, 3], c2ws [V, 4, 4] (OpenCV-style +z forward raw poses).
  Returns (points [N, 3], labels [N]).
  """
  rng = rng or np.random.RandomState(0)
  pts_all, lab_all = [], []
  for v in range(len(depths)):
    d = depths[v]
    ys, xs = np.where(d < max_depth)
    n = len(xs)
    keep = max(int(n * (1 - drop_ratio)), 1)
    sel = rng.choice(n, size=keep, replace=False)
    xs, ys = xs[sel], ys[sel]
    dv = d[ys, xs]
    p = np.stack([xs, ys, np.ones_like(xs)], 0).astype(np.float64) * dv
    p = np.linalg.inv(intrinsics[v]) @ p
    p = np.concatenate([p, np.ones((1, p.shape[1]))], 0)
    p = (c2ws[v] @ p)[:3].T
    pts_all.append(p)
    lab_all.append(semantics[v][ys, xs])
  return np.concatenate(pts_all, 0), np.concatenate(lab_all, 0)


def find_max_region(mask):
  """Keep only the largest connected component (utils_render.py:185-208)."""
  import cv2
  n, labels, stats, _ = cv2.connectedComponentsWithStats(
      (mask > 0).astype(np.uint8))
  if n <= 1:
    return mask
  largest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
  out = mask.copy()
  out[labels != largest] = 0
  return out


def build_bev(points, semantics, drivable_idx: int,
              undrivable_idx: Sequence[int] = (),
              obstacle_idx: Sequence[int] = ()):
  """World points -> BEV maps dict (build_bev, utils_render.py:218-330)."""
  import cv2
  drivable = points[semantics == drivable_idx]
  und = (np.concatenate([points[semantics == i] for i in undrivable_idx])
         if len(undrivable_idx) else None)
  obs = (np.concatenate([points[semantics == i] for i in obstacle_idx])
         if len(obstacle_idx) else None)

  x, y, h = drivable[:, 0].copy(), drivable[:, 1].copy(), drivable[:, 2]
  mean_h = h.mean()
  if und is not None and len(und):
    und = und[und[:, 2] < mean_h + 5]
  x_range = x.max() - x.min()
  y_range = y.max() - y.min()
  bev_W, bev_H = int(x_range * 10), int(y_range * 10)
  bev = np.zeros((bev_H, bev_W), np.uint8)
  height_map = np.zeros((bev_H, bev_W), np.float32)
  und_map = np.zeros_like(bev)
  obs_map = np.zeros_like(bev)

  x_bias, y_bias = x.min(), y.min()
  x_scale = 0.95 * bev_W / x_range
  y_scale = 0.95 * bev_H / y_range

  def to_bev(px, py):
    bx = ((px - x_bias) * x_scale).astype(np.int32)
    by = ((py - y_bias) * y_scale).astype(np.int32)
    m = (bx >= 0) & (bx < bev_W) & (by >= 0) & (by < bev_H)
    return bx[m], by[m], m

  bx, by, m = to_bev(x, y)
  bev[by, bx] = DRIVABLE_MARK
  height_map[by, bx] = h[m]
  if und is not None and len(und):
    ux, uy, _ = to_bev(und[:, 0], und[:, 1])
    und_map[uy, ux] = 255
  if obs is not None and len(obs):
    ox, oy, _ = to_bev(obs[:, 0], obs[:, 1])
    obs_map[oy, ox] = 255

  r = max(max(bev_H, bev_W) // 300, 1)
  kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (r, r))
  small = cv2.getStructuringElement(
      cv2.MORPH_RECT, (max(r // 5, 1), max(r // 5, 1)))
  refined = cv2.morphologyEx(bev, cv2.MORPH_CLOSE, kernel)
  und_map = cv2.morphologyEx(und_map, cv2.MORPH_OPEN, small)
  obs_map = cv2.morphologyEx(obs_map, cv2.MORPH_OPEN, small)
  refined[und_map > 0] = UNDRIVABLE_MARK
  refined[obs_map > 0] = OBSTACLE_MARK

  return {"x_ori_bias": x_bias, "y_ori_bias": y_bias,
          "x_scale": x_scale, "y_scale": y_scale,
          "bev_map": bev, "bev_map_refined": refined,
          "height_map": height_map}


def mask_invisible_regions(bev_map, bev_result, render_pose, intrinsic):
  """Zero BEV cells outside the camera's horizontal FoV cone
  (sample_pos_from_bev inner, utils_render.py:380-420)."""
  H = 2 * intrinsic[1, 2]
  W = 2 * intrinsic[0, 2]
  xb, yb = bev_result["x_ori_bias"], bev_result["y_ori_bias"]
  xs, ys = bev_result["x_scale"], bev_result["y_scale"]

  def inv_proj(px, py):
    p = np.linalg.inv(intrinsic) @ np.array([px, py, 1.0])
    p = render_pose @ np.concatenate([p, [1.0]])
    return p[:3]

  center = inv_proj(W / 2, H / 2)
  ray_o = render_pose[:3, 3]
  o_bev = np.array([(ray_o[0] - xb) * xs, (ray_o[1] - yb) * ys])
  c_bev = np.array([(center[0] - xb) * xs, (center[1] - yb) * ys])
  d = c_bev - o_bev
  d = d / (np.linalg.norm(d) + 1e-12)
  edge = inv_proj(W, H / 2)
  e_bev = np.array([(edge[0] - xb) * xs, (edge[1] - yb) * ys]) - o_bev
  e_bev = e_bev / (np.linalg.norm(e_bev) + 1e-12)
  cos_thres = float(np.dot(e_bev, d))

  bh, bw = bev_map.shape
  gx, gy = np.meshgrid(np.arange(bw), np.arange(bh))
  vx = gx - o_bev[0]
  vy = gy - o_bev[1]
  norm = np.sqrt(vx ** 2 + vy ** 2) + 1e-12
  cos_vals = (vx * d[0] + vy * d[1]) / norm
  out = bev_map.copy()
  out[cos_vals < cos_thres] = 0
  return out


def sample_position(bev_result, reject_r: float, render_pose, intrinsic,
                    rng: Optional[np.random.RandomState] = None,
                    max_tries: int = 20):
  """One candidate world position inside the visible drivable region
  (sample_pos_from_bev, utils_render.py:364-474).

  Returns (x, y, z_ground, fail_flag)."""
  rng = rng or np.random.RandomState(0)
  bev = bev_result["bev_map_refined"]
  ori = bev_result["bev_map"]
  hmap = bev_result["height_map"]
  bh, bw = bev.shape
  xs, ys = bev_result["x_scale"], bev_result["y_scale"]
  xb, yb = bev_result["x_ori_bias"], bev_result["y_ori_bias"]

  masked = mask_invisible_regions(bev, bev_result, render_pose, intrinsic)
  yy, xx = np.where(masked > 0)
  if yy.size == 0:
    return 0.0, 0.0, 0.0, True

  ct = 0
  fail = False
  x_bev = y_bev = 0
  while True:
    i = rng.randint(0, yy.size)
    x_bev, y_bev = int(xx[i]), int(yy[i])
    rx, ry = int(reject_r * xs), int(reject_r * ys)
    sur = bev[max(0, y_bev - ry):min(bh, y_bev + ry + 1),
              max(0, x_bev - rx):min(bw, x_bev + rx + 1)]
    und = (sur == UNDRIVABLE_MARK).sum()
    obs = (sur == OBSTACLE_MARK).sum()
    drv = (sur == DRIVABLE_MARK).sum()
    if ct > max_tries:
      fail = True
      break
    if drv == 0 or und / max(drv, 1) > 1 or obs / max(drv, 1) > 0.2:
      ct += 1
      continue
    break

  reg = ori[max(y_bev - bh // 20, 0):min(y_bev + bh // 20, bh - 1),
            max(x_bev - bw // 20, 0):min(x_bev + bw // 20, bw - 1)]
  reg_h = hmap[max(y_bev - bh // 20, 0):min(y_bev + bh // 20, bh - 1),
               max(x_bev - bw // 20, 0):min(x_bev + bw // 20, bw - 1)]
  hd = reg_h[reg > 0]
  z = float(hd.mean()) if hd.size else -9999.0
  fail = fail or hd.size == 0
  return (x_bev / xs + xb, y_bev / ys + yb, z, fail)


def generate_positions(bev_result, render_poses, intrinsics,
                       n_per_pose: int = 1, reject_r: float = 3.0,
                       min_separation: float = 4.0, seed: int = 0):
  """Non-overlapping instance positions per render pose
  (generate_pos_from_render_poses, utils_render.py:476-600).

  Returns a list (one entry per pose) of [k, 3] world positions."""
  rng = np.random.RandomState(seed)
  out = []
  for pose, K in zip(render_poses, intrinsics):
    placed = []
    for _ in range(n_per_pose):
      x, y, z, fail = sample_position(bev_result, reject_r, pose, K, rng)
      if fail:
        continue
      if any(np.hypot(x - p[0], y - p[1]) < min_separation
             for p in placed):
        continue
      placed.append((x, y, z))
    out.append(np.array(placed).reshape(-1, 3))
  return out
