"""LiDAR -> depth projection + optical-flow consistency filtering.

Behavioral parity targets (math re-derived, vectorized):
  reference scripts/depth_model/scripts/YORO_1CAM_PIPELINE_REFINE.py:
  237-262 (consistency_check: flow-magnitude-adaptive threshold tiers),
  264-271 (points2im 16-bit depth png at x256), 273-279 (im2points),
  281-289 (consistency_check_new: relative reprojection error > 25%
  drops pixels), 540-625 (accumulate +-frames sweeps, adaptive base_thres
  retry loop when the kept-point count collapses), 793-800 (sky class
  142 -> 200 m).
"""

from __future__ import annotations

import numpy as np

SKY_CLASS = 142          # mseg 'sky' label (YORO:797)
SKY_DEPTH_M = 200.0


def project_points_to_camera(points_world, c2w, K, hw,
                             min_dist: float = 1.0):
  """World points [N, 3] -> image-plane points [3, M] (x, y, depth).

  Keeps points in front of the camera (z < 0 in the [r, u, -t]
  convention is NOT used here — this uses the raw nuScenes/OpenCV
  convention: +z forward), at least min_dist away, inside the image.
  """
  H, W = hw
  w2c = np.linalg.inv(_pad44(c2w))
  pts = points_world @ w2c[:3, :3].T + w2c[:3, 3]
  z = pts[:, 2]
  keep = z > min_dist
  pts = pts[keep]
  z = z[keep]
  uv = pts @ K.T
  x = uv[:, 0] / z
  y = uv[:, 1] / z
  inside = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
  return np.stack([x[inside], y[inside], z[inside]], axis=0)


def _pad44(p):
  if p.shape == (4, 4):
    return p
  out = np.eye(4, dtype=p.dtype)
  out[:3, :4] = p
  return out


def accumulate_sweeps(sweep_points, sweep_poses, target_c2w):
  """Merge LiDAR sweeps into the target frame's world coordinates.

  sweep_points: list of [Ni, 3] in each sweep's sensor frame;
  sweep_poses: list of [4, 4] sensor-to-world; target_c2w unused here
  (points are merged in world space; projection handles the target).
  Parity: map_pointcloud_to_image accumulation over +-6/12 sweeps.
  """
  del target_c2w
  merged = [pts @ pose[:3, :3].T + pose[:3, 3]
            for pts, pose in zip(sweep_points, sweep_poses)]
  return np.concatenate(merged, axis=0)


def flow_consistency_mask(points, next_points, im_flow,
                          base_thres: float = 0.1):
  """Keep LiDAR points whose image-space motion matches optical flow.

  points/next_points: [3, N] (x, y, depth) in current/adjacent frame;
  im_flow: [H, W, 2]. Vectorized port of the reference's per-point loop
  (YORO:237-262) with its threshold tiers:
    default: 3 + 0.1 * |flow|
    50 < |flow| < 100:  0.3 |flow| + 5
    100 < |flow| < 150: 0.8 |flow| + 5
    |flow| > 150 or depth < 3.5: always keep (threshold inf)
  """
  x1 = np.round(points[0]).astype(int)
  y1 = np.round(points[1]).astype(int)
  lidar_flow = (next_points[:2] - points[:2]).T  # [N, 2]
  flow = im_flow[y1, x1]                          # [N, 2]
  depth = points[2]

  fn = np.linalg.norm(flow, axis=-1)
  thres = 3.0 + fn * base_thres
  thres = np.where((fn > 50) & (fn < 100), fn * 0.3 + 5, thres)
  thres = np.where((fn > 100) & (fn < 150), fn * 0.8 + 5, thres)
  thres = np.where((fn > 150) | (depth < 3.5), np.inf, thres)
  err = np.linalg.norm(flow - lidar_flow, axis=-1)
  return err <= thres


def adaptive_flow_filter(points, next_points, im_flow,
                         running_mean: float,
                         base_thres: float = 0.1,
                         max_tries: int = 2):
  """Relax the threshold when the kept-point count collapses > 20% below
  the running mean (YORO:600-614). Returns (mask, new_base_thres)."""
  mask = flow_consistency_mask(points, next_points, im_flow, base_thres)
  n = mask.sum()
  tries = 0
  while (tries < max_tries and running_mean > 0 and n < running_mean and
         (running_mean - n) > 0.2 * running_mean):
    base_thres += 0.05
    mask = flow_consistency_mask(points, next_points, im_flow, base_thres)
    n = mask.sum()
    tries += 1
  return mask, base_thres


def points_to_depth_image(points, hw) -> np.ndarray:
  """Scatter (x, y, depth) points into a uint16 depth png (x256)
  (points2im, YORO:264-271)."""
  H, W = hw
  im = np.zeros((H, W), np.uint16)
  x = np.round(points[0]).astype(int)
  y = np.round(points[1]).astype(int)
  d = np.round(points[2] * 256).astype(np.uint16)
  # match the loop's last-write-wins semantics
  im[y, x] = d
  return im


def depth_image_to_points(im) -> np.ndarray:
  """Inverse of points_to_depth_image (im2points, YORO:273-279):
  [3, H*W] (x, y, depth_m)."""
  H, W = im.shape
  x, y = np.meshgrid(np.arange(W), np.arange(H))
  return np.stack([x.ravel(), y.ravel(),
                   (im / 256.0).ravel()], axis=0)


def reprojection_refine_mask(points, another_points, flow_im,
                             hw, rel_thresh: float = 0.25):
  """Drop completed-depth pixels whose reprojected motion disagrees with
  flow by > rel_thresh relative error (consistency_check_new,
  YORO:281-289). Returns a boolean [H, W] drop-mask."""
  H, W = hw
  xi = points[0].astype(int)
  yi = points[1].astype(int)
  d_lidar = (another_points[:2] - points[:2])     # [2, N]
  fl = flow_im[yi, xi].T                           # [2, N]
  rel = (np.linalg.norm(d_lidar - fl, axis=0) /
         np.maximum(np.linalg.norm(fl, axis=0), 1e-12))
  conf = np.zeros((H, W))
  conf[yi, xi] = rel
  return conf > rel_thresh


def apply_sky_depth(depth_m, semantic, sky_class: int = SKY_CLASS,
                    sky_depth: float = SKY_DEPTH_M):
  """Force sky pixels to 200 m (YORO:793-800)."""
  out = depth_m.copy()
  out[semantic == sky_class] = sky_depth
  return out
