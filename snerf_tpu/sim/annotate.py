"""Stage 4: annotation assembly — KITTI bbox files + dataset layout.

Behavioral parity targets (re-derived):
  reference s-nerfpp/annotate_code/count_bbox.py:19-206 (KITTI label
  line format: type truncated occluded alpha bbox(4) dims(h w l)
  loc(x y z) rot_y), get_results.py:37-96 (annotation/<scene>/<ts>/
  {image,depth,semantic,bbox,...} layout + poses/intrinsics npy),
  merge_results.py (concatenate runs), check_all_annotation.py
  (completeness verification).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, Sequence

import numpy as np

SUBDIRS = ("image", "depth", "semantic", "bbox")


def bbox_to_kitti_line(b: Dict) -> str:
  """One KITTI label line (count_bbox.py format)."""
  return (f"{b['category']} {b['truncated']:.2f} {b['occlusion']} "
          f"{b['alpha']:.2f} {b['xmin']} {b['ymin']} {b['xmax']} "
          f"{b['ymax']} {b['height']:.2f} {b['width']:.2f} "
          f"{b['length']:.2f} {b['pos_x']:.2f} {b['pos_y']:.2f} "
          f"{b['pos_z']:.2f} {b['rot_y']:.2f}")


def parse_kitti_line(line: str) -> Dict:
  p = line.split()
  return {"category": p[0], "truncated": float(p[1]),
          "occlusion": int(p[2]), "alpha": float(p[3]),
          "xmin": int(float(p[4])), "ymin": int(float(p[5])),
          "xmax": int(float(p[6])), "ymax": int(float(p[7])),
          "height": float(p[8]), "width": float(p[9]),
          "length": float(p[10]), "pos_x": float(p[11]),
          "pos_y": float(p[12]), "pos_z": float(p[13]),
          "rot_y": float(p[14])}


def write_annotation(out_root: str, scene: str, frames: Sequence[Dict],
                     render_poses=None, intrinsics=None,
                     bev_results=None, timestamp: str = None,
                     write_vis: bool = False) -> str:
  """Assemble one annotation run.

  frames: list of dicts with rgb [H,W,3] float/uint8, depth [H,W] metric,
  semantic [H,W] int or None, bboxes (list of bbox dicts).
  Layout parity: get_results.py:37-96.
  """
  import imageio.v2 as imageio
  ts = timestamp or time.strftime("%Y%m%d_%H%M%S")
  run_dir = os.path.join(out_root, scene, ts)
  for sub in SUBDIRS:
    os.makedirs(os.path.join(run_dir, sub), exist_ok=True)

  for i, fr in enumerate(frames):
    rgb = fr["rgb"]
    if rgb.dtype != np.uint8:
      rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    imageio.imwrite(os.path.join(run_dir, "image", f"{i:05d}.png"), rgb)
    depth16 = np.clip(fr["depth"] * 256.0, 0, 65535).astype(np.uint16)
    imageio.imwrite(os.path.join(run_dir, "depth", f"{i:05d}.png"),
                    depth16)
    if fr.get("semantic") is not None:
      np.save(os.path.join(run_dir, "semantic", f"{i:05d}.npy"),
              fr["semantic"].astype(np.int32))
    with open(os.path.join(run_dir, "bbox", f"{i:05d}.txt"), "w") as f:
      for b in fr.get("bboxes", []):
        f.write(bbox_to_kitti_line(b) + "\n")
    if write_vis and fr.get("bboxes") and intrinsics is not None:
      # vis/ with drawn 2D+3D boxes (get_results.py vis output parity)
      from snerf_tpu.utils.vis import draw_bbox_2d, draw_bbox_3d
      os.makedirs(os.path.join(run_dir, "vis"), exist_ok=True)
      K = intrinsics[i] if np.ndim(intrinsics) == 3 else intrinsics
      vis = draw_bbox_2d(rgb, fr["bboxes"])
      vis = draw_bbox_3d(vis, fr["bboxes"], K)
      imageio.imwrite(os.path.join(run_dir, "vis", f"{i:05d}.png"), vis)

  if render_poses is not None:
    np.save(os.path.join(run_dir, "target_poses.npy"), render_poses)
  if intrinsics is not None:
    np.save(os.path.join(run_dir, "intrinsic.npy"), intrinsics)
  if bev_results is not None:
    np.save(os.path.join(run_dir, "bev_results.npy"), bev_results,
            allow_pickle=True)
  return run_dir


def check_annotation(run_dir: str) -> Dict:
  """Verify a run is complete (check_all_annotation.py parity).

  Returns dict(complete, n_frames, missing)."""
  counts = {}
  for sub in ("image", "depth", "bbox"):
    d = os.path.join(run_dir, sub)
    counts[sub] = len(os.listdir(d)) if os.path.isdir(d) else 0
  n = counts["image"]
  missing = [s for s, c in counts.items() if c != n]
  return {"complete": not missing and n > 0, "n_frames": n,
          "missing": missing}


def merge_runs(out_root: str, scene: str, dest: str) -> int:
  """Concatenate all runs of a scene into one flat dataset
  (merge_results.py parity). Returns total frames."""
  scene_dir = os.path.join(out_root, scene)
  runs = sorted(os.listdir(scene_dir)) if os.path.isdir(scene_dir) else []
  for sub in SUBDIRS:
    os.makedirs(os.path.join(dest, sub), exist_ok=True)
  idx = 0
  for run in runs:
    run_dir = os.path.join(scene_dir, run)
    imgs = sorted(os.listdir(os.path.join(run_dir, "image")))
    for name in imgs:
      stem = os.path.splitext(name)[0]
      for sub, ext in (("image", ".png"), ("depth", ".png"),
                       ("semantic", ".npy"), ("bbox", ".txt")):
        src = os.path.join(run_dir, sub, stem + ext)
        if os.path.exists(src):
          shutil.copy(src, os.path.join(dest, sub, f"{idx:05d}{ext}"))
      idx += 1
  return idx


def label_statistics(run_dir: str) -> Dict:
  """Per-class box counts (filter_annotation.py parity)."""
  stats = {}
  bbox_dir = os.path.join(run_dir, "bbox")
  for fname in sorted(os.listdir(bbox_dir)):
    with open(os.path.join(bbox_dir, fname)) as f:
      for line in f:
        if line.strip():
          cat = line.split()[0]
          stats[cat] = stats.get(cat, 0) + 1
  return stats
