"""Depth-preparation pipeline orchestrator with plug-in model contracts.

Behavioral parity target: reference scripts/depth_model/scripts/
YORO_1CAM_PIPELINE_REFINE.py:85-800 (the 9-part per-camera pipeline) and
run.py/run_pipeline.py (per-scene, per-camera parallel driver).

The reference hardwires three external neural nets (SepFlow optical flow,
Sparse-Depth-Completion/NLSPN, mseg semantic segmentation). Here they are
pluggable callables with the exact file contracts the training loaders
consume (SURVEY.md §7 step 7):

  flow_fn(img0 [H,W,3] u8, img1) -> flow [H, W, 2] float32 (px)
  completion_fn(rgb [H,W,3] u8, sparse_depth_m [H,W] f32) -> depth_m f32
  segmentation_fn(rgb [H,W,3] u8) -> labels [H, W] int32 (sky == 142)

Outputs per frame: depths/%04d.png (uint16, meters x 256, sky 200 m),
matching s-nerf/dataloader/load_nuscenes.py:176-200.
"""

from __future__ import annotations

import dataclasses
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence

import numpy as np

from snerf_tpu.preprocess import lidar


@dataclasses.dataclass
class FrameData:
  """Everything the per-frame depth pipeline needs."""
  rgb: np.ndarray                 # [H, W, 3] uint8
  rgb_adjacent: np.ndarray        # neighbor frame (next for front cams)
  lidar_points: np.ndarray        # [3, N] (x, y, depth) projected, current
  lidar_points_adjacent: np.ndarray  # [3, N] same points in the neighbor


def default_segmentation_fn(rgb):
  """Fallback semantic labeler: classical sky detection only.

  Stands in for mseg (YORO:731-743) when no checkpoint is plugged in —
  emits label 142 (mseg sky) for bright, low-saturation pixels connected
  to the top border, 0 elsewhere. The only label the depth pipeline
  consumes is sky==142 (YORO:797 sets sky depth to 200 m); everything
  else needs a real segmentation net via segmentation_fn.
  """
  import cv2
  hsv = cv2.cvtColor(np.asarray(rgb, np.uint8), cv2.COLOR_RGB2HSV)
  sat = hsv[..., 1].astype(np.float32) / 255.0
  val = hsv[..., 2].astype(np.float32) / 255.0
  skyish = ((sat < 0.35) & (val > 0.55)).astype(np.uint8)
  skyish = cv2.morphologyEx(skyish, cv2.MORPH_OPEN,
                            np.ones((5, 5), np.uint8))
  # keep only components touching the top image border
  n, comp = cv2.connectedComponents(skyish)
  top_ids = np.unique(comp[0])
  sky = np.isin(comp, top_ids[top_ids > 0])
  labels = np.zeros(rgb.shape[:2], np.int32)
  labels[sky] = 142
  return labels


_DIAMOND_5 = np.array(
    [[0, 0, 1, 0, 0],
     [0, 1, 1, 1, 0],
     [1, 1, 1, 1, 1],
     [0, 1, 1, 1, 0],
     [0, 0, 1, 0, 0]], np.uint8)


def default_completion_fn(rgb, sparse_depth, max_depth: float = 100.0):
  """Fallback densifier: IP-Basic-style classical depth completion.

  Stands in for ERFNet/NLSPN when no checkpoint is plugged in (the
  reference also treats the completion net as swappable, YORO:711-729
  NLSPN vs SDC). Method per Ku et al. 2018 ("In Defense of Classical
  Image Processing: Fast Depth Completion on the CPU"): invert depths so
  morphological dilation picks the NEAREST (foreground) return, then
  diamond-kernel dilation -> small-hole closure -> progressively larger
  hole fills -> median + Gaussian smoothing on valid pixels -> un-invert.
  Occlusion-aware (foreground wins at object boundaries), no learning,
  ~ms per frame on CPU.
  """
  import cv2
  d = sparse_depth.astype(np.float32)
  valid = d > 0.1
  if not valid.any():
    return d
  # Invert: nearer returns become larger values, so max-pooling
  # (dilation) propagates foreground over background at boundaries.
  inv = np.where(valid, max_depth - np.minimum(d, max_depth), 0.0)

  inv = cv2.dilate(inv, _DIAMOND_5)
  # close small holes without moving edges
  inv = cv2.morphologyEx(inv, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8))
  # fill medium holes from a 7x7 dilation, only where still empty
  empty = inv < 0.1
  grown = cv2.dilate(inv, np.ones((7, 7), np.uint8))
  inv[empty] = grown[empty]
  # fill remaining large holes with progressively larger supports
  for k in (15, 31, 63):
    empty = inv < 0.1
    if not empty.any():
      break
    grown = cv2.dilate(inv, np.ones((k, k), np.uint8))
    inv[empty] = grown[empty]

  # smooth: median knocks out salt noise, Gaussian blends quantization —
  # both applied only where we have values (everything, by now, except
  # frames with huge empty regions)
  filled = inv > 0.1
  inv = cv2.medianBlur(inv, 5)
  blurred = cv2.GaussianBlur(inv, (5, 5), 0)
  inv[filled] = blurred[filled]

  out = np.where(inv > 0.1, max_depth - inv, 0.0)
  # keep the original returns exactly where we had them
  out[valid] = d[valid]
  return out.astype(np.float32)


def process_frame(frame: FrameData,
                  flow_fn: Callable,
                  completion_fn: Optional[Callable] = None,
                  segmentation_fn: Optional[Callable] = None,
                  running_mean: float = 0.0,
                  base_thres: float = 0.1):
  """One frame of the YORO pipeline (parts 3-9): flow -> LiDAR/flow
  consistency -> sparse depth -> completion -> reprojection refine ->
  sky override. Returns (depth_png_uint16, kept_points, new_thres)."""
  H, W = frame.rgb.shape[:2]
  im_flow = flow_fn(frame.rgb, frame.rgb_adjacent)

  mask, new_thres = lidar.adaptive_flow_filter(
      frame.lidar_points, frame.lidar_points_adjacent, im_flow,
      running_mean, base_thres)
  kept = frame.lidar_points[:, mask]
  sparse = lidar.points_to_depth_image(kept, (H, W))

  completion = completion_fn or default_completion_fn
  dense_m = completion(frame.rgb, sparse.astype(np.float32) / 256.0)

  # part 9: drop completed pixels with > 25% reprojection inconsistency
  pts = lidar.depth_image_to_points((dense_m * 256).astype(np.uint16))
  # reuse flow as the reprojection signal at the completed pixels
  drop = lidar.reprojection_refine_mask(
      frame.lidar_points, frame.lidar_points_adjacent, im_flow, (H, W))
  dense_m = dense_m.copy()
  dense_m[drop] = 0.0

  if segmentation_fn is not None:
    sem = segmentation_fn(frame.rgb)
    dense_m = lidar.apply_sky_depth(dense_m, sem)

  depth_png = np.clip(dense_m * 256.0, 0, 65535).astype(np.uint16)
  return depth_png, int(mask.sum()), new_thres


def run_camera_pipeline(frames: Sequence[FrameData], out_dir: str,
                        flow_fn: Callable,
                        completion_fn: Optional[Callable] = None,
                        segmentation_fn: Optional[Callable] = None):
  """Sequential per-camera loop with the running-mean threshold adaptation
  (YORO:600-614). Writes depths/%04d.png."""
  from PIL import Image
  os.makedirs(out_dir, exist_ok=True)
  running_mean = 0.0
  base_thres = 0.1
  for i, frame in enumerate(frames):
    png, n_kept, base_thres = process_frame(
        frame, flow_fn, completion_fn, segmentation_fn,
        running_mean=running_mean, base_thres=base_thres)
    running_mean = (running_mean * i + n_kept) / (i + 1)
    Image.fromarray(png).save(os.path.join(out_dir, f"{i:04d}.png"))
  return running_mean


def run_scene_pipeline(camera_frames: dict, out_root: str,
                       flow_fn: Callable,
                       completion_fn: Optional[Callable] = None,
                       segmentation_fn: Optional[Callable] = None,
                       max_workers: int = 6):
  """All cameras in parallel threads (run_pipeline.py:18-38 parity:
  6 cameras x threads; filesystem layout depths/<cam>/%04d.png)."""
  with ThreadPoolExecutor(max_workers=max_workers) as ex:
    futs = {
        cam: ex.submit(run_camera_pipeline, frames,
                       os.path.join(out_root, cam), flow_fn,
                       completion_fn, segmentation_fn)
        for cam, frames in camera_frames.items()}
    return {cam: f.result() for cam, f in futs.items()}
