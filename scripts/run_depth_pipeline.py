#!/usr/bin/env python
"""Depth-preparation pipeline CLI (reference scripts/depth_model/scripts/
run.py + run_pipeline.py).

Consumes per-camera frame data prepared as npz bundles and produces
depths/<cam>/%04d.png (uint16, meters x 256) via the plug-in pipeline
(snerf_tpu.preprocess.pipeline). Flow defaults to the hybrid provider
(RAFT-lite init + LK sub-pixel polish + photometric selection); pass
--flow none to use zero flow (keeps everything, no consistency
filtering) or plug a learned model in library use.

Input contract per camera dir: frames.npz with arrays
  rgb [N, H, W, 3] u8, rgb_adjacent [N, H, W, 3] u8,
  lidar_points (object array of [3, Mi]), lidar_points_adjacent (same).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--datadir", required=True,
                 help="dir with <cam>/frames.npz per camera")
  p.add_argument("--outdir", required=True)
  p.add_argument("--flow", default="hybrid",
                 choices=["hybrid", "tpu", "farneback", "raftlite",
                          "none"],
                 help="hybrid (default) = RAFT-lite init + LK polish "
                      "+ photometric selection — >= LK on every eval "
                      "fixture (scripts/eval_flow.py table in PERF.md)")
  p.add_argument("--flow_weights", default="",
                 help="npz weights for --flow raftlite "
                      "(scripts/eval_flow.py --save trains them)")
  p.add_argument("--flow_tile", type=int, default=384,
                 help="raftlite tiled-inference crop size for frames "
                      "larger than this (the all-pairs correlation "
                      "volume is O((HW/16)^2) memory); 0 = never tile")
  p.add_argument("--completion", default="classical",
                 choices=["classical", "sdc", "nlspn"],
                 help="sdc = learned uncertainty_net "
                      "(nets/sdc.py; reference Models/model.py); "
                      "nlspn = non-local spatial propagation "
                      "(nets/nlspn.py; reference YORO:706-714)")
  p.add_argument("--completion_weights", default="",
                 help=".pth/.npz checkpoint for --completion sdc, "
                      ".npz for nlspn")
  p.add_argument("--segmentation", default="classical",
                 choices=["classical", "erfnet"],
                 help="erfnet = learned labeler (nets/segnet.py; "
                      "reference mseg role)")
  p.add_argument("--segmentation_weights", default="",
                 help=".pth/.npz ERFNet checkpoint for "
                      "--segmentation erfnet")
  p.add_argument("--workers", type=int, default=6)
  args = p.parse_args()

  from snerf_tpu.preprocess.flow import farneback_flow_fn, tpu_flow_fn
  from snerf_tpu.preprocess.pipeline import FrameData, run_scene_pipeline

  camera_frames = {}
  for cam in sorted(os.listdir(args.datadir)):
    npz_path = os.path.join(args.datadir, cam, "frames.npz")
    if not os.path.exists(npz_path):
      continue
    data = np.load(npz_path, allow_pickle=True)
    frames = []
    for i in range(len(data["rgb"])):
      frames.append(FrameData(
          rgb=data["rgb"][i], rgb_adjacent=data["rgb_adjacent"][i],
          lidar_points=data["lidar_points"][i],
          lidar_points_adjacent=data["lidar_points_adjacent"][i]))
    camera_frames[cam] = frames

  if not camera_frames:
    sys.exit(f"no <cam>/frames.npz bundles under {args.datadir}")

  if args.flow == "hybrid":
    from snerf_tpu.preprocess.flow import make_hybrid_flow_fn
    from snerf_tpu.preprocess.nets.raftlite import make_raftlite_flow_fn
    raft_fn = make_raftlite_flow_fn(
        weights_path=args.flow_weights or None, tile=args.flow_tile)
    flow_fn = make_hybrid_flow_fn(raft_fn=raft_fn)
  elif args.flow == "tpu":
    flow_fn = tpu_flow_fn
  elif args.flow == "farneback":
    flow_fn = farneback_flow_fn
  elif args.flow == "raftlite":
    from snerf_tpu.preprocess.nets.raftlite import make_raftlite_flow_fn
    flow_fn = make_raftlite_flow_fn(
        weights_path=args.flow_weights or None, tile=args.flow_tile)
  else:
    flow_fn = lambda a, b: np.zeros(a.shape[:2] + (2,), np.float32)

  completion_fn = None
  if args.completion == "sdc":
    from snerf_tpu.preprocess.nets.sdc import make_sdc_completion_fn
    completion_fn = make_sdc_completion_fn(
        weights_path=args.completion_weights or None)
  elif args.completion == "nlspn":
    from snerf_tpu.preprocess.nets.nlspn import make_nlspn_completion_fn
    completion_fn = make_nlspn_completion_fn(
        weights_path=args.completion_weights or None)

  segmentation_fn = None
  if args.segmentation == "erfnet":
    from snerf_tpu.preprocess.nets.segnet import make_segmentation_fn
    segmentation_fn = make_segmentation_fn(
        weights_path=args.segmentation_weights or None)

  stats = run_scene_pipeline(camera_frames, args.outdir, flow_fn,
                             completion_fn=completion_fn,
                             segmentation_fn=segmentation_fn,
                             max_workers=args.workers)
  for cam, mean_pts in stats.items():
    print(f"{cam}: mean kept lidar points/frame = {mean_pts:.0f}")


if __name__ == "__main__":
  main()
