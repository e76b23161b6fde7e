#!/usr/bin/env python
"""nuScenes extraction CLI (reference scripts/nuscenes_preprocess.py).

Usage parity: python scripts/nuscenes_preprocess.py --version v1.0-mini
  --datadir ./data --savedir ./data/scenes [--skip 20 --total_num 40]
Requires the nuscenes-devkit and raw nuScenes data; the pose math is in
snerf_tpu.preprocess.nuscenes (unit-tested devkit-free).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--version", default="v1.0-trainval")
  p.add_argument("--datadir", default="./data")
  p.add_argument("--savedir", default="./data/scenes")
  p.add_argument("--skip", type=int, default=20)
  p.add_argument("--total_num", type=int, default=40)
  p.add_argument("--camera_index", type=int, nargs="*",
                 default=[0, 1, 2, 3, 4, 5])
  p.add_argument("--height", type=int, default=900)
  p.add_argument("--width", type=int, default=1600)
  args = p.parse_args()

  try:
    from nuscenes import NuScenes
  except ImportError:
    sys.exit("nuscenes-devkit is required for extraction "
             "(pose math alone: snerf_tpu.preprocess.nuscenes)")

  from snerf_tpu.preprocess.nuscenes import extract_scene
  dataroot = os.path.join(args.datadir, "nuScenes",
                          args.version.split("-")[-1])
  nusc = NuScenes(version=args.version, dataroot=dataroot, verbose=True)
  with open(os.path.join(args.datadir, "scene_dict.json")) as f:
    scene_dict = json.load(f)
  for name, token in scene_dict.items():
    print(f"processing {name} ({token})")
    extract_scene(nusc, token, os.path.join(args.savedir, name),
                  skip=args.skip, total_num=args.total_num,
                  camera_index=args.camera_index,
                  hw=(args.height, args.width))


if __name__ == "__main__":
  main()
