#!/usr/bin/env python
"""Waymo (KITTI-format) conversion CLI (reference scripts/waymo_preprocess.py).

Usage parity: python scripts/waymo_preprocess.py --datadir <kitti_dir>
  --scene_name <out_dir> [--depthdir <dir> --img_num 50]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--datadir", required=True)
  p.add_argument("--scene_name", required=True)
  p.add_argument("--depthdir", default=None)
  p.add_argument("--img_num", type=int, default=50)
  p.add_argument("--height", type=int, default=1280)
  p.add_argument("--width", type=int, default=1920)
  p.add_argument("--near", type=float, default=1.0)
  p.add_argument("--far", type=float, default=100.0)
  args = p.parse_args()

  from snerf_tpu.preprocess.waymo import preprocess_waymo_scene
  preprocess_waymo_scene(
      args.datadir, args.scene_name, img_num=args.img_num,
      hw=(args.height, args.width), near=args.near, far=args.far,
      depthdir=args.depthdir)
  print(f"wrote {args.scene_name}")


if __name__ == "__main__":
  main()
