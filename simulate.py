#!/usr/bin/env python
"""Simulation CLI: compose foreground assets into rendered backgrounds
and emit an annotated dataset.

Behavioral parity target: reference s-nerfpp/config_run.py
(`python config_run.py --config configs/car.yaml --n_image 10`): the
7-stage pipeline — here in-process (snerf_tpu/sim/pipeline.py) over the
batch-render outputs of `render.py --render_mode random`.

Usage:
  python simulate.py --background <render_out_dir> --assets <bank_dir> \
      [--config sim.yaml] [--out annotation] [--scene scene_0]
      [--n_image 10] [--n_instances 2] [--seed 0]

Background dir contract (produced by render.py): rgb/%05d.png,
depth/%05d.png (uint16 m*256), semantic/%05d.npy,
render_poses.npy or raw_target_poses.npy, intrinsic.npy.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def load_background_views(bg_dir: str, n_image: int, scale: float = 1.0):
  import imageio.v2 as imageio
  rgb_dir = os.path.join(bg_dir, "rgb")
  names = sorted(os.listdir(rgb_dir))[:n_image]
  pose_file = os.path.join(bg_dir, "raw_target_poses.npy")
  if not os.path.exists(pose_file):
    pose_file = os.path.join(bg_dir, "render_poses.npy")
  poses = np.load(pose_file)
  Ks = np.load(os.path.join(bg_dir, "intrinsic.npy"))
  views = []
  for i, name in enumerate(names):
    stem = os.path.splitext(name)[0]
    rgb = np.asarray(imageio.imread(os.path.join(rgb_dir, name)),
                     np.float32) / 255.0
    depth = np.asarray(imageio.imread(
        os.path.join(bg_dir, "depth", stem + ".png")),
        np.float32) / 256.0 * scale
    sem_path = os.path.join(bg_dir, "semantic", stem + ".npy")
    sem = (np.load(sem_path).astype(np.int32) if os.path.exists(sem_path)
           else np.zeros(depth.shape, np.int32))
    c2w = poses[i]
    if c2w.shape == (3, 4):
      c2w = np.concatenate([c2w, [[0, 0, 0, 1.0]]], 0)
    views.append(dict(rgb=rgb[..., :3], depth=depth, semantic=sem,
                      c2w=c2w, K=Ks[i] if Ks.ndim == 3 else Ks))
  return views


def main(argv=None):
  from snerf_tpu.sim.mesh import AssetBank
  from snerf_tpu.sim.pipeline import SimConfig, run_simulation
  from snerf_tpu.sim.annotate import check_annotation

  p = argparse.ArgumentParser()
  p.add_argument("--background", required=True)
  p.add_argument("--assets", required=True)
  p.add_argument("--config", default=None, help="YAML SimConfig overrides")
  p.add_argument("--out", default="./annotation")
  p.add_argument("--scene", default="scene_0")
  p.add_argument("--n_image", type=int, default=10)
  p.add_argument("--n_instances", type=int, default=2)
  p.add_argument("--depth_scale", type=float, default=1.0,
                 help="multiply png depths by this (1/sf for normalized)")
  p.add_argument("--seed", type=int, default=0)
  args = p.parse_args(argv)

  overrides = {}
  if args.config:
    import yaml
    with open(args.config) as f:
      overrides = yaml.safe_load(f) or {}
  cfg = SimConfig(n_images=args.n_image,
                  n_instances_per_image=args.n_instances,
                  seed=args.seed, **overrides)

  views = load_background_views(args.background, args.n_image,
                                scale=args.depth_scale)
  print(f"loaded {len(views)} background views from {args.background}")
  run_dir = run_simulation(views, AssetBank(args.assets), cfg, args.out,
                           scene_name=args.scene)
  chk = check_annotation(run_dir)
  print(f"annotation run: {run_dir} complete={chk['complete']} "
        f"frames={chk['n_frames']}")
  return run_dir


if __name__ == "__main__":
  main(sys.argv[1:])
