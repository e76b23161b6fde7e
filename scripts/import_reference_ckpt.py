#!/usr/bin/env python
"""Import a reference S-NeRF `.tar` checkpoint into a native experiment.

Usage:
  python scripts/import_reference_ckpt.py --tar <ckpt.tar> \
      --config <the experiment's args.txt or config file> \
      [--basedir exp --expname scene_0916 ...]

Reads the reference checkpoint (s-nerf/train.py:264-273 format), maps
the MipNerfModel weights (and the confidence table, when shapes match)
onto our flax tree, and saves an orbax checkpoint at the reference's
global_step under <basedir>/<expname>/checkpoints/ — after which
eval.py / render.py / train.py --resume work on it natively. The
reference's own args.txt is a valid --config here (same flag names).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
  argv = list(argv if argv is not None else sys.argv[1:])
  if "--tar" not in argv:
    sys.exit("--tar <reference checkpoint .tar> is required")
  i = argv.index("--tar")
  tar_path = argv[i + 1]
  del argv[i:i + 2]

  from snerf_tpu.config import load_config_with_snapshot
  from snerf_tpu.train import checkpoints as ckpt_lib
  from snerf_tpu.utils.ref_import import (
      _repo_train_module, import_reference_tar)

  load_scene = _repo_train_module().load_scene
  cfg = load_config_with_snapshot(argv)
  if cfg.model != "mipnerf":
    sys.exit("only the reference S-NeRF (mipnerf) .tar format is "
             "supported; zip-nerf checkpoints use gin configs + .ckpt "
             "(open an issue with a sample)")
  scene = load_scene(cfg)
  state, step = import_reference_tar(tar_path, cfg, scene.num_images)
  ckpt_dir = os.path.join(cfg.exp_dir(), "checkpoints")
  ckpt_lib.save_checkpoint(ckpt_dir, state, step, wait=True)
  print(f"imported {tar_path} (step {step}) -> {ckpt_dir}")


if __name__ == "__main__":
  main()
