#!/usr/bin/env python
"""Import a reference checkpoint into a native experiment.

Usage:
  # S-NeRF (mip) .tar (s-nerf/train.py:264-273 format):
  python scripts/import_reference_ckpt.py --tar <ckpt.tar> \
      --config <the experiment's args.txt or config file> \
      [--basedir exp --expname scene_0916 ...]
  # S-NeRF++ zip-nerf checkpoint_<step>.ckpt
  # (zipnerf/internal/checkpoints.py format):
  python scripts/import_reference_ckpt.py --tar checkpoint_50000.ckpt \
      --config <cfg> --model zipnerf ...

Maps the reference weights (MipNerfModel incl. confidence table, or
the zip Model incl. hash-grid tables and GLO embeddings) onto our flax
tree and saves an orbax checkpoint at the reference's step under
<basedir>/<expname>/checkpoints/ — after which eval.py / render.py /
train.py --resume work on it natively. The reference experiment's own
args.txt is a valid --config here (same flag names).
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
      _repo_train_module, import_reference_tar, import_reference_zip_ckpt)

  cfg = load_config_with_snapshot(argv)
  if cfg.model == "zipnerf":
    state, step = import_reference_zip_ckpt(tar_path, cfg)
  else:
    load_scene = _repo_train_module().load_scene
    scene = load_scene(cfg)
    state, step = import_reference_tar(tar_path, cfg, scene.num_images)
  # snapshot the resolved config like train.py does: eval/render rebuild
  # the checkpoint's state STRUCTURE from args.txt, so an imported
  # experiment must be self-describing too
  from snerf_tpu.config import snapshot_config
  snapshot_config(cfg)
  ckpt_dir = os.path.join(cfg.exp_dir(), "checkpoints")
  ckpt_lib.save_checkpoint(ckpt_dir, state, step, wait=True)
  print(f"imported {tar_path} (step {step}) -> {ckpt_dir}")


if __name__ == "__main__":
  main()
