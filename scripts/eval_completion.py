"""Depth-completion quality table: learned SDC uncertainty_net vs the
classical IP-Basic default (VERDICT r2 next #5).

Trains the in-repo SDC net (exact reference architecture,
Models/model.py — checkpoint-import parity tested) on synthetic scenes
with dense ground-truth depth + simulated lidar scanlines, then reports
RMSE / MAE / KITTI iRMSE on held-out frames for both completers.
Table goes to PERF.md.

Usage: python scripts/eval_completion.py [--steps 400]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.preprocess.nets import sdc
from snerf_tpu.preprocess.pipeline import default_completion_fn


def metrics(pred, gt, valid):
  e = (pred - gt)[valid]
  rmse = float(np.sqrt(np.mean(e ** 2)))
  mae = float(np.mean(np.abs(e)))
  ig = 1.0 / np.maximum(gt[valid], 1e-3)
  ip = 1.0 / np.maximum(pred[valid], 1e-3)
  irmse = float(np.sqrt(np.mean((ig - ip) ** 2))) * 1000  # 1/km
  return rmse, mae, irmse


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=400)
  ap.add_argument("--noise_std", type=float, default=0.05,
                  help="lidar range noise (m) for the noisy protocol")
  ap.add_argument("--outlier_frac", type=float, default=0.05,
                  help="fraction of gross-outlier returns (reprojection"
                       " misalignment regime, YORO:540-625)")
  ap.add_argument("--scale_aug", type=float, default=0.5,
                  help="log-range of global depth-scale jitter (train"
                       " AND eval): RGB alone is scale-ambiguous, so"
                       " the completer must anchor scale on the lidar")
  args = ap.parse_args()

  scene = make_synthetic_scene(num_images=10, H=96, W=128, radius=3.0,
                               near=1.0, far=6.0, detail_blobs=20)
  images, depths = scene.images, scene.depths
  train_im, train_d = images[:8], depths[:8]
  test_im, test_d = images[8:], depths[8:]

  t0 = time.perf_counter()
  print(f"training sdc {args.steps} steps (scale-aug) ...", flush=True)
  params, losses = sdc.train_completion(train_im, train_d,
                                        steps=args.steps, lr=1e-3,
                                        crop=64, batch=2, log_every=100,
                                        scale_aug=args.scale_aug)
  print(f"trained in {time.perf_counter()-t0:.0f}s "
        f"(loss {np.mean(losses[:20]):.3f} -> "
        f"{np.mean(losses[-20:]):.3f})", flush=True)
  t0 = time.perf_counter()
  print(f"training sdc {args.steps} steps (scale+noise-aug) ...",
        flush=True)
  params_n, losses_n = sdc.train_completion(
      train_im, train_d, steps=args.steps, lr=1e-3, crop=64, batch=2,
      log_every=100, noise_std=args.noise_std,
      outlier_frac=args.outlier_frac, scale_aug=args.scale_aug)
  print(f"trained in {time.perf_counter()-t0:.0f}s "
        f"(loss {np.mean(losses_n[:20]):.3f} -> "
        f"{np.mean(losses_n[-20:]):.3f})", flush=True)

  learned_fn = sdc.make_sdc_completion_fn(params=params)
  learned_fn_n = sdc.make_sdc_completion_fn(params=params_n)

  from snerf_tpu.preprocess.nets import nlspn
  t0 = time.perf_counter()
  print(f"training nlspn {args.steps} steps (scale+noise-aug) ...",
        flush=True)
  params_nl, losses_nl = nlspn.train_completion(
      train_im, train_d, steps=args.steps, lr=1e-3, crop=64, batch=2,
      log_every=100, noise_std=args.noise_std,
      outlier_frac=args.outlier_frac, scale_aug=args.scale_aug)
  print(f"trained in {time.perf_counter()-t0:.0f}s "
        f"(loss {np.mean(losses_nl[:20]):.3f} -> "
        f"{np.mean(losses_nl[-20:]):.3f})", flush=True)
  nlspn_fn = nlspn.make_nlspn_completion_fn(params=params_nl)

  # Two protocols over the SAME held-out frames: clean scanlines
  # (classical interpolation's best case) and noisy scanlines with
  # gross outliers (the regime the reference's learned completer
  # exists for, Sparse-Depth-Completion/Models/model.py). Both apply
  # a per-frame global depth scale so RGB alone cannot resolve the
  # answer — the lidar channel is the only source of metric scale
  # (same ambiguity real street scenes have).
  for proto, kw in (("clean", {}),
                    ("noisy", dict(noise_std=args.noise_std,
                                   outlier_frac=args.outlier_frac))):
    rng = np.random.RandomState(42)
    rows = {"ip-basic": [], "sdc-learned": [], "sdc-noise-aug": [],
            "nlspn-noise-aug": []}
    for im, d in zip(test_im, test_d):
      d = d * np.exp(rng.uniform(-args.scale_aug, args.scale_aug))
      sparse = sdc.simulate_lidar_scanlines(d, rng, **kw)
      valid = d > 0.01
      eval_mask = valid & (sparse == 0)   # completed pixels only
      rows["ip-basic"].append(
          metrics(default_completion_fn(im, sparse), d, eval_mask))
      rows["sdc-learned"].append(
          metrics(learned_fn(im, sparse), d, eval_mask))
      rows["sdc-noise-aug"].append(
          metrics(learned_fn_n(im, sparse), d, eval_mask))
      rows["nlspn-noise-aug"].append(
          metrics(nlspn_fn(im, sparse), d, eval_mask))

    print(f"\n[{proto} lidar] "
          f"| completer | RMSE (m) | MAE (m) | iRMSE (1/km) |")
    print("|---|---|---|---|")
    for name, vals in rows.items():
      v = np.mean(vals, axis=0)
      print(f"| {name} | {v[0]:.3f} | {v[1]:.3f} | {v[2]:.1f} |")


if __name__ == "__main__":
  main()
