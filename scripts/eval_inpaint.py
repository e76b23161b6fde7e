"""Train + evaluate the in-repo AOT-GAN inpainter against the Telea
default on held-out fixture views (VERDICT r3 next #6).

Protocol: train the compact generator on the committed street fixtures'
TRAIN views (nuscenes_realfocal + nuscenes_tiny frames), then measure
hole PSNR on HELD-OUT views under the masks the simulation pipeline
actually produces (paste-boundary bands + relight rectangles,
sim/compose.py:155 + pipeline.apply_relight_pass). The learned arm
becomes the pipeline default only if it beats Telea here — the gate the
reference implicitly passes by downloading a pretrained LaMa/AOT
(stage2_code/inpainting_fig.py:14-96).

Usage:
  python scripts/eval_inpaint.py --steps 3000 --save \
      snerf_tpu/preprocess/nets/weights/aotgan.npz
  python scripts/eval_inpaint.py --steps 0     # packaged weights
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def load_images():
  """All fixture frames, (train_imgs, heldout_imgs) u8 [N, H, W, 3]."""
  import imageio.v2 as iio
  frames = []
  for fix in ("nuscenes_realfocal", "nuscenes_tiny"):
    imdir = os.path.join(FIXDIR, fix, "images")
    if not os.path.isdir(imdir):
      continue
    for f in sorted(os.listdir(imdir)):
      if f.endswith((".png", ".jpg")):
        im = iio.imread(os.path.join(imdir, f))
        frames.append((fix, np.asarray(im)[..., :3]))
  # held out: every 8th frame of each fixture (same stride as the
  # scene datahold)
  train, held = [], []
  counters = {}
  for fix, im in frames:
    i = counters.get(fix, 0)
    counters[fix] = i + 1
    (held if i % 8 == 0 else train).append(im)
  return train, held


MASK_KINDS = ("band", "rect", "stroke")


def eval_arm(inpaint_fn, held, seed=123):
  """Hole PSNR over held-out views x pipeline-shaped masks, split by
  mask family (band = compose paste boundaries, rect = relight-style
  rectangles, stroke = thin artifacts). Returns (overall, per_kind).

  Images are fed in the sim pipeline's native [0, 1] convention
  (sim/compose.py works in unit floats; default_inpaint_fn clips to
  [0, 1] before the Telea call)."""
  from snerf_tpu.preprocess.nets.aotgan import _random_band_mask
  rng = np.random.RandomState(seed)
  errs = {k: [] for k in MASK_KINDS}
  for im in held:
    H, W = im.shape[:2]
    gt = im.astype(np.float32) / 255.0
    for _ in range(4):
      # peek the kind the mask generator is about to draw (same rng
      # stream: save/restore state around the kind draw)
      state = rng.get_state()
      kind = rng.randint(3)
      rng.set_state(state)
      mask = _random_band_mask(rng, H, W) > 0
      if not mask.any():
        continue
      out = np.asarray(inpaint_fn(gt, mask), np.float32)
      mse = np.mean((out[mask] - gt[mask]) ** 2)
      errs[MASK_KINDS[kind]].append(-10 * np.log10(mse + 1e-12))
  per_kind = {k: float(np.mean(v)) if v else float("nan")
              for k, v in errs.items()}
  allv = [e for v in errs.values() for e in v]
  return float(np.mean(allv)), per_kind


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=3000)
  ap.add_argument("--dim", type=int, default=64)
  ap.add_argument("--blocks", type=int, default=4)
  ap.add_argument("--crop", type=int, default=64)
  ap.add_argument("--batch", type=int, default=8)
  ap.add_argument("--lr", type=float, default=1e-3)
  ap.add_argument("--save", type=str, default="")
  args = ap.parse_args()

  from snerf_tpu.preprocess.nets import aotgan
  from snerf_tpu.sim.pipeline import default_inpaint_fn

  train, held = load_images()
  print(f"{len(train)} train frames, {len(held)} held-out", flush=True)

  if args.steps == 0:
    params = aotgan.load_params(aotgan.PACKAGED_WEIGHTS)
    print("using packaged weights", flush=True)
  else:
    t0 = time.perf_counter()
    # train_inpainter crops to a fixed size; keep the dominant shape
    shapes = {}
    for f in train:
      shapes.setdefault(f.shape, []).append(f)
    stack = np.stack(max(shapes.values(), key=len))
    params, losses = aotgan.train_inpainter(
        stack, steps=args.steps, crop=args.crop, batch=args.batch,
        dim=args.dim, blocks=args.blocks, lr=args.lr, log_every=200)
    print(f"trained {args.steps} steps in "
          f"{time.perf_counter() - t0:.0f}s, "
          f"final loss {np.mean(losses[-50:]):.4f}", flush=True)
    if args.save:
      aotgan.save_params(args.save, params)
      print(f"saved {args.save}")

  learned_fn = aotgan.make_inpaint_fn(params=params)
  p_learned, k_learned = eval_arm(learned_fn, held)
  p_telea, k_telea = eval_arm(default_inpaint_fn, held)
  print(f"\n| arm | overall | " + " | ".join(MASK_KINDS) + " |")
  print("|---|---|" + "---|" * len(MASK_KINDS))
  print(f"| Telea (classical default) | {p_telea:.2f} | "
        + " | ".join(f"{k_telea[k]:.2f}" for k in MASK_KINDS) + " |")
  print(f"| AOT-GAN (in-repo trained) | {p_learned:.2f} | "
        + " | ".join(f"{k_learned[k]:.2f}" for k in MASK_KINDS) + " |")
  print("\nPipeline default: sim/pipeline.py inpaint_arm='auto' routes "
        "the compose BAND call site to the learned arm (the relight "
        "pass never reaches a plain inpaint_fn).")


if __name__ == "__main__":
  main()
