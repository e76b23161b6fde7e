"""Flow accuracy table: learned RAFT-lite vs classical pyramidal LK.

VERDICT r2 #4: evaluate the learned flow against the LK default on
fixtures with rotation and occlusion, not just translation. Trains
RAFT-lite on synthetic warps (no external data; zero-egress), then
reports median endpoint error (EPE) per fixture. Table goes to PERF.md.

Usage: python scripts/eval_flow.py [--steps 1500] [--save exp/raft.npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
from scipy.ndimage import gaussian_filter, map_coordinates
from scipy.ndimage import shift as ndshift

from snerf_tpu.preprocess.flow import tpu_flow_fn
from snerf_tpu.preprocess.nets import raftlite


def fixtures(H=96, W=128):
  rng = np.random.RandomState(0)
  base = gaussian_filter(rng.rand(H, W).astype(np.float32), 2.0)
  yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
  cy, cx = (H - 1) / 2, (W - 1) / 2
  out = {}

  # 1. subpixel translation
  dx, dy = 4.5, -2.25
  img1 = ndshift(base, (dy, dx), order=1, mode="nearest")
  gt = np.stack([np.full((H, W), dx), np.full((H, W), dy)], -1)
  out["translation"] = (base, img1, gt, np.ones((H, W), bool))

  # 2. rotation + scale (3 deg, 5%)
  ang, sc = np.deg2rad(3.0), 1.05
  ca, sa = np.cos(ang) / sc, np.sin(ang) / sc
  sx = ca * (xx - cx) + sa * (yy - cy) + cx
  sy = -sa * (xx - cx) + ca * (yy - cy) + cy
  img1 = map_coordinates(base, [sy, sx], order=1, mode="nearest")
  fca, fsa = sc * np.cos(ang), sc * np.sin(ang)
  gt = np.stack([(fca * (xx - cx) - fsa * (yy - cy) + cx) - xx,
                 (fsa * (xx - cx) + fca * (yy - cy) + cy) - yy], -1)
  out["rotation+scale"] = (base, img1, gt, np.ones((H, W), bool))

  # 3. occlusion: translating background + static occluder in frame 1;
  # evaluate on the occlusion-affected band around the occluder (where
  # LK is known to break) EXCLUDING the occluder interior itself
  # (ground truth is undefined there).
  s = 3.0
  img1 = ndshift(base, (0, s), order=1, mode="nearest")
  img1[36:60, 48:80] = 0.5
  gt = np.stack([np.full((H, W), s), np.zeros((H, W))], -1)
  band = np.zeros((H, W), bool)
  band[28:68, 40:88] = True
  band[36:60, 48:80] = False
  out["occlusion-band"] = (base, img1, gt, band)

  # 4. large shift (24 px)
  img1 = np.roll(base, 24, axis=1)
  gt = np.stack([np.full((H, W), 24.0), np.zeros((H, W))], -1)
  m = np.zeros((H, W), bool)
  m[24:-24, 32:-32] = True
  out["large-shift"] = (base, img1, gt, m)

  # 5. street pair with geometry ground truth (VERDICT r3 #5): two
  # consecutive frames of the committed street-focal fixture, GT flow
  # from depth+pose reprojection (the same projection the multiview
  # photo-consistency regression test validates to 0.005 photo err).
  import jax.numpy as jnp
  from snerf_tpu.data.scene import load_nuscenes_scene
  from snerf_tpu.models.confidence import project_to_view
  fx = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "tests", "fixtures",
      "nuscenes_realfocal")
  sc = load_nuscenes_scene(fx, bd_factor=0.0, cam_num=0, datahold=8,
                           no_align=True)
  def _geo_pair(sc, i, j, name):
    """GT flow frame i -> j from depth+pose reprojection."""
    tx, ty, _, in_front = project_to_view(
        jnp.asarray(sc.depths[i]), jnp.asarray(sc.poses[i]),
        jnp.asarray(sc.intrinsics[i]), jnp.asarray(sc.poses[j]),
        jnp.asarray(sc.intrinsics[j]))
    hh, ww = sc.depths[i].shape
    yy2, xx2 = np.mgrid[0:hh, 0:ww].astype(np.float32)
    gt = np.stack([np.asarray(tx) - xx2, np.asarray(ty) - yy2], -1)
    valid = (np.asarray(in_front) & (sc.depths[i] > 0) &
             (np.asarray(tx) >= 0) & (np.asarray(tx) <= ww - 1) &
             (np.asarray(ty) >= 0) & (np.asarray(ty) <= hh - 1))
    g0 = sc.images[i].astype(np.float32).mean(-1) / 255.0
    g1 = sc.images[j].astype(np.float32).mean(-1) / 255.0
    out[name] = (g0, g1, gt, valid)

  _geo_pair(sc, 20, 21, "street-pair")
  # VERDICT r4 #6: more REAL pairs. (a) a larger-baseline realfocal
  # pair (3 frame steps = 3x the camera translation / flow magnitude);
  # (b) a pair at the far end of the arc (different scene content).
  # nuscenes_tiny was tried as the second capture and REJECTED: its
  # poses predate the realfocal generator's pose-convention fix
  # (test_realfocal_fixture.py docstring) and reproject with 0% valid
  # overlap, so no geometric GT is derivable from it.
  _geo_pair(sc, 20, 23, "street-pair-wide")
  _geo_pair(sc, 40, 41, "street-pair-far")
  return out


def epe(flow, gt, mask):
  e = np.hypot(flow[..., 0] - gt[..., 0], flow[..., 1] - gt[..., 1])
  inner = np.zeros_like(mask)
  inner[16:-16, 16:-16] = True
  m = mask & inner
  return float(np.median(e[m]))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=1500)
  ap.add_argument("--iters", type=int, default=6)
  ap.add_argument("--batch", type=int, default=4)
  ap.add_argument("--lr", type=float, default=3e-4)
  ap.add_argument("--save", type=str, default="")
  args = ap.parse_args()

  t0 = time.perf_counter()
  if args.steps == 0:
    params = None   # make_raftlite_flow_fn loads the packaged weights
    print("using packaged raftlite weights", flush=True)
  else:
    print(f"training raftlite {args.steps} steps ...", flush=True)
    _, params, losses = raftlite.train_raftlite(
        steps=args.steps, size=(64, 64), iters=args.iters, lr=args.lr,
        batch=args.batch, log_every=100)
    print(f"trained in {time.perf_counter()-t0:.0f}s, "
          f"final loss {np.mean(losses[-50:]):.4f}", flush=True)
    if args.save:
      raftlite.save_params(args.save, params)
      print(f"saved {args.save}")

  raft_fn = raftlite.make_raftlite_flow_fn(params=params,
                                           iters=args.iters)
  lk_fn = lambda a, b: tpu_flow_fn(a, b, levels=4)
  from snerf_tpu.preprocess.flow import make_hybrid_flow_fn
  hybrid_fn = make_hybrid_flow_fn(raft_fn=raft_fn)

  rows = []
  for name, (i0, i1, gt, mask) in fixtures().items():
    f_lk = lk_fn(i0, i1)
    f_raft = raft_fn(i0, i1)
    f_hyb = hybrid_fn(i0, i1)
    rows.append((name, epe(f_lk, gt, mask), epe(f_raft, gt, mask),
                 epe(f_hyb, gt, mask)))

  print("\n| fixture | LK | RAFT-lite | hybrid (median EPE px) |")
  print("|---|---|---|---|")
  for name, a, b, c in rows:
    print(f"| {name} | {a:.3f} | {b:.3f} | {c:.3f} |")


if __name__ == "__main__":
  main()
