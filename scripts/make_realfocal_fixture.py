"""Generate the realistic-focal nuScenes-layout fixture
(tests/fixtures/nuscenes_realfocal) — VERDICT r2 next #2.

The committed nuscenes_tiny fixture's toy focal (0.8*W at 64x80) gives
cone radii large enough that integrated encodings correctly suppress
all high frequencies (PERF.md: plateaus at ~14 dB, "a diagnosis, not a
defect"); no committed fixture exercised the zip family at realistic
cone geometry. This one uses the real nuScenes focal (~1266 px,
CAM_FRONT intrinsics at 1600x900) on a 96x128 CROP: radii scale as
1/focal, so samples see production-scale cones while files stay tiny.
High-frequency content comes from 60 small blobs concentrated inside
the narrow frustum (detail_extent 0.12).

Run once; output is committed so CI + bench_quality.py exercise the
real on-disk contract at real cone geometry.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "nuscenes_realfocal")

NUSCENES_FOCAL = 1266.4


def main():
  import imageio.v2 as imageio
  from PIL import Image
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.preprocess.nuscenes import build_poses_bounds

  # detail sigma 0.005-0.015 world units projects to ~2-6 px at this
  # focal/distance — genuine high-frequency texture; march densely
  # enough (384 samples over [2, 4.5] -> dt ~ 0.0065) to integrate it.
  # detail_only: small blobs inside an opaque base blob are invisible
  # (rays stop at its surface) — the texture IS the scene here.
  # arc: the 5.8 deg FoV (2*atan(64/1266)) demands view spacing well
  # inside the FoV — 60 deg total over 48 views (1.25 deg steps). A full
  # circle left neighbors DISJOINT (11.5 dB), an 8 deg arc starved depth
  # constraints (loss plateau), and 16 views (4 deg steps) let the
  # optimizer paint per-view detail in each camera's private frustum
  # wedge (train 26 dB / held-out 12 dB); at 1.25 deg spacing every
  # point near the blob shell is seen by ~4+ cameras and held-out PSNR
  # tracks train PSNR (measured: test 23-28 dB vs train 25-28 dB after
  # 2k steps of zip_cp).
  scene = make_synthetic_scene(
      num_images=48, H=96, W=128, radius=3.0, near=2.0, far=4.5,
      focal=NUSCENES_FOCAL, detail_blobs=140, detail_extent=0.12,
      detail_sig_range=(0.005, 0.015), detail_only=True,
      n_render_samples=384, datahold=8, arc=np.deg2rad(60.0))
  os.makedirs(os.path.join(OUT, "images"), exist_ok=True)
  os.makedirs(os.path.join(OUT, "depths"), exist_ok=True)
  n = scene.num_images
  c2ws = np.tile(np.eye(4)[None], (n, 1, 1))
  for i in range(n):
    c2ws[i, :3, :4] = scene.poses[i]
  # build_poses_bounds expects OpenCV-convention c2ws ([right, down,
  # front] columns — what the real nuScenes extractor supplies); the
  # synthetic scene's poses are in the LOADER'S OUTPUT convention
  # [right, up, back]. Writing them unconverted flips each camera's
  # y/z on the way back through load_nuscenes_scene, so rays no longer
  # match the images and training collapses (~10 dB held-out across
  # every encoder — PERF.md round-3 bench_quality debugging).
  c2ws[:, :3, 1] *= -1.0   # up -> down
  c2ws[:, :3, 2] *= -1.0   # back -> front
  for i in range(n):
    imageio.imwrite(os.path.join(OUT, "images", f"{i:04d}.png"),
                    scene.images[i])
    d16 = np.clip(scene.depths[i] * 256, 0, 65535).astype(np.uint16)
    Image.fromarray(d16).save(os.path.join(OUT, "depths", f"{i:04d}.png"))
  arr = build_poses_bounds(c2ws, scene.intrinsics, scene.hw)
  np.save(os.path.join(OUT, "poses_bounds.npy"), arr)
  print("fixture written to", OUT)


if __name__ == "__main__":
  main()
