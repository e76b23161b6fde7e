"""Tiny synthetic multi-view scene for tests and benchmarks.

An analytic emission/density field (colored Gaussian blobs) rendered with
the framework's own compositing ops gives geometrically-consistent
multi-view images that a NeRF can fit — the "one tiny scene, CPU-runnable"
fixture SURVEY.md §4 calls for (the reference ships no such fixture).
"""

from __future__ import annotations

import numpy as np

from snerf_tpu.data.scene import Scene

# Fixed blob layout: (center xyz, sigma, density_peak, rgb)
_BLOBS = [
    ((0.0, 0.0, 0.0), 0.35, 40.0, (0.9, 0.2, 0.2)),
    ((0.6, 0.3, -0.2), 0.25, 30.0, (0.2, 0.8, 0.3)),
    ((-0.5, -0.3, 0.3), 0.3, 35.0, (0.25, 0.35, 0.95)),
]


def field(points, blobs=None):
  """Analytic (density [..., ], rgb [..., 3]) at world points [..., 3].

  Vectorized over blobs, chunked over points (detail-blob layouts have
  ~60 blobs; the per-blob python loop was minutes/image)."""
  blobs = blobs if blobs is not None else _BLOBS
  centers = np.array([b[0] for b in blobs], np.float32)      # [B, 3]
  inv2sig2 = np.array([0.5 / b[1] ** 2 for b in blobs], np.float32)
  peaks = np.array([b[2] for b in blobs], np.float32)
  cols = np.array([b[3] for b in blobs], np.float32)         # [B, 3]

  flat = np.ascontiguousarray(points.reshape(-1, 3), np.float32)
  density = np.empty(flat.shape[0], np.float32)
  rgb = np.empty((flat.shape[0], 3), np.float32)
  c2 = np.sum(centers ** 2, -1)                              # [B]
  chunk = max(1, 4_000_000 // max(len(blobs), 1))
  for s in range(0, flat.shape[0], chunk):
    p = flat[s:s + chunk]                                    # [P, 3]
    # ||p - c||^2 via the matmul expansion: no [P, B, 3] temporary
    d2 = (np.sum(p ** 2, -1)[:, None] + c2
          - 2.0 * (p @ centers.T))                           # [P, B]
    w = peaks * np.exp(-d2 * inv2sig2)
    den = w.sum(-1)
    density[s:s + chunk] = den
    rgb[s:s + chunk] = (w @ cols) / np.maximum(den[:, None], 1e-8)
  return (density.reshape(points.shape[:-1]),
          rgb.reshape(points.shape[:-1] + (3,)))


def detail_blob_layout(num: int, seed: int = 0, extent: float = 0.8,
                       sig_range=(0.015, 0.06),
                       include_base: bool = True):
  """`num` small high-frequency blobs around the origin — texture that
  discriminates encoders (the base 3-blob field is smooth enough that
  any backbone saturates PSNR on it).

  include_base=False omits the 3 large base blobs: small blobs INSIDE
  an optically-thick base blob are never seen (rays terminate at its
  front surface). Peaks scale ~1/sigma so each blob's optical depth is
  size-independent (visibly opaque, not fog)."""
  rng = np.random.RandomState(seed)
  blobs = list(_BLOBS) if include_base else []
  for _ in range(num):
    c = rng.uniform(-extent, extent, 3)
    sig = float(rng.uniform(*sig_range))
    peak = float(rng.uniform(1.5, 4.0) / sig)
    col = rng.uniform(0.05, 0.95, 3)
    blobs.append((tuple(c), sig, peak, tuple(col)))
  return blobs


def _look_at(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
  """c2w with columns [right, up, back] (the loader's output convention)."""
  back = eye - target
  back = back / np.linalg.norm(back)
  right = np.cross(up, back)
  right = right / np.linalg.norm(right)
  true_up = np.cross(back, right)
  return np.stack([right, true_up, back, eye], 1).astype(np.float32)


def _render_image(c2w, K, H, W, near, far, n_samples=96, white_bkgd=True,
                  blobs=None):
  """Numpy volume render of the analytic field (no jax; runs anywhere)."""
  ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
  f = (K[0, 0] + K[1, 1]) / 2
  dirs_cam = np.stack([(xs - K[0, 2] + 0.5) / f,
                       -(ys - K[1, 2] + 0.5) / f,
                       -np.ones_like(xs)], -1)
  dirs = dirs_cam @ c2w[:3, :3].T
  origins = np.broadcast_to(c2w[:3, 3], dirs.shape)

  t = np.linspace(near, far, n_samples + 1, dtype=np.float32)
  t_mid = 0.5 * (t[:-1] + t[1:])
  delta = (t[1:] - t[:-1])[None, None, :] * np.linalg.norm(
      dirs, axis=-1, keepdims=True)
  pts = origins[..., None, :] + dirs[..., None, :] * t_mid[:, None]
  density, rgb = field(pts, blobs=blobs)
  dd = density * delta
  alpha = 1 - np.exp(-dd)
  trans = np.exp(-np.concatenate(
      [np.zeros_like(dd[..., :1]), np.cumsum(dd[..., :-1], -1)], -1))
  w = alpha * trans
  img = (w[..., None] * rgb).sum(-2)
  if white_bkgd:
    img = img + (1 - w.sum(-1))[..., None]
  depth = (w * t_mid).sum(-1) / np.maximum(w.sum(-1), 1e-8)
  return np.clip(img, 0, 1), depth.astype(np.float32)


def make_synthetic_scene(num_images: int = 6, H: int = 32, W: int = 40,
                         radius: float = 3.0, near: float = 1.0,
                         far: float = 6.0, with_depth: bool = True,
                         datahold: int = 5, seed: int = 0,
                         focal: float = None,
                         detail_blobs: int = 0,
                         detail_extent: float = 0.8,
                         detail_sig_range=(0.015, 0.06),
                         detail_only: bool = False,
                         n_render_samples: int = 96,
                         arc: float = None) -> Scene:
  """Cameras on a circle looking at the origin; images rendered analytically.

  `focal` (px) overrides the default 0.8*W toy focal — passing a
  real-camera value (e.g. nuScenes ~1266 px) with small H/W produces a
  CROP with real-scale cone radii (radii ~ 1/focal), the geometry the
  zip-nerf IPE/CP encoders see in production (VERDICT r2 weak #3).
  `detail_blobs` adds that many small high-frequency blobs.
  `arc` (radians) limits the total azimuth span: a narrow-FoV camera
  (real focal on a small crop sees only ~2*atan(W/2/focal) ~ 6 deg)
  needs view spacing well inside its FoV or neighboring views share no
  scene content and held-out eval is unpredictable by construction.
  Default None keeps the full-circle layout.
  """
  del seed  # layout is deterministic
  focal = 0.8 * W if focal is None else float(focal)
  blobs = (detail_blob_layout(detail_blobs, extent=detail_extent,
                              sig_range=detail_sig_range,
                              include_base=not detail_only)
           if detail_blobs else None)
  K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
  poses, images, depths = [], [], []
  for i in range(num_images):
    if arc is None:
      theta = 2 * np.pi * i / num_images
    else:
      theta = arc * (i / max(1, num_images - 1) - 0.5)
    eye = np.array([radius * np.cos(theta), radius * np.sin(theta), 1.2],
                   np.float32)
    c2w = _look_at(eye)
    img, dep = _render_image(c2w, K, H, W, near, far,
                             n_samples=n_render_samples, blobs=blobs)
    poses.append(c2w)
    images.append((img * 255).astype(np.uint8))
    depths.append(dep)
  i_test = np.arange(num_images)[::datahold]
  i_train = np.array(
      [i for i in range(num_images) if i not in set(i_test.tolist())])
  return Scene(
      images=np.stack(images), poses=np.stack(poses),
      intrinsics=np.tile(K[None], (num_images, 1, 1)),
      near=near, far=far,
      depths=np.stack(depths) if with_depth else None,
      cam_index=np.zeros(num_images, np.int32),
      i_train=i_train, i_test=i_test)
