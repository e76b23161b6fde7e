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


def field(points):
  """Analytic (density [..., ], rgb [..., 3]) at world points [..., 3]."""
  density = np.zeros(points.shape[:-1], np.float32)
  rgb_acc = np.zeros(points.shape[:-1] + (3,), np.float32)
  for (c, sig, peak, col) in _BLOBS:
    d2 = np.sum((points - np.array(c, np.float32)) ** 2, -1)
    w = peak * np.exp(-0.5 * d2 / sig ** 2)
    density += w
    rgb_acc += w[..., None] * np.array(col, np.float32)
  rgb = rgb_acc / np.maximum(density[..., None], 1e-8)
  return density, rgb


def _look_at(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
  """c2w with columns [right, up, back] (the loader's output convention)."""
  back = eye - target
  back = back / np.linalg.norm(back)
  right = np.cross(up, back)
  right = right / np.linalg.norm(right)
  true_up = np.cross(back, right)
  return np.stack([right, true_up, back, eye], 1).astype(np.float32)


def _render_image(c2w, K, H, W, near, far, n_samples=96, white_bkgd=True):
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
  density, rgb = field(pts)
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
                         datahold: int = 5, seed: int = 0) -> Scene:
  """Cameras on a circle looking at the origin; images rendered analytically."""
  del seed  # layout is deterministic
  focal = 0.8 * W
  K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
  poses, images, depths = [], [], []
  for i in range(num_images):
    theta = 2 * np.pi * i / num_images
    eye = np.array([radius * np.cos(theta), radius * np.sin(theta), 1.2],
                   np.float32)
    c2w = _look_at(eye)
    img, dep = _render_image(c2w, K, H, W, near, far)
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
