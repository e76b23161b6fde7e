"""On-device ray-batch sampling from an HBM-resident scene.

Replaces the reference's host-side per-iteration samplers (rayset.py
SingleImage / FullDataset, sample_utils.py:92-211) with a jitted function:
the whole (uint8 image, pose, K, depth, semantic) tensor set lives on
device and each step gathers `batch_size` random pixels — zero host-device
traffic in steady state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import raygen
from snerf_tpu.data.scene import Scene


def scene_to_device(scene: Scene, include_depth: bool = True,
                    include_semantic: bool = True):
  """Ship scene tensors to device as a dict of jnp arrays."""
  d = {
      "images": jnp.asarray(scene.images),  # uint8
      "poses": jnp.asarray(scene.poses, jnp.float32),
      "intrinsics": jnp.asarray(scene.intrinsics, jnp.float32),
      "cam_index": jnp.asarray(
          scene.cam_index if scene.cam_index is not None
          else np.zeros(scene.num_images, np.int32)),
  }
  if include_depth and scene.depths is not None:
    d["depths"] = jnp.asarray(scene.depths, jnp.float32)
  if getattr(scene, "bboxes", None) is not None:
    d["bboxes"] = jnp.asarray(scene.bboxes, jnp.float32)
  if scene.skymask is not None:
    d["skymask"] = jnp.asarray(scene.skymask)
  if include_semantic and scene.semantics is not None:
    d["semantics"] = jnp.asarray(scene.semantics, jnp.int32)
  return d


def sample_patch_coords(key, H, W, n_patches: int, patch_size: int):
  """Top-left-anchored square patches: returns (py, px) each [n*ps*ps].

  Parity: reference sample_utils.py:68-89 (sample_patches_pt) — random
  patch anchors, rays appended after the random pixels.
  """
  ky, kx = jax.random.split(key)
  y0 = jax.random.randint(ky, (n_patches,), 0, H - patch_size)
  x0 = jax.random.randint(kx, (n_patches,), 0, W - patch_size)
  dy, dx = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size),
                        indexing="ij")
  py = (y0[:, None, None] + dy[None]).reshape(-1)
  px = (x0[:, None, None] + dx[None]).reshape(-1)
  return py, px


def sample_batch(key,
                 device_scene: dict,
                 i_train: jnp.ndarray,
                 batch_size: int,
                 near: float,
                 far: float,
                 single_image: bool = True,
                 n_patches: int = 0,
                 patch_size: int = 8,
                 use_pose_table: Optional[jnp.ndarray] = None):
  """Draw one training batch fully on device.

  Returns (rays, targets) where targets has rgb [B,3] in [0,1], and
  optionally depth [B], semantic [B], img_idx [B], pix (py, px).
  single_image=True matches the reference SingleImage loader (all rays from
  one random train image per step); False samples uniformly over all
  train images (zipnerf _next_train behavior).
  """
  imgs = device_scene["images"]
  N, H, W = imgs.shape[:3]
  k_img, k_pix, k_patch = jax.random.split(key, 3)

  n_rand = batch_size
  if single_image:
    sel = i_train[jax.random.randint(k_img, (), 0, i_train.shape[0])]
    img_idx = jnp.full((n_rand,), sel, jnp.int32)
  else:
    img_idx = i_train[
        jax.random.randint(k_img, (n_rand,), 0, i_train.shape[0])]

  if "bboxes" in device_scene:
    # foreground branch (reference --block_bg, sample_utils.py:29-49):
    # rays restricted to each image's 2D vehicle bbox [x0, y0, x1, y1]
    bb = device_scene["bboxes"][img_idx]  # [n_rand, 4]
    ku, kv = jax.random.split(k_pix)
    u = jax.random.uniform(ku, (n_rand,))
    v = jax.random.uniform(kv, (n_rand,))
    px = jnp.clip((bb[:, 0] + u * (bb[:, 2] - bb[:, 0])).astype(jnp.int32),
                  0, W - 1)
    py = jnp.clip((bb[:, 1] + v * (bb[:, 3] - bb[:, 1])).astype(jnp.int32),
                  0, H - 1)
  else:
    pix_flat = jax.random.randint(k_pix, (n_rand,), 0, H * W)
    py = pix_flat // W
    px = pix_flat % W

  if n_patches > 0:
    ppy, ppx = sample_patch_coords(k_patch, H, W, n_patches, patch_size)
    if single_image:
      pidx = jnp.full(ppy.shape, img_idx[0], jnp.int32)
    else:
      pidx = jnp.repeat(img_idx[:n_patches], patch_size * patch_size)
    py = jnp.concatenate([py, ppy])
    px = jnp.concatenate([px, ppx])
    img_idx = jnp.concatenate([img_idx, pidx])

  poses = use_pose_table if use_pose_table is not None \
      else device_scene["poses"]
  c2w = poses[img_idx]
  K = device_scene["intrinsics"][img_idx]

  rays = raygen.pixels_to_rays(
      px.astype(jnp.float32), py.astype(jnp.float32), c2w, K, near, far,
      app=img_idx)

  targets = {
      "rgb": imgs[img_idx, py, px].astype(jnp.float32) / 255.0,
      "img_idx": img_idx,
      "py": py,
      "px": px,
  }
  if "depths" in device_scene:
    targets["depth"] = device_scene["depths"][img_idx, py, px]
  if "skymask" in device_scene:
    targets["skymask"] = device_scene["skymask"][img_idx, py, px]
  if "semantics" in device_scene:
    targets["semantic"] = device_scene["semantics"][img_idx, py, px]
  targets["cam_index"] = device_scene["cam_index"][img_idx]
  return rays, targets
