"""camera_utils + waymo render-pose generation."""

import numpy as np

from snerf_tpu.data import camera_utils as cu
from snerf_tpu.data.waymo import generate_random_render_poses, render2raw


def _random_pose(rng):
  # random rotation via QR
  q, _ = np.linalg.qr(rng.randn(3, 3))
  if np.linalg.det(q) < 0:
    q[:, 0] *= -1
  return np.concatenate([q, rng.randn(3, 1)], axis=1).astype(np.float32)


def test_transform_poses_pca_bounds():
  rng = np.random.RandomState(0)
  poses = np.stack([_random_pose(rng) for _ in range(20)])
  poses[:, :3, 3] *= 50  # large scene
  new_poses, transform, sf = cu.transform_poses_pca(poses)
  assert sf <= 1 / 10 + 1e-9
  assert np.abs(new_poses[:, :3, 3]).max() <= 1.0 + 1e-5
  # transform actually maps old to new
  mapped = (transform @ cu.pad_poses(poses))[:, :3, :]
  np.testing.assert_allclose(mapped[:, :3, 3], new_poses[:, :3, 3],
                             atol=1e-4)


def test_slerp_endpoints_and_midpoint():
  rng = np.random.RandomState(1)
  q0, _ = np.linalg.qr(rng.randn(3, 3))
  if np.linalg.det(q0) < 0:
    q0[:, 0] *= -1
  # rotate q0 by 90 deg about z
  rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
  q1 = rz @ q0
  np.testing.assert_allclose(cu.slerp(q0, q1, 0.0), q0, atol=1e-6)
  np.testing.assert_allclose(cu.slerp(q0, q1, 1.0), q1, atol=1e-6)
  mid = cu.slerp(q0, q1, 0.5)
  rz45 = np.array([[np.cos(np.pi / 4), -np.sin(np.pi / 4), 0],
                   [np.sin(np.pi / 4), np.cos(np.pi / 4), 0], [0, 0, 1]])
  np.testing.assert_allclose(mid, rz45 @ q0, atol=1e-6)


def test_interpolate_two_pose_identity():
  rng = np.random.RandomState(2)
  p = _random_pose(rng)
  out = cu.interpolate_two_pose(p, p, ratio=0.3)
  np.testing.assert_allclose(out[:3], p, atol=1e-5)
  assert out.shape == (4, 4)


def test_ellipse_and_spiral_paths():
  rng = np.random.RandomState(3)
  poses = np.stack([cu.viewmatrix(
      np.array([np.cos(t), np.sin(t), 0.0]),
      np.array([0, 0, 1.0]),
      np.array([2 * np.cos(t), 2 * np.sin(t), 0.5]))
      for t in np.linspace(0, 2 * np.pi, 12, endpoint=False)])
  ell = cu.generate_ellipse_path(poses, n_frames=24)
  assert ell.shape == (24, 3, 4)
  spiral = cu.generate_spiral_path(poses, np.array([1.0, 10.0]),
                                   n_frames=16)
  assert spiral.shape == (16, 3, 4)
  # all generated rotations are orthonormal
  for p in [ell, spiral]:
    rtr = p[:, :3, :3] @ np.transpose(p[:, :3, :3], (0, 2, 1))
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (p.shape[0], 1, 1)),
                               atol=1e-5)


def test_generate_random_render_poses():
  rng = np.random.RandomState(4)
  n_per_cam, n_cams = 20, 5
  poses = np.stack([_random_pose(rng) for _ in range(n_per_cam * n_cams)])
  poses[:, :3, 3] *= 0.05
  K = np.array([[500.0, 0, 960], [0, 500, 640], [0, 0, 1]])
  rp = generate_random_render_poses(
      poses, K, K, np.array([1280, 1920]), np.array([1280, 1920]),
      scale_factor=0.05, n_render=16, seed=7)
  assert rp.poses.shape == (16, 4, 4)
  assert rp.intrinsics.shape == (16, 3, 3)
  # deterministic under the same seed
  rp2 = generate_random_render_poses(
      poses, K, K, np.array([1280, 1920]), np.array([1280, 1920]),
      scale_factor=0.05, n_render=16, seed=7)
  np.testing.assert_allclose(rp.poses, rp2.poses)
  # rotations stay orthonormal
  rtr = rp.poses[:, :3, :3] @ np.transpose(rp.poses[:, :3, :3], (0, 2, 1))
  np.testing.assert_allclose(rtr, np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)


def test_render2raw_roundtrip_shape():
  rng = np.random.RandomState(5)
  poses = np.stack([_random_pose(rng) for _ in range(10)])
  norm, transform, sf = cu.transform_poses_pca(poses)
  rposes = np.tile(np.eye(4, dtype=np.float32)[None], (4, 1, 1))
  rposes[:, :3, :] = norm[:4]
  start = np.eye(4)
  raw = render2raw(rposes, transform, sf, start)
  assert raw.shape == (4, 4, 4)
  assert np.isfinite(raw).all()


def test_blender_loader(tmp_path):
  import imageio.v2 as imageio
  import json, os
  os.makedirs(tmp_path / "train")
  frames = []
  rng = np.random.RandomState(0)
  for i in range(3):
    rgba = rng.randint(0, 255, (16, 20, 4), np.uint8)
    imageio.imwrite(tmp_path / "train" / f"r_{i}.png", rgba)
    m = np.eye(4).tolist()
    frames.append({"file_path": f"train/r_{i}",
                   "transform_matrix": m})
  with open(tmp_path / "transforms_train.json", "w") as f:
    json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
  from snerf_tpu.data.blender import load_blender_scene
  scene = load_blender_scene(str(tmp_path))
  assert scene.images.shape == (3, 16, 20, 3)
  focal = 0.5 * 20 / np.tan(0.35)
  assert abs(scene.intrinsics[0, 0, 0] - focal) < 1e-3
  assert scene.near == 2.0 and scene.far == 6.0


def test_sga_aggregation_props():
  import jax.numpy as jnp
  from snerf_tpu.preprocess.aggregation import (
      cost_volume, lga, nlf, sga)
  rng = np.random.RandomState(1)
  x = jnp.asarray(rng.rand(1, 2, 6, 8), jnp.float32)
  # g1=0 => pure passthrough for every direction => max = x
  g = np.zeros((1, 4, 2, 6, 8), np.float32)
  g[:, :, 0] = 1.0
  out = sga(x, jnp.asarray(g))
  np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
  # lga with identity filter (center weight 1) reproduces x
  filt = np.zeros((1, 9, 6, 8), np.float32)
  filt[:, 4] = 1.0
  np.testing.assert_allclose(np.asarray(lga(x, jnp.asarray(filt))),
                             np.asarray(x), atol=1e-6)
  # nlf with zero carry = passthrough
  z = jnp.zeros((1, 1, 6, 8))
  np.testing.assert_allclose(np.asarray(nlf(x, z, z, z, z)),
                             np.asarray(x), atol=1e-6)
  # cost volume: identical features give max correlation at d=0
  f = jnp.asarray(rng.rand(1, 4, 6, 8), jnp.float32)
  cv = cost_volume(f, f, 3)
  assert cv.shape == (1, 3, 6, 8)
  # self-correlation peaks at zero displacement on average
  assert float(cv[:, 0, :, 4:].mean()) > float(cv[:, 1, :, 4:].mean())
  assert float(cv[:, 0, :, 4:].mean()) > float(cv[:, 2, :, 4:].mean())
