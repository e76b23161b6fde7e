"""L3 data + L4 trainer: synthetic scene, on-device sampling, loss-goes-down,
and multi-device sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.raygen import pixels_to_rays, rays_for_image
from snerf_tpu.data.sampler import sample_batch, scene_to_device
from snerf_tpu.models.mipnerf import MipNerfConfig
from snerf_tpu.parallel import make_mesh, shard_batch
from snerf_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)


def small_scene():
  return make_synthetic_scene(num_images=5, H=24, W=32)


def test_synthetic_scene_consistency():
  scene = small_scene()
  assert scene.images.shape == (5, 24, 32, 3)
  assert scene.poses.shape == (5, 3, 4)
  assert scene.depths.shape == (5, 24, 32)
  # Camera looks at the origin: center pixel depth approx camera distance.
  cam_pos = scene.poses[0, :3, 3]
  dist = np.linalg.norm(cam_pos)
  center_depth = scene.depths[0, 12, 16]
  assert abs(center_depth - dist) < 1.0


def test_raygen_directions_and_radii():
  scene = small_scene()
  rays = rays_for_image(jnp.asarray(scene.poses[0]),
                        jnp.asarray(scene.intrinsics[0]), 24, 32,
                        scene.near, scene.far)
  assert rays.origins.shape == (24, 32, 3)
  # viewdirs unit norm
  n = jnp.linalg.norm(rays.viewdirs, axis=-1)
  np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)
  # radii constant = 2/(f*sqrt(12))
  f = scene.intrinsics[0][0, 0]
  np.testing.assert_allclose(
      np.asarray(rays.radii), 2 / (f * np.sqrt(12)), rtol=1e-5)
  # center ray points from camera towards origin
  center = np.asarray(rays.viewdirs[12, 16])
  to_origin = -scene.poses[0, :3, 3]
  to_origin = to_origin / np.linalg.norm(to_origin)
  assert np.dot(center, to_origin) > 0.99


def test_sample_batch_targets_match_gather():
  scene = small_scene()
  dev = scene_to_device(scene)
  rays, targets = sample_batch(
      jax.random.PRNGKey(0), dev, jnp.asarray(scene.i_train), 64,
      scene.near, scene.far, single_image=True)
  assert rays.origins.shape == (64, 3)
  ii = np.asarray(targets["img_idx"])
  py = np.asarray(targets["py"])
  px = np.asarray(targets["px"])
  expect = scene.images[ii, py, px].astype(np.float32) / 255.0
  np.testing.assert_allclose(np.asarray(targets["rgb"]), expect, atol=1e-6)
  # single_image mode: all rays from one image
  assert len(np.unique(ii)) == 1
  assert ii[0] in scene.i_train


def test_train_loss_decreases():
  scene = small_scene()
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(num_samples=24, num_fine=24, hidden_layer=48,
                       proposal_hidden_layer=32, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=128, n_iters=200, lrate=2e-3, lrate_final=1e-3,
                     lrate_delay_steps=0, proposal_loss=True,
                     depth_loss=True, depth_lambda=0.05, white_bkgd=True)
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  step = make_train_step(model, pose_model, tcfg, dev,
                         scene.i_train, scene.near, scene.far, donate=False)
  key = jax.random.PRNGKey(1)
  first = None
  losses = []
  for i in range(60):
    key, k = jax.random.split(key)
    state, metrics = step(state, k)
    losses.append(float(metrics["loss_rgb"]))
  first = np.mean(losses[:10])
  last = np.mean(losses[-10:])
  assert last < first, (first, last)
  assert np.isfinite(losses).all()


def test_mip_ema_params():
  """EMA-of-params on the mip trainer (same warmed-decay scheme as the
  zip trainer): maintained inside the jitted step; eval_params returns
  the EMA copy, which trails the live params."""
  from snerf_tpu.train.zip_trainer import eval_params
  scene = small_scene()
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(num_samples=8, num_fine=8, hidden_layer=32,
                       proposal_hidden_layer=32, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=64, n_iters=100, lrate=2e-3, lrate_final=1e-3,
                     lrate_delay_steps=0, ema_decay=0.99)
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  assert state.ema_params is not None
  step = make_train_step(model, pose_model, tcfg, dev,
                         scene.i_train, scene.near, scene.far,
                         donate=False)
  key = jax.random.PRNGKey(1)
  for _ in range(8):
    key, k = jax.random.split(key)
    state, metrics = step(state, k)
  assert np.isfinite(float(metrics["loss_rgb"]))
  live = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
  ema = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
  assert not np.allclose(ema, live)          # trails
  assert np.isfinite(ema).all()
  np.testing.assert_array_equal(
      np.asarray(jax.tree_util.tree_leaves(eval_params(state))[0]), ema)
  # off by default -> no buffers, eval_params returns live params
  tcfg0 = TrainConfig(n_rgb=64, n_iters=100)
  _, _, state0 = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg0, scene.num_images)
  assert state0.ema_params is None
  assert eval_params(state0) is state0.params


def test_train_step_sharded_on_mesh():
  """Multi-chip path: batch-shard rays over the 8-device CPU mesh."""
  scene = small_scene()
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(num_samples=8, num_fine=8, hidden_layer=16,
                       proposal_hidden_layer=16, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=64, n_iters=100, pose_refine=True)
  mesh = make_mesh()
  assert mesh.devices.size == 8
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  with mesh:
    step = make_train_step(model, pose_model, tcfg, dev,
                           scene.i_train, scene.near, scene.far,
                           donate=False)
    state, metrics = step(state, jax.random.PRNGKey(1))
    state, metrics = step(state, jax.random.PRNGKey(2))
  assert np.isfinite(float(metrics["loss"]))
  assert int(state.step) == 2
  # pose params got an update path (zero-init but present)
  assert state.pose_params is not None


def test_bbox_restricted_sampling():
  """Foreground branch: all sampled pixels fall inside per-image bboxes."""
  scene = small_scene()
  scene.bboxes = np.tile(np.array([[8.0, 4.0, 20.0, 16.0]]),
                         (scene.num_images, 1)).astype(np.float32)
  dev = scene_to_device(scene)
  assert "bboxes" in dev
  rays, targets = sample_batch(
      jax.random.PRNGKey(0), dev, jnp.asarray(scene.i_train), 128,
      scene.near, scene.far, single_image=False)
  px = np.asarray(targets["px"])
  py = np.asarray(targets["py"])
  assert (px >= 8).all() and (px < 20).all()
  assert (py >= 4).all() and (py < 16).all()
