"""zip-nerf trainer: loss wiring, convergence on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.zipnerf import ZipNerfConfig
from snerf_tpu.train.zip_trainer import (
    ZipTrainConfig, create_zip_train_state, make_zip_train_step)

TINY_MODEL = dict(num_prop_samples=(8, 8), num_nerf_samples=8,
                  prop_grid_resolutions=(64, 128), nerf_grid_resolution=256,
                  grid_num_levels=4, grid_log2_hashmap_size=12,
                  bottleneck_width=32, net_width_viewdirs=16, sample_n=3,
                  raydist_fn="power_transformation")


def test_zip_train_loss_decreases():
  scene = make_synthetic_scene(num_images=10, H=20, W=24, datahold=10)
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(**TINY_MODEL)
  tcfg = ZipTrainConfig(batch_size=128, max_steps=300, lr_init=5e-3,
                        lr_final=1e-3, lr_delay_steps=0,
                        depth_loss_mult=0.01)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  key = jax.random.PRNGKey(1)
  losses = []
  for i in range(50):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    losses.append(float(m["loss_data"]))
    assert np.isfinite(losses[-1]), (i, m)
  assert np.mean(losses[-10:]) < np.mean(losses[:10])
  # regularizers present and finite
  for k_ in ("loss_interlevel", "loss_distortion", "loss_hash_decay",
             "loss_depth"):
    assert np.isfinite(float(m[k_])), k_


def test_zip_train_semantic_path():
  scene = make_synthetic_scene(num_images=6, H=16, W=16, datahold=6)
  # fake semantic labels from depth quantiles
  sem = np.clip((scene.depths / scene.far * 4).astype(np.int32), 0, 4)
  scene.semantics = sem
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(use_semantic=True, class_num=5, **TINY_MODEL)
  tcfg = ZipTrainConfig(batch_size=64, max_steps=100, lr_delay_steps=0)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  state, m = step(state, jax.random.PRNGKey(1))
  assert "loss_semantic" in m
  assert np.isfinite(float(m["loss"]))


def test_zip_pose_refine_window():
  scene = make_synthetic_scene(num_images=6, H=16, W=16, datahold=6)
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(**TINY_MODEL)
  tcfg = ZipTrainConfig(batch_size=64, max_steps=100, lr_delay_steps=0,
                        pose_refine=True, pose_start_step=0,
                        pose_end_step=50, pose_lr=1e-3)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg,
                                        num_images=scene.num_images)
  assert state.pose_params is not None
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  s1, m = step(state, jax.random.PRNGKey(1))   # step 0->1, in window
  s2, m = step(s1, jax.random.PRNGKey(2))
  delta = np.abs(np.asarray(s2.pose_params["r"]) -
                 np.asarray(state.pose_params["r"])).sum()
  assert delta > 0  # pose updated inside the window
  assert np.isfinite(float(m["loss"]))


def test_zip_patch_quarter_batches_and_smoothness():
  """patch_size > 1 turns on the patch-quarter mixed batch and both
  edge-aware smoothness losses (zipnerf train.py:281-296,
  datasets.py:397-414); object-masked pixels are excluded."""
  scene = make_synthetic_scene(num_images=6, H=16, W=16, datahold=6)
  sem = np.clip((scene.depths / scene.far * 4).astype(np.int32), 0, 4)
  scene.semantics = sem
  # object mask on a corner of every image
  mask = np.zeros(scene.images.shape[:3], bool)
  mask[:, :4, :4] = True
  scene.skymask = mask
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(use_semantic=True, class_num=5, **TINY_MODEL)
  tcfg = ZipTrainConfig(batch_size=128, max_steps=100, lr_delay_steps=0,
                        patch_size=4, depth_loss_mult=0.01,
                        depth_complete=True)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  key = jax.random.PRNGKey(1)
  losses = []
  for _ in range(12):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    losses.append(float(m["loss"]))
  for k_ in ("loss_smooth", "loss_semantic_smooth", "loss_depth",
             "loss_depth_complete", "loss_semantic", "loss_data"):
    assert k_ in m and np.isfinite(float(m[k_])), k_
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]


def test_zip_smoothness_losses_prefer_smooth_patches():
  """zip_smooth_loss penalizes rough depth; masked pixels are ignored."""
  from snerf_tpu.train import losses as L
  key = jax.random.PRNGKey(0)
  rgb = jnp.ones((2, 8, 8, 3)) * 0.5           # uniform rgb -> full penalty
  smooth_depth = jnp.ones((2, 8, 8)) * 5.0
  rough_depth = 5.0 + jax.random.uniform(key, (2, 8, 8)) * 4.0
  ls = float(L.zip_smooth_loss(rgb, smooth_depth))
  lr = float(L.zip_smooth_loss(rgb, rough_depth))
  assert ls < 1e-6 < lr
  # mask out the rough half -> loss drops
  m = jnp.ones((2, 8, 8)).at[:, :, 4:].set(0.0)
  rough_half = smooth_depth.at[:, :, 4:].set(rough_depth[:, :, 4:])
  lm = float(L.zip_smooth_loss(rgb, rough_half, valid_mask=m))
  lf = float(L.zip_smooth_loss(rgb, rough_half))
  assert lm < lf
  # semantic variant: uniform probs smooth, one-hot checkerboard rough
  sem_smooth = jnp.ones((2, 8, 8, 4)) * 0.25
  chk = (jnp.arange(8)[:, None] + jnp.arange(8)[None]) % 2
  sem_rough = jax.nn.one_hot(
      jnp.broadcast_to(chk, (2, 8, 8)), 4)
  ss = float(L.zip_semantic_smooth_loss(rgb, sem_smooth))
  sr = float(L.zip_semantic_smooth_loss(rgb, sem_rough))
  assert ss < 1e-6 < sr


def test_zip_bf16_trunk_matches_f32():
  """compute_dtype=bf16 (reference AMP parity) must track the f32 model
  within mixed-precision tolerance on the same params."""
  from snerf_tpu.models.zipnerf import init_zipnerf
  from snerf_tpu.data.raygen import pixels_to_rays
  mcfg32 = ZipNerfConfig(**TINY_MODEL)
  mcfg16 = ZipNerfConfig(compute_dtype=jnp.bfloat16, **TINY_MODEL)
  model32, variables = init_zipnerf(jax.random.PRNGKey(0), mcfg32)
  model16, _ = init_zipnerf(jax.random.PRNGKey(0), mcfg16)
  c2w = jnp.eye(4)[:3]
  K = jnp.asarray([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
  px, py = jnp.meshgrid(jnp.arange(16.0), jnp.arange(16.0))
  rays = pixels_to_rays(px.ravel(), py.ravel(), c2w, K, 0.5, 20.0)
  r32, _ = model32.apply(variables, rays, rng=None)
  r16, _ = model16.apply(variables, rays, rng=None)
  rgb32 = np.asarray(r32[-1]["rgb"])
  rgb16 = np.asarray(r16[-1]["rgb"])
  assert np.isfinite(rgb16).all()
  assert np.max(np.abs(rgb32 - rgb16)) < 0.05
  assert np.mean(np.abs(rgb32 - rgb16)) < 0.01


def test_zip_ipe_encoder_trains():
  """Gather-free IPE backbone behind the same zip-nerf API."""
  scene = make_synthetic_scene(num_images=10, H=20, W=24, datahold=10)
  dev = scene_to_device(scene)
  cfg_kwargs = dict(TINY_MODEL)
  mcfg = ZipNerfConfig(encoder_type="ipe", ipe_max_deg=6,
                       ipe_density_depth=2, ipe_density_width=32,
                       **cfg_kwargs)
  tcfg = ZipTrainConfig(batch_size=128, max_steps=200, lr_init=5e-3,
                        lr_final=1e-3, lr_delay_steps=0)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  key = jax.random.PRNGKey(1)
  losses = []
  for _ in range(40):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    losses.append(float(m["loss_data"]))
  assert np.isfinite(losses).all()
  assert np.mean(losses[-8:]) < np.mean(losses[:8])
  assert "loss_hash_decay" not in m  # no tables in the IPE backbone


def test_zip_ema_params():
  """EMA of params: maintained inside the jitted step with the warmed
  decay d_t = min(d, (1+t)/(10+t)); eval_params returns the EMA copy
  (the live params otherwise), and the EMA trails the live params."""
  from snerf_tpu.train.zip_trainer import eval_params
  scene = make_synthetic_scene(num_images=6, H=16, W=16, datahold=6)
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(**TINY_MODEL)
  tcfg = ZipTrainConfig(batch_size=64, max_steps=100, lr_init=5e-3,
                        lr_final=1e-3, lr_delay_steps=0, ema_decay=0.99)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
  assert state.ema_params is not None
  p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  key = jax.random.PRNGKey(1)
  for _ in range(12):
    key, k = jax.random.split(key)
    state, m = step(state, k)
  assert np.isfinite(float(m["loss"]))
  live = jax.tree_util.tree_leaves(state.params)[0]
  ema = jax.tree_util.tree_leaves(state.ema_params)[0]
  assert not np.allclose(np.asarray(live), np.asarray(p0))  # trained
  assert not np.allclose(np.asarray(ema), np.asarray(live))  # trails
  # the EMA is a convex average: it sits between init and live params
  # in the direction of travel on average
  assert np.isfinite(np.asarray(ema)).all()
  np.testing.assert_array_equal(
      np.asarray(jax.tree_util.tree_leaves(eval_params(state))[0]),
      np.asarray(ema))
  # ema off -> eval_params returns live params
  tcfg0 = ZipTrainConfig(batch_size=64, max_steps=100, lr_init=5e-3,
                         lr_final=1e-3, lr_delay_steps=0)
  _, state0 = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg0)
  assert state0.ema_params is None
  assert eval_params(state0) is state0.params
