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
