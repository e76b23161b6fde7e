"""RefNeRF machinery (VERDICT r1 missing #6): IDE/spherical harmonics +
geopoly parity vs the reference torch/numpy code, reflections, and the
orientation / predicted-normal losses wired through the zip trainer."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/s-nerfpp/zipnerf"


def _ref_module(name):
  # the reference uses np.math.factorial, removed in modern numpy
  import math
  if not hasattr(np, "math"):
    np.math = math
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  try:
    import importlib
    mod = importlib.import_module(f"internal.{name}")
  finally:
    sys.path.remove(REF)
  return mod


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_ide_parity_vs_reference():
  import torch
  ref_ru = _ref_module("ref_utils")
  from snerf_tpu.ops import ref_utils
  rng = np.random.RandomState(0)
  d = rng.randn(128, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  kappa_inv = rng.rand(128, 1).astype(np.float32) * 0.5
  for deg in (2, 4):
    ours = np.asarray(ref_utils.generate_ide_fn(deg)(
        jnp.asarray(d), jnp.asarray(kappa_inv)))
    theirs = ref_ru.generate_ide_fn(deg)(
        torch.from_numpy(d), torch.from_numpy(kappa_inv)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
  # plain directional encoding too
  ours = np.asarray(ref_utils.generate_dir_enc_fn(3)(jnp.asarray(d)))
  theirs = ref_ru.generate_dir_enc_fn(3)(torch.from_numpy(d)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_geopoly_basis_parity():
  ref_gp = _ref_module("geopoly")
  from snerf_tpu.ops import geopoly
  for shape, tess in (("icosahedron", 2), ("octahedron", 1)):
    ours = geopoly.generate_basis(shape, tess)
    theirs = ref_gp.generate_basis(shape, tess)
    assert ours.shape == theirs.shape
    # same direction set up to row order and sign-canonicalization
    def canon(b):
      b = np.asarray(b, np.float64)
      sign = np.where(b[:, :1] < -1e-9, -1.0, 1.0)
      return np.array(sorted((b * sign).round(6).tolist()))
    np.testing.assert_allclose(canon(ours), canon(theirs), atol=1e-5)


def test_reflect_geometry():
  from snerf_tpu.ops import ref_utils
  n = jnp.asarray([[0.0, 0.0, 1.0]])
  v = jnp.asarray([[1.0, 0.0, 1.0]]) / np.sqrt(2)
  r = np.asarray(ref_utils.reflect(v, n))
  np.testing.assert_allclose(r, [[-1 / np.sqrt(2), 0, 1 / np.sqrt(2)]],
                             atol=1e-6)


def test_zip_refnerf_flags_train_step():
  """Density normals + predicted normals + IDE/reflections + orientation
  and predicted-normal losses, end to end through one train step."""
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state, make_zip_train_step)
  scene = make_synthetic_scene(num_images=6, H=12, W=12, datahold=6)
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(
      num_prop_samples=(4, 4), num_nerf_samples=4,
      prop_grid_resolutions=(32, 64), nerf_grid_resolution=128,
      grid_num_levels=3, grid_log2_hashmap_size=10,
      bottleneck_width=16, net_width_viewdirs=16, sample_n=2,
      disable_density_normals=False, enable_pred_normals=True,
      use_directional_enc=True, use_reflections=True,
      enable_pred_roughness=True, deg_view=2)
  tcfg = ZipTrainConfig(batch_size=32, max_steps=10, lr_delay_steps=0,
                        orientation_loss_mult=0.01,
                        orientation_coarse_loss_mult=0.001,
                        predicted_normal_loss_mult=3e-4,
                        predicted_normal_coarse_loss_mult=3e-5)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  state, m = step(state, jax.random.PRNGKey(1))
  for k in ("loss_orientation", "loss_predicted_normals", "loss"):
    assert k in m and np.isfinite(float(m[k])), k
  state, m2 = step(state, jax.random.PRNGKey(2))
  assert np.isfinite(float(m2["loss"]))
