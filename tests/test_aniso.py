"""Anisotropic interval-cast featurization (round-4 zip-vs-mip fix):
ipe_anisotropic / cp_anisotropic in models/zipnerf.py.

Capability context: the realfocal gap hunt (PERF.md batches 7-12)
found the zip family's deficit was the isotropic multisample encoding
x trunk topology compounding; the production fix casts per-interval
cylindrical Gaussians (mip.cast_rays) and propagates the DIAG
covariance through the mip-360 contraction in closed form
(coord.warp_fn2_gaussian_diag, radius=1 == zip's contract).
"""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.models.zipnerf import ZipNerfConfig, ZipNerfModel
from snerf_tpu.ops import coord
from snerf_tpu.ops.rays import Rays


def _rays(n=8, near=0.2, far=0.9):
  rng = np.random.RandomState(0)
  d = rng.randn(n, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  return Rays(
      origins=jnp.zeros((n, 3)), directions=jnp.asarray(d),
      viewdirs=jnp.asarray(d), radii=jnp.full((n, 1), 1e-3),
      lossmult=jnp.ones((n, 1)), near=jnp.full((n, 1), near),
      far=jnp.full((n, 1), far), app=jnp.zeros((n, 1), jnp.int32))


_COMMON = dict(num_prop_samples=(4, 4), num_nerf_samples=4,
               ipe_density_width=16, ipe_density_depth=2, ipe_max_deg=4,
               bottleneck_width=16, net_width_viewdirs=16,
               raydist_fn=None, anneal_slope=0.0,
               dilation_multiplier=0.0, dilation_bias=0.0,
               single_jitter=True)


def test_contract_radius1_matches_zip_contract_means():
  """warp_fn2(radius=1) IS zip's contraction: identity inside the unit
  ball, (2 - 1/|x|) x/|x| outside — means must match contract_mean_std
  exactly on both sides of the boundary."""
  rng = np.random.RandomState(1)
  x = jnp.asarray(rng.randn(64, 3).astype(np.float32) * 1.5)
  cov = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 1e-4)
  z_ref, _ = coord.contract_mean_std(x, jnp.sqrt(cov.mean(-1)))
  z_diag, var = coord.warp_fn2_gaussian_diag(x, cov, radius=1.0)
  np.testing.assert_allclose(np.asarray(z_diag), np.asarray(z_ref),
                             rtol=1e-5, atol=1e-6)
  assert np.all(np.asarray(var) > 0)
  # inside the ball the warp is the identity: var must pass through
  inside = np.linalg.norm(np.asarray(x), axis=-1) < 0.99
  np.testing.assert_allclose(np.asarray(var)[inside],
                             np.asarray(cov)[inside], rtol=1e-5)


def test_ipe_aniso_equals_mipcast_inside_unit_ball():
  """With all content inside the unit ball (scene_scale=1, rays within
  |x|<1) the contraction is the identity, so ipe_anisotropic must
  reproduce the mipcast diagnostic bit-for-bit (same params)."""
  kw = dict(_COMMON)
  rays = _rays(near=0.2, far=0.9)  # all points within the unit ball
  cfg_m = ZipNerfConfig(encoder_type="mipcast", **kw)
  cfg_a = ZipNerfConfig(encoder_type="ipe", ipe_anisotropic=True,
                        scene_scale=1.0, **kw)
  m_m = ZipNerfModel(config=cfg_m)
  m_a = ZipNerfModel(config=cfg_a)
  v = m_m.init(jax.random.PRNGKey(0), rays, rng=None)
  out_m, _ = m_m.apply(v, rays, rng=None)
  out_a, _ = m_a.apply(v, rays, rng=None)
  np.testing.assert_allclose(np.asarray(out_a[-1]["rgb"]),
                             np.asarray(out_m[-1]["rgb"]),
                             rtol=1e-5, atol=1e-6)


def test_cp_aniso_sees_per_axis_variance():
  """The CP encoder must receive PER-AXIS stds under cp_anisotropic:
  stretching the covariance along one axis changes the features in a
  way the isotropic-equivalent (mean-variance) chain cannot express."""
  from snerf_tpu.models.cpgrid import CPEncoding
  enc = CPEncoding(num_levels=2, level_dim=4, base_resolution=16,
                   max_resolution=32)
  x = jax.random.uniform(jax.random.PRNGKey(0), (16, 1, 3),
                         minval=0.3, maxval=0.7)
  v = enc.init(jax.random.PRNGKey(1), x, jnp.full((16, 1), 0.01))
  iso = jnp.full((16, 1, 3), 0.02)
  stretched = iso.at[..., 0].set(0.06).at[..., 1].set(0.0115)
  # (same mean variance as a control that anisotropy is the difference)
  out_iso = np.asarray(enc.apply(v, x, iso))
  out_st = np.asarray(enc.apply(v, x, stretched))
  assert np.max(np.abs(out_iso - out_st)) > 1e-4


def test_cp_aniso_model_trains_and_matches_shapes():
  cfg = ZipNerfConfig(encoder_type="cp_hash", cp_anisotropic=True,
                      cp_num_levels=2, cp_level_dim=4,
                      cp_base_resolution=8, cp_max_resolution=16,
                      cp_prop_num_levels=2, cp_prop_level_dim=2,
                      cp_hash_resolution=32, cp_hash_log2=8,
                      scene_scale=0.5, **_COMMON)
  model = ZipNerfModel(config=cfg)
  rays = _rays()
  v = model.init(jax.random.PRNGKey(0), rays, rng=None)
  out, hist = model.apply(v, rays, rng=jax.random.PRNGKey(1))
  assert out[-1]["rgb"].shape == (8, 3)
  assert np.isfinite(np.asarray(out[-1]["rgb"])).all()
  g = jax.grad(lambda p: jnp.sum(
      model.apply({"params": p}, rays, rng=None)[0][-1]["rgb"]))(
          v["params"])
  assert all(np.isfinite(np.asarray(t)).all()
             for t in jax.tree_util.tree_leaves(g))
