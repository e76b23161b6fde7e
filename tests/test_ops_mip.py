"""Tests for mip primitives: encodings and frustum Gaussians."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops import mip


def test_pos_enc_shape_and_identity():
  x = jnp.ones((5, 3)) * 0.25
  enc = mip.pos_enc(x, 0, 4, append_identity=True)
  assert enc.shape == (5, 3 + 3 * 2 * 4)
  np.testing.assert_allclose(enc[:, :3], 0.25)


def test_pos_enc_values():
  x = jnp.array([[0.5, 0.0, 0.0]])
  enc = mip.pos_enc(x, 0, 1, append_identity=False)
  # degrees: [sin(x), sin(x + pi/2)=cos(x)] for scale 1.
  np.testing.assert_allclose(
      np.asarray(enc)[0],
      [np.sin(0.5), 0.0, 0.0, np.cos(0.5), 1.0, 1.0], atol=1e-6)


def test_expected_sin_zero_var():
  x = jnp.linspace(-3, 3, 7)
  y, y_var = mip.expected_sin(x, jnp.zeros_like(x))
  np.testing.assert_allclose(y, np.sin(np.asarray(x)), atol=1e-6)
  np.testing.assert_allclose(y_var, 0.5 * (1 - np.cos(2 * np.asarray(x))) -
                             np.sin(np.asarray(x)) ** 2, atol=1e-5)


def test_expected_sin_large_var_shrinks():
  y, _ = mip.expected_sin(jnp.array([1.0]), jnp.array([100.0]))
  assert abs(float(y[0])) < 1e-10


def test_lift_gaussian_diag_vs_full():
  rng = np.random.RandomState(1)
  d = jnp.array(rng.randn(4, 3), jnp.float32)
  t_mean = jnp.array(rng.rand(4, 8), jnp.float32) + 1
  t_var = jnp.array(rng.rand(4, 8), jnp.float32) * 0.1
  r_var = jnp.array(rng.rand(4, 8), jnp.float32) * 0.1
  mean_d, cov_d = mip.lift_gaussian(d, t_mean, t_var, r_var, diag=True)
  mean_f, cov_f = mip.lift_gaussian(d, t_mean, t_var, r_var, diag=False)
  np.testing.assert_allclose(mean_d, mean_f, atol=1e-6)
  # diag of full covariance equals the diag covariance.
  np.testing.assert_allclose(
      np.asarray(cov_d),
      np.diagonal(np.asarray(cov_f), axis1=-2, axis2=-1), atol=1e-5)


def test_conical_frustum_stable_matches_unstable():
  d = jnp.array([[0.0, 0.0, 1.0]])
  t0 = jnp.array([[1.0]])
  t1 = jnp.array([[1.5]])
  r = jnp.array([[0.01]])
  m1, c1 = mip.conical_frustum_to_gaussian(d, t0, t1, r, diag=True,
                                           stable=True)
  m2, c2 = mip.conical_frustum_to_gaussian(d, t0, t1, r, diag=True,
                                           stable=False)
  np.testing.assert_allclose(m1, m2, rtol=1e-4)
  np.testing.assert_allclose(c1, c2, rtol=1e-3, atol=1e-9)


def test_cylinder_moments():
  # Cylinder along +z from t=1 to t=3 with radius 0.5:
  # t_mean=2, t_var=(2^2)/12=1/3, r_var=0.0625.
  d = jnp.array([[0.0, 0.0, 1.0]])
  mean, cov = mip.cylinder_to_gaussian(
      d, jnp.array([[1.0]]), jnp.array([[3.0]]), jnp.array([[0.5]]), True)
  np.testing.assert_allclose(np.asarray(mean)[0, 0], [0, 0, 2.0], atol=1e-6)
  np.testing.assert_allclose(np.asarray(cov)[0, 0], [0.0625, 0.0625, 1 / 3],
                             atol=1e-6)


def test_cast_rays_offsets_origin():
  origins = jnp.array([[1.0, 2.0, 3.0]])
  directions = jnp.array([[0.0, 0.0, 1.0]])
  radii = jnp.array([[0.01]])
  t_vals = jnp.array([[1.0, 2.0, 3.0]])
  means, covs = mip.cast_rays(t_vals, origins, directions, radii, "cylinder")
  assert means.shape == (1, 2, 3)
  np.testing.assert_allclose(np.asarray(means)[0, 0], [1, 2, 3 + 1.5],
                             atol=1e-6)


def test_ipe_diag_equals_full_for_diagonal_cov():
  rng = np.random.RandomState(2)
  mean = jnp.array(rng.randn(6, 3), jnp.float32)
  cov_diag = jnp.array(rng.rand(6, 3), jnp.float32) * 0.1
  cov_full = jax.vmap(jnp.diag)(cov_diag)
  e1 = mip.integrated_pos_enc(mean, cov_diag, 0, 4, diag=True)
  e2 = mip.integrated_pos_enc(mean, cov_full, 0, 4, diag=False)
  assert e1.shape == (6, 24)
  np.testing.assert_allclose(e1, e2, atol=1e-5)


def test_ipe_zero_cov_matches_pos_enc():
  mean = jnp.array([[0.3, -0.2, 0.1]])
  e = mip.integrated_pos_enc(mean, jnp.zeros_like(mean), 0, 2, diag=True)
  pe = mip.pos_enc(mean, 0, 2, append_identity=False)
  np.testing.assert_allclose(e, pe, atol=1e-6)


def test_ipe_double_angle_matches_exact():
  """integrated_pos_enc(method='double_angle') tracks the exact path to
  f32 tolerance over warped and metric coordinate ranges."""
  import jax
  key = jax.random.PRNGKey(0)
  for scale in (2.5, 50.0):
    mean = jax.random.normal(key, (256, 3)) * scale
    cov = jax.random.uniform(jax.random.PRNGKey(1), (256, 3)) * 0.3
    a = mip.integrated_pos_enc(mean, cov, 0, 16, diag=True)
    b = mip.integrated_pos_enc(mean, cov, 0, 16, diag=True,
                               method="double_angle")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
