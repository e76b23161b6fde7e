"""Tests for stratified + inverse-CDF sampling and step functions."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops import sampling, stepfun


def test_stratified_deterministic_is_linspace():
  s = sampling.stratified_sample(None, (4,), 8)
  assert s.shape == (4, 9)
  np.testing.assert_allclose(np.asarray(s)[0], np.linspace(0, 1, 9),
                             atol=1e-7)


def test_stratified_randomized_sorted_in_bins():
  key = jax.random.PRNGKey(0)
  s = sampling.stratified_sample(key, (16,), 32)
  s = np.asarray(s)
  assert np.all(np.diff(s, axis=-1) > -1e-7)
  assert s.min() >= 0 and s.max() <= 1


def test_inverse_cdf_uniform_weights_identity():
  # Uniform weights over [0,1] bins -> deterministic samples ~ linspace.
  bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
  weights = jnp.ones((2, 8))
  s = sampling.sorted_piecewise_constant_pdf(None, bins, weights, 16)
  np.testing.assert_allclose(np.asarray(s)[0],
                             np.linspace(0, 1 - 1e-7, 16), atol=1e-3)


def test_inverse_cdf_concentrates_on_heavy_bin():
  # All weight in bin [0.5, 0.625): every sample must fall there.
  bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  weights = jnp.zeros((1, 8)).at[0, 4].set(1.0)
  s = sampling.sorted_piecewise_constant_pdf(jax.random.PRNGKey(1), bins,
                                             weights, 64)
  s = np.asarray(s)
  assert s.min() >= 0.5 - 1e-5 and s.max() <= 0.625 + 1e-5


def test_inverse_cdf_zero_weights_no_nan():
  bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  s = sampling.sorted_piecewise_constant_pdf(None, bins, jnp.zeros((1, 8)),
                                             8)
  assert np.all(np.isfinite(np.asarray(s)))


def test_blur_weights_padding():
  w = jnp.array([[0.0, 1.0, 0.0, 0.0]])
  out = np.asarray(sampling.blur_weights(w, 0.01))
  # Max-blur spreads mass to neighbors of the peak.
  assert out[0, 0] > 0.01 and out[0, 2] > 0.01
  np.testing.assert_allclose(out[0, 3], 0.01, atol=1e-6)


def test_resample_from_weights_sorted():
  key = jax.random.PRNGKey(2)
  s_vals = jnp.broadcast_to(jnp.linspace(0, 1, 17), (4, 17))
  weights = jax.random.uniform(key, (4, 16))
  new_s = sampling.resample_from_weights(jax.random.PRNGKey(3), s_vals,
                                         weights, 16)
  assert new_s.shape == (4, 17)
  assert np.all(np.diff(np.asarray(new_s), axis=-1) >= -1e-6)


def test_sample_pdf_uniform():
  bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  w = jnp.ones((1, 8))
  s = sampling.sample_pdf(None, bins, w, 16, det=True)
  np.testing.assert_allclose(np.asarray(s)[0], np.linspace(0, 1, 16),
                             atol=1e-2)


# ---------------- stepfun (zip-nerf) ----------------


def test_integrate_weights_endpoints():
  w = jnp.array([[0.25, 0.25, 0.25, 0.25]])
  cw = np.asarray(stepfun.integrate_weights(w))
  assert cw[0, 0] == 0.0 and cw[0, -1] == 1.0
  np.testing.assert_allclose(cw[0], [0, 0.25, 0.5, 0.75, 1.0], atol=1e-6)


def test_invert_cdf_uniform():
  t = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 5), (1, 5))
  logits = jnp.zeros((1, 4))
  u = jnp.array([[0.0, 0.5, 0.999999]])
  out = np.asarray(stepfun.invert_cdf(u, t, logits))
  np.testing.assert_allclose(out[0], [2.0, 3.0, 4.0], atol=1e-3)


def test_sample_intervals_deterministic():
  t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
  logits = jnp.zeros((2, 8))
  ts = stepfun.sample_intervals(None, t, logits, 8, domain=(0.0, 1.0))
  assert ts.shape == (2, 9)
  ts = np.asarray(ts)
  assert np.all(np.diff(ts, axis=-1) > 0)
  assert ts.min() >= 0 and ts.max() <= 1


def test_lossfun_distortion_point_mass_small():
  # A single concentrated interval has tiny distortion; spread mass is larger.
  t = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  w_spread = jnp.ones((1, 8)) / 8
  w_point = jnp.zeros((1, 8)).at[0, 4].set(1.0)
  d_spread = float(stepfun.lossfun_distortion(t, w_spread)[0])
  d_point = float(stepfun.lossfun_distortion(t, w_point)[0])
  assert d_point < d_spread


def test_lossfun_outer_envelope_zero_when_bounded():
  t = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  w = jnp.ones((1, 8)) / 8
  # Envelope = same histogram: loss must be ~0.
  loss = stepfun.lossfun_outer(t, w, t, w)
  np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)


def test_lossfun_outer_positive_when_exceeding():
  t = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  w = jnp.zeros((1, 8)).at[0, 4].set(1.0)
  w_env = jnp.ones((1, 8)) / 8
  loss = np.asarray(stepfun.lossfun_outer(t, w, t, w_env))
  assert loss[0, 4] > 0.1


def test_weighted_percentile_median():
  t = jnp.broadcast_to(jnp.linspace(0.0, 10.0, 11), (1, 11))
  w = jnp.ones((1, 10)) / 10
  pct = np.asarray(stepfun.weighted_percentile(t, w, [50]))
  np.testing.assert_allclose(pct[0, 0], 5.0, atol=0.1)


def test_max_dilate_weights_expands_support():
  t = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  w = jnp.zeros((1, 8)).at[0, 4].set(1.0)
  t_d, w_d = stepfun.max_dilate_weights(t, w, 0.1, domain=(0.0, 1.0))
  # Support of the dilated weights is wider than one bin (0.125 + 2*0.1).
  support = float(jnp.sum((np.asarray(w_d) > 1e-6) *
                          np.diff(np.asarray(t_d), axis=-1)))
  assert support > 0.125 + 0.15


def test_blur_stepfun_preserves_mass():
  x = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  y = jnp.array([[0.0, 0.0, 1.0, 2.0, 1.0, 0.0, 0.0, 0.0]])
  xr, yr = stepfun.blur_stepfun(x, y, 0.05)
  # Integral of the blurred piecewise-linear fn == integral of the input.
  mass_in = float(jnp.sum(y * jnp.diff(x, axis=-1)))
  yr_mid = 0.5 * (yr[..., 1:] + yr[..., :-1])
  mass_out = float(jnp.sum(yr_mid * jnp.diff(xr, axis=-1)))
  np.testing.assert_allclose(mass_out, mass_in, rtol=1e-3)


def test_resample_conserves_sum():
  tp = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
  vp = jnp.array([[1.0, 2.0, 3.0, 4.0, 4.0, 3.0, 2.0, 1.0]])
  t = jnp.broadcast_to(jnp.linspace(0, 1, 5), (1, 5))
  v = stepfun.resample(t, tp, vp)
  np.testing.assert_allclose(float(jnp.sum(v)), float(jnp.sum(vp)),
                             rtol=1e-5)
