"""Unit tests for L1 math primitives against closed forms."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops import math as smath


def test_safe_sin_matches_sin_small():
  x = jnp.linspace(-10, 10, 101)
  np.testing.assert_allclose(smath.safe_sin(x), np.sin(np.asarray(x)),
                             atol=1e-6)


def test_safe_sin_finite_large():
  x = jnp.array([1e8, -1e8, 1e20])
  assert np.all(np.isfinite(np.asarray(smath.safe_sin(x))))


def test_mse_psnr_roundtrip():
  mse = jnp.array([1e-4, 1e-2, 0.5])
  np.testing.assert_allclose(smath.psnr_to_mse(smath.mse_to_psnr(mse)), mse,
                             rtol=1e-4)


def test_mse_to_psnr_value():
  # PSNR of mse=0.01 is 20 dB.
  np.testing.assert_allclose(smath.mse_to_psnr(jnp.array(0.01)), 20.0,
                             rtol=1e-5)


def test_log_lerp_endpoints():
  np.testing.assert_allclose(smath.log_lerp(jnp.array(0.0), 1e-3, 1e-5), 1e-3,
                             rtol=1e-5)
  np.testing.assert_allclose(smath.log_lerp(jnp.array(1.0), 1e-3, 1e-5), 1e-5,
                             rtol=1e-5)
  # Geometric midpoint at t=0.5.
  np.testing.assert_allclose(smath.log_lerp(jnp.array(0.5), 1e-3, 1e-5), 1e-4,
                             rtol=1e-5)


def test_learning_rate_decay_warmup():
  # At step 0 with delay_mult m, lr = m * lr_init.
  lr0 = smath.learning_rate_decay(jnp.array(0.0), 5e-4, 5e-6, 200_000,
                                  lr_delay_steps=2500, lr_delay_mult=0.01)
  np.testing.assert_allclose(lr0, 0.01 * 5e-4, rtol=1e-5)
  # Past the delay window, matches pure log-lerp.
  lr_mid = smath.learning_rate_decay(jnp.array(100_000.0), 5e-4, 5e-6,
                                     200_000, lr_delay_steps=2500,
                                     lr_delay_mult=0.01)
  np.testing.assert_allclose(lr_mid, np.sqrt(5e-4 * 5e-6), rtol=1e-5)


def test_searchsorted_brackets():
  a = jnp.array([[0.0, 1.0, 2.0, 3.0]])
  v = jnp.array([[0.5, 2.5, -1.0, 5.0]])
  lo, hi = smath.searchsorted(a, v)
  np.testing.assert_array_equal(np.asarray(lo)[0], [0, 2, 0, 3])
  np.testing.assert_array_equal(np.asarray(hi)[0], [1, 3, 0, 3])


def test_interp_matches_numpy():
  rng = np.random.RandomState(0)
  xp = np.sort(rng.rand(4, 8), axis=-1).astype(np.float32)
  fp = rng.rand(4, 8).astype(np.float32)
  x = rng.rand(4, 16).astype(np.float32)
  got = np.asarray(smath.interp(jnp.array(x), jnp.array(xp), jnp.array(fp)))
  want = np.stack([np.interp(x[i], xp[i], fp[i]) for i in range(4)])
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_clip_gradients_scrubs_nans():
  grads = {"a": jnp.array([jnp.nan, 1.0, -jnp.inf])}
  out = smath.clip_gradients(grads, max_val=0.5)
  np.testing.assert_allclose(np.asarray(out["a"]), [0.0, 0.5, 0.0])


def test_clip_gradients_norm():
  grads = {"a": jnp.array([3.0, 4.0])}
  out = smath.clip_gradients(grads, max_norm=1.0)
  np.testing.assert_allclose(np.linalg.norm(np.asarray(out["a"])), 1.0,
                             rtol=1e-5)
