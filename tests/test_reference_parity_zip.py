"""Numeric parity vs the reference's zip-nerf stepfun toolbox (pure torch
in s-nerfpp/zipnerf/internal/stepfun.py) on identical inputs."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/s-nerfpp/zipnerf"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_stepfun():
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  from internal import stepfun as ref_sf
  yield ref_sf
  sys.path.remove(REF)


def _hist(rng, n, bins):
  t = np.sort(rng.rand(n, bins + 1).astype(np.float32), -1)
  w = rng.rand(n, bins).astype(np.float32)
  return t, w


def test_lossfun_outer_parity(ref_stepfun):
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import stepfun

  rng = np.random.RandomState(0)
  t, w = _hist(rng, 6, 8)
  t_env, w_env = _hist(rng, 6, 12)
  ref = ref_stepfun.lossfun_outer(
      torch.tensor(t), torch.tensor(w), torch.tensor(t_env),
      torch.tensor(w_env)).numpy()
  ours = stepfun.lossfun_outer(jnp.asarray(t), jnp.asarray(w),
                               jnp.asarray(t_env), jnp.asarray(w_env))
  np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_max_dilate_weights_parity(ref_stepfun):
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import stepfun

  rng = np.random.RandomState(1)
  t, w = _hist(rng, 4, 8)
  ref_t, ref_w = ref_stepfun.max_dilate_weights(
      torch.tensor(t), torch.tensor(w), 0.02, domain=(0.0, 1.0),
      renormalize=True)
  our_t, our_w = stepfun.max_dilate_weights(
      jnp.asarray(t), jnp.asarray(w), 0.02, domain=(0.0, 1.0),
      renormalize=True)
  np.testing.assert_allclose(np.asarray(our_t), ref_t.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(our_w), ref_w.numpy(),
                             rtol=1e-4, atol=1e-5)


def test_sample_intervals_parity(ref_stepfun):
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import stepfun

  rng = np.random.RandomState(2)
  t, w = _hist(rng, 4, 8)
  logits = np.log(w + 0.01).astype(np.float32)
  ref = ref_stepfun.sample_intervals(
      None, torch.tensor(t), torch.tensor(logits), 10,
      single_jitter=True, domain=(0.0, 1.0)).numpy()
  ours = stepfun.sample_intervals(
      None, jnp.asarray(t), jnp.asarray(logits), 10,
      single_jitter=True, domain=(0.0, 1.0))
  np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_lossfun_distortion_parity(ref_stepfun):
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import stepfun

  rng = np.random.RandomState(3)
  t, w = _hist(rng, 5, 8)
  ref = ref_stepfun.lossfun_distortion(torch.tensor(t),
                                       torch.tensor(w)).numpy()
  ours = stepfun.lossfun_distortion(jnp.asarray(t), jnp.asarray(w))
  np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_blur_stepfun_parity(ref_stepfun):
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import stepfun

  rng = np.random.RandomState(4)
  t, w = _hist(rng, 3, 6)
  ref_x, ref_y = ref_stepfun.blur_stepfun(torch.tensor(t),
                                          torch.tensor(w), 0.03)
  our_x, our_y = stepfun.blur_stepfun(jnp.asarray(t), jnp.asarray(w),
                                      0.03)
  np.testing.assert_allclose(np.asarray(our_x), ref_x.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(our_y), ref_y.numpy(),
                             rtol=1e-4, atol=1e-5)
