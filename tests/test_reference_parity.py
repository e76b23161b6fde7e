"""Numeric parity vs the reference's own torch implementation.

Runs the actual reference code (torch CPU) on identical inputs and
compares against our JAX ops — pixel-level evidence that the re-derived
formulas match. Skipped when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/s-nerf"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_modules():
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  import torch  # noqa: F401
  import model.mip as ref_mip
  import model.math_ops as ref_math
  yield ref_mip, ref_math
  sys.path.remove(REF)


def test_conical_frustum_gaussian_parity(ref_modules):
  ref_mip, _ = ref_modules
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import mip

  rng = np.random.RandomState(0)
  d = rng.randn(16, 3).astype(np.float32)
  t0 = rng.uniform(1, 2, (16, 8)).astype(np.float32)
  t1 = t0 + rng.uniform(0.1, 0.5, (16, 8)).astype(np.float32)
  radius = np.full((16, 1), 0.01, np.float32)

  means_r, covs_r = ref_mip.conical_frustum_to_gaussian(
      torch.tensor(d), torch.tensor(t0), torch.tensor(t1),
      torch.tensor(radius), diag=True)
  means_j, covs_j = mip.conical_frustum_to_gaussian(
      jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1),
      jnp.asarray(radius), diag=True)
  np.testing.assert_allclose(np.asarray(means_j), means_r.numpy(),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(covs_j), covs_r.numpy(),
                             rtol=1e-3, atol=1e-6)


def test_integrated_pos_enc_parity(ref_modules):
  ref_mip, _ = ref_modules
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import mip

  rng = np.random.RandomState(1)
  means = rng.randn(4, 6, 3).astype(np.float32)
  covs = rng.uniform(0, 0.1, (4, 6, 3)).astype(np.float32)
  ref = ref_mip.integrated_pos_enc(
      (torch.tensor(means), torch.tensor(covs)), 0, 8, diag=True,
      device="cpu")
  ours = mip.integrated_pos_enc(jnp.asarray(means), jnp.asarray(covs),
                                0, 8, diag=True)
  np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                             atol=1e-5)


def test_inverse_cdf_sampler_parity(ref_modules):
  _, ref_math = ref_modules
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import sampling

  rng = np.random.RandomState(2)
  bins = np.sort(rng.rand(8, 17).astype(np.float32), axis=-1)
  weights = rng.rand(8, 16).astype(np.float32)
  # deterministic branch (randomized=False) — same u grid in both
  ref = ref_math.sorted_piecewise_constant_pdf(
      torch.tensor(bins), torch.tensor(weights), 17, randomized=False)
  ours = sampling.sorted_piecewise_constant_pdf(
      None, jnp.asarray(bins), jnp.asarray(weights), 17)
  np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                             atol=1e-5)


def test_volumetric_rendering_parity(ref_modules):
  ref_mip, _ = ref_modules
  import torch
  import jax.numpy as jnp
  from snerf_tpu.ops import render, coord

  rng = np.random.RandomState(3)
  N, S = 6, 12
  rgb = rng.rand(N, S, 3).astype(np.float32)
  density = rng.uniform(0, 3, (N, S)).astype(np.float32)
  s_vals = np.sort(rng.rand(N, S + 1).astype(np.float32), -1)
  dirs = rng.randn(N, 3).astype(np.float32)
  near = np.full((N, 1), 0.5, np.float32)
  far = np.full((N, 1), 8.0, np.float32)

  comp_r, dist_r, acc_r, w_r, _ = ref_mip.real_volumetric_rendering(
      torch.tensor(rgb), torch.tensor(density[..., None]),
      torch.tensor(s_vals), torch.tensor(dirs), None,
      white_bkgd=False, near=torch.tensor(near), far=torch.tensor(far),
      transform_idx=0)
  out = render.volumetric_rendering(
      jnp.asarray(rgb), jnp.asarray(density), jnp.asarray(s_vals),
      jnp.asarray(dirs), jnp.asarray(near), jnp.asarray(far),
      t_transform="log")
  np.testing.assert_allclose(np.asarray(out["rgb"]), comp_r.numpy(),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(out["acc"]), acc_r.numpy(),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(out["weights"]), w_r.numpy(),
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(out["distance"]), dist_r.numpy(),
                             rtol=1e-3, atol=1e-4)


def test_lie_exp_parity(ref_modules):
  del ref_modules
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  try:
    import torch
    from utils.lie_group_helper import Exp
    import jax.numpy as jnp
    from snerf_tpu.ops import lie
    rng = np.random.RandomState(4)
    r = rng.randn(3).astype(np.float32) * 0.3
    ref_R = Exp(torch.tensor(r)).numpy()
    ours = np.asarray(lie.exp_so3(jnp.asarray(r)))
    np.testing.assert_allclose(ours, ref_R, rtol=1e-4, atol=1e-5)
  finally:
    sys.path.remove(REF)
