"""FULL-MODEL forward parity vs the reference: identical weights,
identical rays, deterministic mode — reference torch MipNerfModel (warp
path, the shipped configuration family) vs our flax MipNerfModel.

This is the pixel-parity validation SURVEY §7 hard-part 7 calls for.
Skipped when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/s-nerf"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

N_RAYS = 8
N_SAMPLES = 8
HIDDEN = 32
PROP_HIDDEN = 16


def _build_reference_model():
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  import torch
  from collections import namedtuple
  import model.models as ref_models
  torch.manual_seed(0)
  model = ref_models.MipNerfModel(
      n_samples=N_SAMPLES, no_warp_sample=False, ray_shape="cone",
      fn=1, radius=3.0, transform_idx=0, density_noise=0.0,
      hidden_layer=HIDDEN, rgb_layer=1, proposal_hidden_layer=PROP_HIDDEN,
      N_fine=N_SAMPLES, max_deg_point=8)
  model = model.eval()
  return model


def _torch_params_to_flax(model):
  """Map the reference state_dict onto our flax param tree."""
  sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

  def dense(prefix):
    return {"kernel": sd[prefix + ".weight"].T,
            "bias": sd[prefix + ".bias"]}

  mlp = {}
  for i in range(8):
    mlp[f"trunk_{i}"] = dense(f"mlp.layers.{i}.layers.0")
  mlp["density"] = dense("mlp.density_layer")
  mlp["bottleneck"] = dense("mlp.bottleneck_layer.layers.0")
  mlp["cond_0"] = dense("mlp.cond_layers.0.layers.0")
  mlp["rgb"] = dense("mlp.rgb_layer")

  proposal = {}
  for i in range(4):
    proposal[f"trunk_{i}"] = dense(f"proposal.layers.{i}.layers.0")
  proposal["density"] = dense("proposal.density_layer")
  return {"mlp": mlp, "proposal": proposal}


def test_full_forward_parity_warp_path():
  import torch
  import jax.numpy as jnp
  from collections import namedtuple

  ref_model = _build_reference_model()
  params = _torch_params_to_flax(ref_model)

  rng = np.random.RandomState(0)
  d = rng.randn(N_RAYS, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  origins = rng.randn(N_RAYS, 3).astype(np.float32) * 0.1
  radii = np.full((N_RAYS, 1), 0.005, np.float32)
  near = np.full((N_RAYS, 1), 0.5, np.float32)
  far = np.full((N_RAYS, 1), 20.0, np.float32)
  ones = np.ones((N_RAYS, 1), np.float32)
  viewc = np.zeros(3, np.float32)

  TorchRays = namedtuple(
      "Rays", ("origins", "directions", "viewdirs", "radii", "lossmult",
               "near", "far", "app"))
  t_rays = TorchRays(*[torch.tensor(x) for x in
                       (origins, d, d, radii, ones, near, far,
                        np.zeros((N_RAYS, 1), np.float32))])
  with torch.no_grad():
    ref_out = ref_model(t_rays, False, False, torch.tensor(viewc))
  # coarse rgb is None (density-only proposal level)
  _, ref_dist_c, ref_acc_c = [
      x.numpy() if x is not None else None for x in ref_out[0][:3]]
  ref_rgb_f, ref_dist_f, ref_acc_f = [x.numpy() for x in ref_out[1][:3]]

  from snerf_tpu.models.mipnerf import MipNerfConfig, MipNerfModel
  from snerf_tpu.ops.rays import Rays
  cfg = MipNerfConfig(
      num_samples=N_SAMPLES, num_fine=N_SAMPLES, no_warp_sample=False,
      ray_shape="cone", warp_fn=1, warp_radius=3.0, t_transform="log",
      density_noise=0.0, hidden_layer=HIDDEN, rgb_layer=1,
      proposal_hidden_layer=PROP_HIDDEN, max_deg_point=8)
  model = MipNerfModel(config=cfg)
  rays = Rays(origins=jnp.asarray(origins), directions=jnp.asarray(d),
              viewdirs=jnp.asarray(d), radii=jnp.asarray(radii),
              lossmult=jnp.asarray(ones), near=jnp.asarray(near),
              far=jnp.asarray(far),
              app=jnp.zeros((N_RAYS, 1), jnp.int32))
  import jax
  # this environment emulates TPU numerics on CPU (bf16 default matmuls);
  # force f32 so the comparison isolates formula parity from precision
  with jax.default_matmul_precision("float32"):
    ours = model.apply({"params": params}, rays, rng=None,
                       white_bkgd=False, viewc=jnp.asarray(viewc))

  # deterministic coarse level: same samples, same proposal density
  np.testing.assert_allclose(np.asarray(ours[0]["distance"]), ref_dist_c,
                             rtol=1e-3, atol=1e-4)
  np.testing.assert_allclose(np.asarray(ours[0]["acc"]), ref_acc_c,
                             rtol=1e-3, atol=1e-4)
  # fine level: pixel-exact parity end-to-end (measured max abs err
  # ~1e-7 on rgb/acc, ~1e-6 on distance with f32 matmuls)
  np.testing.assert_allclose(np.asarray(ours[1]["rgb"]), ref_rgb_f,
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(ours[1]["acc"]), ref_acc_f,
                             rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(np.asarray(ours[1]["distance"]), ref_dist_f,
                             rtol=1e-4, atol=1e-4)


def test_full_forward_parity_fn1_path():
  """Same test on the fn1 (view-centered sqrt) warp with viewc=0.

  Exact parity is impossible on this path: the reference's hand-rolled
  Jacobi_f (mip.py:323-341) is not the Jacobian of fn1 — for
  f(x) = x / sqrt(|x| far) the exact J = far^-1/2 (r^-1/2 I -
  (1/2) r^-5/2 x x^T), while Jacobi_f computes far^-1/2 (r^-1/2 I -
  r^-3/2 x x^T) (wrong factor and r power on the radial term), and for
  viewc != 0 it is additionally evaluated at uncentered means. Our
  jacfwd-based propagation differentiates the actual warp. The shipped
  configs use fn=1 (the fn2 contraction), where we match pixel-exactly.
  This test asserts close agreement (the covariance only modulates the
  IPE attenuation) rather than exactness.
  """
  import torch
  import jax
  import jax.numpy as jnp
  from collections import namedtuple
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  try:
    import model.models as ref_models
    torch.manual_seed(0)
    ref_model = ref_models.MipNerfModel(
        n_samples=N_SAMPLES, no_warp_sample=False, ray_shape="cone",
        fn=0, radius=3.0, transform_idx=0, density_noise=0.0,
        hidden_layer=HIDDEN, rgb_layer=1,
        proposal_hidden_layer=PROP_HIDDEN,
        N_fine=N_SAMPLES, max_deg_point=8).eval()
    params = _torch_params_to_flax(ref_model)

    rng = np.random.RandomState(1)
    d = rng.randn(N_RAYS, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    origins = rng.randn(N_RAYS, 3).astype(np.float32) * 0.1
    radii = np.full((N_RAYS, 1), 0.005, np.float32)
    near = np.full((N_RAYS, 1), 0.5, np.float32)
    far = np.full((N_RAYS, 1), 20.0, np.float32)
    ones = np.ones((N_RAYS, 1), np.float32)

    TorchRays = namedtuple(
        "Rays", ("origins", "directions", "viewdirs", "radii",
                 "lossmult", "near", "far", "app"))
    t_rays = TorchRays(*[torch.tensor(x) for x in
                         (origins, d, d, radii, ones, near, far,
                          np.zeros((N_RAYS, 1), np.float32))])
    with torch.no_grad():
      ref_out = ref_model(t_rays, False, False,
                          torch.zeros(3))
    ref_rgb_f = ref_out[1][0].numpy()

    from snerf_tpu.models.mipnerf import MipNerfConfig, MipNerfModel
    from snerf_tpu.ops.rays import Rays
    cfg = MipNerfConfig(
        num_samples=N_SAMPLES, num_fine=N_SAMPLES, no_warp_sample=False,
        ray_shape="cone", warp_fn=0, t_transform="log",
        density_noise=0.0, hidden_layer=HIDDEN, rgb_layer=1,
        proposal_hidden_layer=PROP_HIDDEN, max_deg_point=8)
    model = MipNerfModel(config=cfg)
    rays = Rays(origins=jnp.asarray(origins), directions=jnp.asarray(d),
                viewdirs=jnp.asarray(d), radii=jnp.asarray(radii),
                lossmult=jnp.asarray(ones), near=jnp.asarray(near),
                far=jnp.asarray(far),
                app=jnp.zeros((N_RAYS, 1), jnp.int32))
    with jax.default_matmul_precision("float32"):
      ours = model.apply({"params": params}, rays, rng=None,
                         white_bkgd=False, viewc=jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(ours[1]["rgb"]), ref_rgb_f,
                               rtol=5e-2, atol=2e-2)
  finally:
    sys.path.remove(REF)
