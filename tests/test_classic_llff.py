import os

"""Classic-NeRF model, NDC rays, raw2outputs, LLFF loader contract."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.models.classic import (
    ClassicNerfConfig, ClassicNerfModel, ndc_rays, raw2outputs)
from tests.test_models_mipnerf import make_rays


def test_raw2outputs_opaque_surface():
  """A single opaque sample yields that sample's color and depth."""
  N, S = 4, 8
  raw = np.zeros((N, S, 4), np.float32)
  raw[:, 3, 3] = 1e8  # huge density at sample 3
  raw[:, :, :3] = 10.0  # sigmoid -> ~1
  z = np.tile(np.linspace(1, 5, S), (N, 1)).astype(np.float32)
  d = np.tile(np.array([0, 0, 1.0]), (N, 1)).astype(np.float32)
  rgb, disp, acc, w, depth = raw2outputs(jnp.asarray(raw), jnp.asarray(z),
                                         jnp.asarray(d))
  np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)
  np.testing.assert_allclose(np.asarray(depth), z[0, 3], atol=1e-5)
  np.testing.assert_allclose(np.asarray(w)[:, 3], 1.0, atol=1e-5)


def test_ndc_rays_bounds():
  H, W, f = 40, 60, 50.0
  rays_o = jnp.asarray(np.array([[0.0, 0.0, -1.0]]))
  rays_d = jnp.asarray(np.array([[0.0, 0.0, -1.0]]))
  o, d = ndc_rays(H, W, f, 1.0, rays_o, rays_d)
  # central ray maps to the NDC origin ray
  np.testing.assert_allclose(np.asarray(o[0]), [0, 0, -1], atol=1e-5)
  np.testing.assert_allclose(np.asarray(d[0]), [0, 0, 2], atol=1e-5)


def test_classic_model_forward_and_grad():
  cfg = ClassicNerfConfig(net_depth=4, net_width=32, n_samples=8,
                          n_importance=8, multires=4)
  model = ClassicNerfModel(config=cfg)
  rays = make_rays(4)
  variables = model.init(jax.random.PRNGKey(0), rays, rng=None)
  out = model.apply(variables, rays, rng=None)
  assert out["rgb"].shape == (4, 3)
  assert out["rgb0"].shape == (4, 3)
  assert np.isfinite(np.asarray(out["rgb"])).all()

  def loss(p):
    o = model.apply({"params": p}, rays, rng=None)
    return jnp.mean(o["rgb"] ** 2) + jnp.mean(o["rgb0"] ** 2)

  g = jax.grad(loss)(variables["params"])
  total = sum(float(jnp.abs(l).sum())
              for l in jax.tree_util.tree_leaves(g))
  assert np.isfinite(total) and total > 0


def test_llff_loader_contract(tmp_path):
  """Write a synthetic LLFF directory, read it back."""
  import imageio.v2 as imageio
  n, H, W = 6, 32, 48
  (tmp_path / "images").mkdir()
  rng = np.random.RandomState(0)
  for i in range(n):
    imageio.imwrite(tmp_path / "images" / f"{i:03d}.png",
                    rng.randint(0, 255, (H, W, 3), np.uint8))
  rows = []
  for i in range(n):
    pose = np.eye(4)[:3]
    pose[:, 3] = [0.1 * i, 0, 4.0]
    # writer convention [down, right, back]: invert the loader's flip
    m = np.concatenate([-pose[:, 1:2], pose[:, 0:1], pose[:, 2:4]], 1)
    hwf = np.array([[H], [W], [40.0]])
    rows.append(np.concatenate(
        [np.concatenate([m, hwf], 1).ravel(), [2.0, 12.0]]))
  np.save(tmp_path / "poses_bounds.npy", np.stack(rows))

  from snerf_tpu.data.llff import load_llff_scene
  scene = load_llff_scene(str(tmp_path), factor=1, llffhold=3)
  assert scene.images.shape == (6, 32, 48, 3)
  assert scene.poses.shape == (6, 3, 4)
  assert len(scene.i_test) == 2
  assert scene.render_poses.shape[1:] == (3, 4)
  assert scene.near > 0 and scene.far > scene.near



def test_frozen_alpha_nerf_rgb_variant():
  """NeRF_RGB: frozen geometry, trainable rgb (run_nerf_helpers 157-241)."""
  from snerf_tpu.models.classic import (
      ClassicNerfConfig, ClassicNerfModel, make_frozen_density_fn)
  cfg = ClassicNerfConfig(net_depth=2, net_width=16, n_samples=8,
                          n_importance=8, multires=4)
  model = ClassicNerfModel(config=cfg)
  rays = make_rays(4)
  v_alpha = model.init(jax.random.PRNGKey(0), rays, rng=None)
  v_rgb = model.init(jax.random.PRNGKey(1), rays, rng=None)
  frozen_fn = make_frozen_density_fn(model, v_alpha["params"])

  out = model.apply(v_rgb, rays, rng=None, frozen_density_fn=frozen_fn)
  ref_alpha = model.apply(v_alpha, rays, rng=None)
  # geometry (weights/depth) comes from the frozen model
  np.testing.assert_allclose(np.asarray(out["depth"]),
                             np.asarray(ref_alpha["depth"]), atol=1e-5)
  # rgb differs from the frozen model's (different rgb params)
  assert not np.allclose(np.asarray(out["rgb"]),
                         np.asarray(ref_alpha["rgb"]))
  # gradients reach ONLY the rgb side through this path
  def loss(p):
    o = model.apply({"params": p}, rays, rng=None,
                    frozen_density_fn=frozen_fn)
    return jnp.mean(o["rgb"] ** 2)
  g = jax.grad(loss)(v_rgb["params"])
  gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
  assert np.isfinite(gsum) and gsum > 0
