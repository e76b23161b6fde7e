"""L2 MipNerfModel: shapes, ranges, determinism, warp path, heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snerf_tpu.models.mipnerf import MipNerfConfig, MipNerfModel, init_model
from snerf_tpu.ops.rays import Rays


def make_rays(n=8, key=0):
  k = jax.random.PRNGKey(key)
  d = jax.random.normal(k, (n, 3))
  d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
  return Rays(
      origins=jnp.zeros((n, 3)),
      directions=d,
      viewdirs=d,
      radii=jnp.full((n, 1), 0.001),
      lossmult=jnp.ones((n, 1)),
      near=jnp.full((n, 1), 0.5),
      far=jnp.full((n, 1), 6.0),
      app=jnp.zeros((n, 1), jnp.int32))


SMALL = dict(num_samples=16, num_fine=16, hidden_layer=32,
             proposal_hidden_layer=16)


def test_forward_shapes_and_ranges():
  cfg = MipNerfConfig(**SMALL)
  model, variables = init_model(jax.random.PRNGKey(0), cfg)
  rays = make_rays(8)
  ret = model.apply(variables, rays, rng=None)
  assert len(ret) == 2
  coarse, fine = ret
  assert coarse["rgb"] is None
  assert coarse["weights"].shape == (8, 16)
  assert fine["rgb"].shape == (8, 3)
  assert fine["distance"].shape == (8,)
  assert fine["acc"].shape == (8,)
  # rgb within sigmoid-padded range
  pad = cfg.rgb_padding
  assert jnp.all(fine["rgb"] >= -pad - 1e-6)
  assert jnp.all(fine["rgb"] <= 1 + pad + 1e-6)
  # weights are a sub-probability measure; distance within [near, far]
  assert jnp.all(fine["weights"].sum(-1) <= 1 + 1e-5)
  assert jnp.all(fine["distance"] >= 0.5 - 1e-5)
  assert jnp.all(fine["distance"] <= 6.0 + 1e-4)


def test_deterministic_eval_reproducible():
  cfg = MipNerfConfig(**SMALL)
  model, variables = init_model(jax.random.PRNGKey(0), cfg)
  rays = make_rays(4)
  a = model.apply(variables, rays, rng=None)
  b = model.apply(variables, rays, rng=None)
  np.testing.assert_allclose(a[1]["rgb"], b[1]["rgb"], rtol=0, atol=0)


def test_randomized_differs_from_eval():
  cfg = MipNerfConfig(**SMALL)
  model, variables = init_model(jax.random.PRNGKey(0), cfg)
  rays = make_rays(4)
  a = model.apply(variables, rays, rng=None)
  b = model.apply(variables, rays, rng=jax.random.PRNGKey(1))
  assert not np.allclose(np.asarray(a[1]["rgb"]), np.asarray(b[1]["rgb"]))


def test_warp_path_forward():
  cfg = MipNerfConfig(no_warp_sample=False, warp_fn=2, t_transform="log",
                      **SMALL)
  model, variables = init_model(jax.random.PRNGKey(0), cfg)
  rays = make_rays(4)
  ret = model.apply(variables, rays, rng=None, viewc=jnp.zeros((3,)))
  assert ret[1]["rgb"].shape == (4, 3)
  assert np.all(np.isfinite(np.asarray(ret[1]["rgb"])))
  assert np.all(np.isfinite(np.asarray(ret[1]["distance"])))


def test_semantic_and_appearance_heads():
  cfg = MipNerfConfig(semantic=True, semantic_class_num=5,
                      encode_appearance=True, **SMALL)
  model, variables = init_model(jax.random.PRNGKey(0), cfg)
  rays = make_rays(4)
  ret = model.apply(variables, rays, rng=None)
  assert ret[1]["semantic"].shape == (4, 5)
  assert ret[0]["semantic"] is None


def test_jit_and_grad():
  cfg = MipNerfConfig(**SMALL)
  model, variables = init_model(jax.random.PRNGKey(0), cfg)
  rays = make_rays(4)
  target = jnp.zeros((4, 3))

  @jax.jit
  def loss_fn(params):
    ret = model.apply({"params": params}, rays, rng=None)
    return jnp.mean((ret[1]["rgb"] - target) ** 2)

  g = jax.grad(loss_fn)(variables["params"])
  leaves = jax.tree_util.tree_leaves(g)
  assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
  # fine MLP gets gradient
  gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
  assert gnorm > 0


def test_warp_path_training_converges():
  """Gradients flow through the unbounded warp (track_gaussian jacfwd)."""
  import optax
  cfg = MipNerfConfig(no_warp_sample=False, warp_fn=2, t_transform="log",
                      num_samples=12, num_fine=12, hidden_layer=32,
                      proposal_hidden_layer=16, density_noise=0.0)
  model, variables = init_model(jax.random.PRNGKey(0), cfg)
  rays = make_rays(32)
  target = jnp.tile(jnp.array([[0.8, 0.3, 0.1]]), (32, 1))
  params = variables["params"]
  tx = optax.adam(3e-3)
  opt = tx.init(params)

  @jax.jit
  def step(params, opt, key):
    def loss_fn(p):
      ret = model.apply({"params": p}, rays, rng=key,
                        viewc=jnp.zeros((3,)))
      return jnp.mean((ret[1]["rgb"] - target) ** 2)
    loss, g = jax.value_and_grad(loss_fn)(params)
    u, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, u), opt, loss

  key = jax.random.PRNGKey(1)
  losses = []
  for _ in range(25):
    key, k = jax.random.split(key)
    params, opt, loss = step(params, opt, k)
    losses.append(float(loss))
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
