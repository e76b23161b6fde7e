"""zip-nerf stack: hash grid semantics, model forward, losses, training."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.models.hashgrid import (
    HashEncoding, GridSpec, hash_decay_loss, hash_encode, make_grid_spec,
    total_variation_loss)
from snerf_tpu.models.zipnerf import ZipNerfConfig, init_zipnerf

TINY = dict(num_prop_samples=(8, 8), num_nerf_samples=8,
            prop_grid_resolutions=(64, 128), nerf_grid_resolution=256,
            grid_num_levels=4, grid_log2_hashmap_size=12,
            bottleneck_width=32, net_width_viewdirs=16, sample_n=3)


def test_grid_spec_layout():
  spec = make_grid_spec(num_levels=4, level_dim=2, base_resolution=16,
                        desired_resolution=128, log2_hashmap_size=12)
  assert spec.num_levels == 4
  # geometric progression 16 -> 128
  assert spec.resolutions[0] == 16
  assert spec.resolutions[-1] == 128
  # every level size divisible by 8, capped at 2^12
  for s in spec.sizes:
    assert s % 8 == 0 and s <= 2 ** 12
  # coarse level is dense (17^3 < 4096? no -> hashed); tiny check: offsets
  assert spec.offsets[-1] == sum(spec.sizes)


def test_hash_encode_interpolates_continuously():
  spec = make_grid_spec(num_levels=2, level_dim=2, base_resolution=4,
                        desired_resolution=8, log2_hashmap_size=10)
  key = jax.random.PRNGKey(0)
  table = jax.random.normal(key, (spec.total_rows, 2))
  x0 = jnp.array([[0.3, 0.4, 0.5]])
  f0 = hash_encode(x0, table, spec)
  f1 = hash_encode(x0 + 1e-4, table, spec)
  # continuity: tiny input change -> tiny feature change
  assert float(jnp.abs(f1 - f0).max()) < 1e-2
  assert f0.shape == (1, 2, 2)


def test_hash_encode_oob_zero():
  spec = make_grid_spec(num_levels=2, level_dim=2, base_resolution=4,
                        desired_resolution=8, log2_hashmap_size=10)
  table = jnp.ones((spec.total_rows, 2))
  f = hash_encode(jnp.array([[1.5, 0.5, 0.5]]), table, spec)
  np.testing.assert_allclose(np.asarray(f), 0.0)


def test_hash_encode_gradient_reaches_table():
  spec = make_grid_spec(num_levels=2, level_dim=2, base_resolution=4,
                        desired_resolution=8, log2_hashmap_size=10)
  table = jnp.zeros((spec.total_rows, 2))
  x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

  def loss(t):
    return jnp.sum(hash_encode(x, t, spec) ** 2 +
                   hash_encode(x, t, spec))

  g = jax.grad(loss)(table)
  assert np.isfinite(np.asarray(g)).all()
  assert float(jnp.abs(g).sum()) > 0


def test_hash_decay_and_tv_losses():
  spec = make_grid_spec(num_levels=3, level_dim=2, base_resolution=4,
                        desired_resolution=16, log2_hashmap_size=10)
  table = jnp.ones((spec.total_rows, 2))
  hd = hash_decay_loss(table, spec, weight=1.0)
  # each level mean of sum over dim = 2 -> total 6
  assert float(hd) == 6.0
  tv = total_variation_loss(table, spec, jax.random.PRNGKey(0),
                            n_samples=64, weight=1.0)
  assert float(tv) < 1e-10  # constant table has zero TV


def test_zipnerf_forward_shapes():
  cfg = ZipNerfConfig(**TINY)
  model, variables = init_zipnerf(jax.random.PRNGKey(0), cfg)
  from tests.test_models_mipnerf import make_rays
  rays = make_rays(4)
  renderings, history = model.apply(variables, rays, rng=None)
  assert len(renderings) == 3
  final = renderings[-1]
  assert final["rgb"].shape == (4, 3)
  assert final["depth"].shape == (4,)
  assert np.isfinite(np.asarray(final["rgb"])).all()
  # opaque background -> acc == 1
  np.testing.assert_allclose(np.asarray(final["acc"]), 1.0, atol=1e-4)
  assert history[0]["sdist"].shape == (4, 9)
  assert history[-1]["weights"].shape == (4, 8)


def test_zipnerf_semantic_head():
  cfg = ZipNerfConfig(use_semantic=True, class_num=5, **TINY)
  model, variables = init_zipnerf(jax.random.PRNGKey(0), cfg)
  from tests.test_models_mipnerf import make_rays
  rays = make_rays(2)
  renderings, _ = model.apply(variables, rays, rng=None)
  sem = renderings[-1]["semantic"]
  assert sem.shape == (2, 5)
  # softmax over classes composited with sub-probability weights
  assert np.all(np.asarray(sem) >= 0)
  assert np.all(np.asarray(sem).sum(-1) <= 1 + 1e-4)


def test_zipnerf_fits_simple_target():
  """A few Adam steps on constant-color rays should reduce loss."""
  import optax
  cfg = ZipNerfConfig(**TINY)
  model, variables = init_zipnerf(jax.random.PRNGKey(0), cfg)
  from tests.test_models_mipnerf import make_rays
  rays = make_rays(64)
  target = jnp.tile(jnp.array([[0.2, 0.6, 0.8]]), (64, 1))
  params = variables["params"]
  tx = optax.adam(5e-3)
  opt = tx.init(params)

  @jax.jit
  def step(params, opt, key):
    def loss_fn(p):
      rend, _ = model.apply({"params": p}, rays, rng=key)
      return jnp.mean((rend[-1]["rgb"] - target) ** 2)
    loss, g = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, updates), opt, loss

  losses = []
  key = jax.random.PRNGKey(2)
  for i in range(30):
    key, k = jax.random.split(key)
    params, opt, loss = step(params, opt, k)
    losses.append(float(loss))
  assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_fused_mlp_interpret_matches_xla():
  """Pallas fused-MLP kernel vs plain XLA (interpret mode on CPU)."""
  from snerf_tpu.ops.pallas.fused_mlp import fused_mlp, pad_width
  key = jax.random.PRNGKey(0)
  N, D, L = 384, 256, 4
  x = jax.random.normal(key, (N, D), jnp.float32) * 0.5
  Ws = jnp.stack([
      jax.random.normal(jax.random.fold_in(key, i), (D, D), jnp.float32)
      * (1.0 / np.sqrt(D)) for i in range(L)])
  bs = jnp.zeros((L, 1, D), jnp.float32)

  def ref(x):
    h = x
    for i in range(L):
      h = jnp.maximum(h @ Ws[i] + bs[i], 0.0)
    return h

  out = fused_mlp(x, Ws, bs, 128, True, True)  # interpret=True
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref(x)),
                             rtol=1e-4, atol=1e-4)
  # gradient parity
  g1 = jax.grad(lambda w: jnp.sum(
      fused_mlp(x, w, bs, 128, True, True) ** 2))(Ws)
  g2 = jax.grad(lambda w: jnp.sum(_ref_mlp(x, w, bs) ** 2))(Ws)
  np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                             atol=1e-3)
  # pad_width alignment helper
  assert pad_width(jnp.ones((3, 96))).shape == (3, 128)


def _ref_mlp(x, Ws, bs):
  h = x
  for i in range(Ws.shape[0]):
    h = jnp.maximum(h @ Ws[i] + bs[i], 0.0)
  return h


def test_hash_encode_input_gradient_matches_fd():
  """dL/dx through the trilinear weights (the pose-refinement path,
  reference grid.py:49-54 inputs.requires_grad): analytic jax.grad vs
  central finite differences. The gather indices are non-differentiable
  (as in the reference); the weights carry the input gradient."""
  import jax
  spec = make_grid_spec(num_levels=3, level_dim=2, base_resolution=4,
                        desired_resolution=16, log2_hashmap_size=8)
  key = jax.random.PRNGKey(3)
  table = jax.random.normal(key, (spec.total_rows, 2)) * 0.3
  x0 = jnp.array([[0.331, 0.562, 0.714]])

  def f(x):
    return jnp.sum(hash_encode(x, table, spec) ** 2)

  g = jax.grad(f)(x0)
  assert np.isfinite(np.asarray(g)).all()
  eps = 1e-4
  for d in range(3):
    e = jnp.zeros((1, 3)).at[0, d].set(eps)
    fd = (f(x0 + e) - f(x0 - e)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g[0, d]), np.asarray(fd),
                               rtol=2e-2, atol=1e-4)


def test_scene_scale_prescales_contraction():
  """scene_scale s on world means must equal scale-1.0 on pre-scaled
  means (the transform_poses_pca-normalized world the reference always
  feeds the model, internal/camera_utils.py:162-203)."""
  import dataclasses
  cfg1 = ZipNerfConfig(**TINY, encoder_type="ipe", scene_scale=1.0)
  model1, variables = init_zipnerf(jax.random.PRNGKey(0), cfg1)
  cfg2 = dataclasses.replace(cfg1, scene_scale=0.25)
  model2, _ = init_zipnerf(jax.random.PRNGKey(0), cfg2)

  means = jnp.asarray(np.random.RandomState(0).randn(5, 3, 3) * 3.0)
  stds = jnp.abs(jnp.asarray(np.random.RandomState(1).rand(5, 3))) * 0.1

  def dens(model, vars_, m, s):
    return model.apply(vars_, m, s, method=lambda mdl, m_, s_:
                       mdl.nerf_mlp.predict_density(m_, s_)[0])

  d_scaled = dens(model2, variables, means, stds)
  d_pre = dens(model1, variables, means * 0.25, stds * 0.25)
  np.testing.assert_allclose(np.asarray(d_scaled), np.asarray(d_pre),
                             rtol=1e-5, atol=1e-5)
