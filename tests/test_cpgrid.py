"""Integrated multiresolution CP encoder (models/cpgrid.py) + its
trainer plumbing (encoder lr groups, chip-aware hash warning).

Capability parity target: reference gridencoder
(s-nerfpp/zipnerf/gridencoder/src/gridencoder.cu:50-160) — a learned
spatial feature field with anti-aliased (multisample/erf) queries —
rebuilt gather/scatter-free for v5e (PERF.md primitive survey).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snerf_tpu.models.cpgrid import (CPEncoding, cosine_window,
                                     level_resolutions)


def _enc(num_levels=2, level_dim=4, base=16, maxr=64, **kw):
  return CPEncoding(num_levels=num_levels, level_dim=level_dim,
                    base_resolution=base, max_resolution=maxr, **kw)


def test_level_resolutions_geometric():
  rs = level_resolutions(4, 16, 128)
  assert rs[0] == 16 and rs[-1] == 128
  assert all(rs[i] < rs[i + 1] for i in range(3))
  assert level_resolutions(1, 16, 128) == [128]


def test_cosine_window():
  w = np.asarray(cosine_window(jnp.asarray(1.5), 3))
  assert w[0] == pytest.approx(1.0)          # fully open
  assert 0.0 < w[1] < 1.0                     # half open
  assert w[2] == pytest.approx(0.0)          # closed


def test_shapes_and_finite():
  enc = _enc(num_levels=3, level_dim=5)
  x = jax.random.uniform(jax.random.PRNGKey(0), (7, 4, 2, 3))
  s = jnp.full((7, 4, 2), 0.01)
  v = enc.init(jax.random.PRNGKey(1), x, s)
  out = enc.apply(v, x, s)
  assert out.shape == (7, 4, 3 * 5)
  assert np.isfinite(np.asarray(out)).all()


def test_multisample_mixture_is_mean_of_singles():
  """The n-multisample encode is exactly the mean of the n per-sample
  encodes (expectation under the Gaussian mixture) by construction."""
  enc = _enc()
  x = jax.random.uniform(jax.random.PRNGKey(0), (5, 3, 3))
  s = jax.random.uniform(jax.random.PRNGKey(1), (5, 3)) * 0.05 + 0.01
  v = enc.init(jax.random.PRNGKey(2), x, s)
  full = enc.apply(v, x, s)
  singles = [enc.apply(v, x[:, k:k + 1], s[:, k:k + 1]) for k in range(3)]
  np.testing.assert_allclose(np.asarray(full),
                             np.mean(singles, axis=0), rtol=1e-5)


def test_integrated_profile_matches_monte_carlo():
  """Anti-aliasing integral: encode at (u, s) ~= E over x~N(u, s^2) of
  pointwise encodes (s->0). Exact for the unnormalized RBF field;
  the per-sample normalization adds only theta-ripple (~1e-5 at
  bump_width 0.75) away from the domain boundary."""
  enc = _enc(num_levels=1, level_dim=3, base=32, maxr=32)
  rng = np.random.RandomState(0)
  u = np.full((4, 1, 3), 0.5, np.float32)
  u += rng.uniform(-0.2, 0.2, u.shape).astype(np.float32)
  s = np.full((4, 1), 0.04, np.float32)
  v = enc.init(jax.random.PRNGKey(3), jnp.asarray(u), jnp.asarray(s))
  integrated = np.asarray(enc.apply(v, jnp.asarray(u), jnp.asarray(s)))
  n_mc = 4000
  samples = rng.normal(u[:, None, 0, :], s[0, 0],
                       (4, n_mc, 3)).astype(np.float32)
  point = enc.apply(v, jnp.asarray(samples)[..., None, :],
                    jnp.full((4, n_mc, 1), 1e-4))
  mc = np.asarray(point).mean(axis=1)
  np.testing.assert_allclose(integrated, mc, atol=0.02)


def test_large_std_decays_to_global_mean():
  """As the sample Gaussian widens, the profile approaches uniform and
  the features approach the table means — the analytic analog of the
  reference's erf downweighting (models.py:500-502)."""
  enc = _enc(num_levels=1, level_dim=2, base=16, maxr=16)
  x = jnp.full((2, 1, 3), 0.3)
  v = enc.init(jax.random.PRNGKey(4), x, jnp.full((2, 1), 0.01))
  wide = np.asarray(enc.apply(v, x, jnp.full((2, 1), 50.0)))
  table = v["params"]["v0"]  # [3, R, F]
  expect = np.prod(np.asarray(table).mean(axis=1), axis=0)
  np.testing.assert_allclose(wide[0], expect, rtol=1e-3)


def test_gradients_flow_to_all_axes_and_levels():
  enc = _enc(num_levels=2, level_dim=3)
  x = jax.random.uniform(jax.random.PRNGKey(5), (16, 2, 3))
  s = jnp.full((16, 2), 0.02)
  v = enc.init(jax.random.PRNGKey(6), x, s)
  g = jax.grad(lambda p: jnp.sum(enc.apply(p, x, s) ** 2))(v)
  for name in ("v0", "v1"):
    arr = np.asarray(g["params"][name])
    for a in range(3):
      assert np.abs(arr[a]).max() > 0, (name, a)


def test_no_gather_no_scatter_in_hlo():
  """The defining property: the compiled encode+grad contains no gather
  or scatter ops (v5e's serial-unit-bound primitives, PERF.md)."""
  enc = _enc(num_levels=2, level_dim=4, base=16, maxr=64)
  x = jax.random.uniform(jax.random.PRNGKey(0), (32, 2, 3))
  s = jnp.full((32, 2), 0.02)
  v = enc.init(jax.random.PRNGKey(1), x, s)

  def loss(p):
    return jnp.sum(enc.apply(p, x, s) ** 2)

  hlo = jax.jit(jax.grad(loss)).lower(v).as_text()
  for op in (" gather(", " scatter(", "scatter-add"):
    assert op not in hlo, f"{op.strip()} found in encoder HLO"


def test_zipnerf_cp_and_cp_ipe_forward():
  from snerf_tpu.models.zipnerf import ZipNerfConfig, init_zipnerf
  from snerf_tpu.ops.rays import Rays
  n = 6
  d = np.random.RandomState(0).randn(n, 3).astype(np.float32)
  rays = Rays(origins=jnp.zeros((n, 3)), directions=jnp.asarray(d),
              viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1,
                                                      keepdims=True)),
              radii=jnp.full((n, 1), 0.01), lossmult=jnp.ones((n, 1)),
              near=jnp.full((n, 1), 0.1), far=jnp.full((n, 1), 10.0),
              app=jnp.zeros((n, 1), jnp.int32))
  for etype in ("cp", "cp_ipe"):
    cfg = ZipNerfConfig(
        encoder_type=etype, num_prop_samples=(4,), num_levels=2,
        num_nerf_samples=4, sample_n=2, cp_num_levels=2, cp_level_dim=4,
        cp_base_resolution=16, cp_max_resolution=64, ipe_max_deg=6,
        ipe_anneal_frac=0.5, cp_anneal_frac=0.5,
        ipe_density_width=16, ipe_density_depth=2,
        bottleneck_width=16, net_width_viewdirs=16)
    model, variables = init_zipnerf(jax.random.PRNGKey(0), cfg)
    rend, _ = model.apply({"params": variables["params"]}, rays,
                          rng=jax.random.PRNGKey(1), train_frac=0.3)
    rgb = np.asarray(rend[-1]["rgb"])
    assert rgb.shape == (n, 3) and np.isfinite(rgb).all()


def test_zipnerf_cp_hash_query_modes():
  """cp_hash fine-level query modes: per-sample, collapsed, dithered.

  Dither must be train-time only: with rng=None the dithered model is
  bit-identical to the plain collapsed one (same params, same query at
  the interval mean)."""
  from snerf_tpu.models.zipnerf import ZipNerfConfig, init_zipnerf
  from snerf_tpu.ops.rays import Rays
  n = 5
  d = np.random.RandomState(1).randn(n, 3).astype(np.float32)
  rays = Rays(origins=jnp.zeros((n, 3)), directions=jnp.asarray(d),
              viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1,
                                                      keepdims=True)),
              radii=jnp.full((n, 1), 0.01), lossmult=jnp.ones((n, 1)),
              near=jnp.full((n, 1), 0.1), far=jnp.full((n, 1), 10.0),
              app=jnp.zeros((n, 1), jnp.int32))
  base = dict(
      encoder_type="cp_hash", num_prop_samples=(4,), num_levels=2,
      num_nerf_samples=4, sample_n=2, cp_num_levels=2, cp_level_dim=4,
      cp_base_resolution=16, cp_max_resolution=64, ipe_max_deg=6,
      cp_hash_resolution=64, cp_hash_level_dim=2, cp_hash_log2=10,
      ipe_density_width=16, ipe_density_depth=2,
      bottleneck_width=16, net_width_viewdirs=16)
  outs = {}
  for tag, kw in (("per_sample", dict(cp_hash_per_sample=True)),
                  ("collapsed", dict(cp_hash_use_spread=False)),
                  ("split2", dict(cp_hash_use_spread=False,
                                  cp_hash_split=2)),
                  ("split2_spread", dict(cp_hash_split=2)),
                  ("dither", dict(cp_hash_use_spread=False,
                                  cp_hash_dither=True))):
    cfg = ZipNerfConfig(**base, **kw)
    model, variables = init_zipnerf(jax.random.PRNGKey(0), cfg)
    rend, _ = model.apply({"params": variables["params"]}, rays,
                          rng=jax.random.PRNGKey(1), train_frac=0.3)
    rgb = np.asarray(rend[-1]["rgb"])
    assert rgb.shape == (n, 3) and np.isfinite(rgb).all(), tag
    # eval path (rng=None)
    rend_e, _ = model.apply({"params": variables["params"]}, rays,
                            rng=None)
    outs[tag] = np.asarray(rend_e[-1]["rgb"])
  np.testing.assert_array_equal(outs["dither"], outs["collapsed"])


def test_encoder_lr_mult_trains_grid_faster():
  """optax multi_transform group: grid params get encoder_lr_mult x the
  base schedule; net params the base. Verified by applying a uniform
  fake gradient and comparing Adam update magnitudes."""
  from snerf_tpu.train.zip_trainer import ZipTrainConfig, _make_tx
  cfg = ZipTrainConfig(lr_init=1e-3, lr_final=1e-3, lr_delay_steps=0,
                       encoder_lr_mult=4.0)
  params = {"nerf_mlp": {"cp_grid": {"v0": jnp.ones((3, 8, 2))},
                         "ipe_0": {"kernel": jnp.ones((4, 4))}}}
  tx = _make_tx(cfg)
  st = tx.init(params)
  grads = jax.tree_util.tree_map(jnp.ones_like, params)
  updates, _ = tx.update(grads, st, params)
  up_grid = float(jnp.abs(updates["nerf_mlp"]["cp_grid"]["v0"]).mean())
  up_net = float(jnp.abs(updates["nerf_mlp"]["ipe_0"]["kernel"]).mean())
  assert up_grid == pytest.approx(4.0 * up_net, rel=1e-3)


def test_hash_budget_warning():
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (ZipTrainConfig,
                                           estimate_hash_rays_per_sec,
                                           maybe_warn_hash_on_tpu)
  ref_m = ZipNerfConfig()            # reference budget: (64,64)+32, n=7
  ref_t = ZipTrainConfig(batch_size=4096)
  est = estimate_hash_rays_per_sec(ref_m, ref_t)
  assert 150 < est < 600, est        # measured: 310 rays/s (PERF.md)
  msg = maybe_warn_hash_on_tpu(ref_m, ref_t, platform="tpu")
  assert "WARNING" in msg and "rays/s" in msg
  # no warning off-TPU, for fast encoders, or at small budgets
  assert maybe_warn_hash_on_tpu(ref_m, ref_t, platform="cpu") == ""
  ipe_m = ZipNerfConfig(encoder_type="ipe")
  assert maybe_warn_hash_on_tpu(ipe_m, ref_t, platform="tpu") == ""
  tiny_m = ZipNerfConfig(num_prop_samples=(4,), num_nerf_samples=4,
                         sample_n=1, grid_num_levels=3)
  tiny_t = ZipTrainConfig(batch_size=64)
  assert maybe_warn_hash_on_tpu(tiny_m, tiny_t, platform="tpu") == ""


def test_init_smooth_lowpass():
  """init_smooth low-passes the factor init noise along the resolution
  axis while preserving the init_scale marginal std (the cross-seed
  droop mitigation, PERF.md run-18/20)."""
  import numpy as np
  from snerf_tpu.models.cpgrid import CPEncoding
  x = jnp.full((5, 3, 3), 0.5)
  s = jnp.full((5, 3), 0.01)
  stats = {}
  for sm in (0.0, 4.0):
    enc = CPEncoding(num_levels=2, level_dim=8, base_resolution=32,
                     max_resolution=64, init_smooth=sm)
    v = enc.init(jax.random.PRNGKey(1), x, s)
    d = np.asarray(v["params"]["v1"]) - 1.0
    ac = np.mean(d[:, :-1] * d[:, 1:]) / np.mean(d * d)
    stats[sm] = (d.std(), ac)
    out = enc.apply(v, x, s)
    assert np.isfinite(np.asarray(out)).all()
  assert stats[0.0][0] == pytest.approx(0.1, rel=0.05)
  assert stats[4.0][0] == pytest.approx(0.1, rel=0.05)   # std preserved
  assert abs(stats[0.0][1]) < 0.2                        # white
  assert stats[4.0][1] > 0.9                             # low-passed


def test_feature_center_and_scale():
  """feature_center subtracts the product DC (zero-mean features at
  init), feature_scale shrinks them toward the instant-NGP small-init
  regime (round-5 scene-b stability knobs); gradients into the tables
  survive both and are scaled by feature_scale."""
  import numpy as np
  from snerf_tpu.models.cpgrid import CPEncoding
  x = jnp.asarray(np.random.RandomState(0).rand(64, 1, 3),
                  jnp.float32)
  s = jnp.full((64, 1), 0.01)
  base = CPEncoding(num_levels=2, level_dim=8, base_resolution=16,
                    max_resolution=32)
  v = base.init(jax.random.PRNGKey(0), x, s)
  f0 = np.asarray(base.apply(v, x, s))
  cen = CPEncoding(num_levels=2, level_dim=8, base_resolution=16,
                   max_resolution=32, feature_center=True)
  f1 = np.asarray(cen.apply(v, x, s))
  np.testing.assert_allclose(f1, f0 - 1.0, atol=1e-6)
  assert abs(f1.mean()) < 0.05          # zero-mean at init
  assert abs(f0.mean() - 1.0) < 0.05    # DC ~1 uncentered
  sc = CPEncoding(num_levels=2, level_dim=8, base_resolution=16,
                  max_resolution=32, feature_center=True,
                  feature_scale=0.01)
  f2 = np.asarray(sc.apply(v, x, s))
  np.testing.assert_allclose(f2, 0.01 * f1, atol=1e-7)
  assert np.sqrt((f2 ** 2).mean()) < 5e-3   # hash-like tiny features

  g1 = jax.grad(lambda p: (cen.apply(p, x, s) ** 2).sum())(v)
  g2 = jax.grad(lambda p: (sc.apply(p, x, s) ** 2).sum())(v)
  n1 = np.sqrt(sum(float((a ** 2).sum())
                   for a in jax.tree_util.tree_leaves(g1)))
  n2 = np.sqrt(sum(float((a ** 2).sum())
                   for a in jax.tree_util.tree_leaves(g2)))
  assert n1 > 0 and n2 > 0              # gradients flow


def test_config_density_zero_init_tristate():
  """zip_density_zero_init: None = encoder-aware auto (ON for the
  cp-family, OFF for hash/ipe reference parity); explicit bool wins."""
  from snerf_tpu.config import Config
  assert Config(zip_encoder="cp_hash").zip_model_config() \
      .density_zero_init is True
  assert Config(zip_encoder="cp_ipe").zip_model_config() \
      .density_zero_init is True
  assert Config(zip_encoder="hash").zip_model_config() \
      .density_zero_init is False
  assert Config(zip_encoder="ipe").zip_model_config() \
      .density_zero_init is False
  assert Config(zip_encoder="cp_hash", zip_density_zero_init=False) \
      .zip_model_config().density_zero_init is False
  assert Config(zip_encoder="hash", zip_density_zero_init=True) \
      .zip_model_config().density_zero_init is True
