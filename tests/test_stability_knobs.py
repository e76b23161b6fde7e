"""F>=64 stability-investigation knobs (VERDICT r3 next #4):
bounded CP factor tables (models/cpgrid.py factor_bound), per-level
encoder lr (zip_trainer encoder_level_lr_gamma), encoder-only grad
clipping (encoder_grad_max_norm), and the debug_grad_norms metrics.

Capability context: the reference trains its hash tables at full lr
from step 0 (zipnerf train.py + configs); the TPU CP encoder needs a
10% warmup at level_dim >= 64 — these knobs are the candidate
mechanisms for removing that crutch (PERF.md round-4 investigation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snerf_tpu.models.cpgrid import CPEncoding


def _enc(**kw):
  return CPEncoding(num_levels=2, level_dim=4, base_resolution=8,
                    max_resolution=16, **kw)


def test_factor_bound_matches_unbounded_near_init():
  """v = 1 + b tanh(raw/b) == 1 + raw to first order: the bounded
  encoder reproduces the unbounded one at init up to O(raw^3/b^2)."""
  x = jax.random.uniform(jax.random.PRNGKey(0), (5, 2, 3))
  s = jnp.full((5, 2), 0.02)
  enc_u = _enc()
  enc_b = _enc(factor_bound=0.5)
  vu = enc_u.init(jax.random.PRNGKey(1), x, s)
  vb = enc_b.init(jax.random.PRNGKey(1), x, s)
  # same RNG: raw_b == (v_u - 1); outputs agree to the tanh cubic term
  for k in vu["params"]:
    np.testing.assert_allclose(np.asarray(vb["params"][k]),
                               np.asarray(vu["params"][k]) - 1.0,
                               atol=1e-6)
  ou = np.asarray(enc_u.apply(vu, x, s))
  ob = np.asarray(enc_b.apply(vb, x, s))
  np.testing.assert_allclose(ob, ou, atol=2e-2)


def test_factor_bound_caps_features():
  """Huge raw tables cannot push any per-axis term past 1 + b, so the
  triple product is structurally capped at (1 + b)^3."""
  b = 0.5
  enc = _enc(factor_bound=b)
  x = jax.random.uniform(jax.random.PRNGKey(0), (16, 2, 3))
  s = jnp.full((16, 2), 0.02)
  v = enc.init(jax.random.PRNGKey(1), x, s)
  huge = jax.tree_util.tree_map(lambda t: t * 0 + 1e6, v["params"])
  out = np.asarray(enc.apply({"params": huge}, x, s))
  assert np.all(out <= (1 + b) ** 3 + 1e-4)
  assert np.isfinite(out).all()
  # gradients through the saturation stay finite
  g = jax.grad(lambda p: enc.apply({"params": p}, x, s).sum())(huge)
  assert all(np.isfinite(np.asarray(t)).all()
             for t in jax.tree_util.tree_leaves(g))


def _tiny_zip_setup(tcfg_kw, mcfg_kw=None):
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state, make_zip_train_step)
  scene = make_synthetic_scene(num_images=3, H=16, W=16)
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(
      encoder_type="cp_ipe", cp_num_levels=3, cp_level_dim=4,
      cp_base_resolution=8, cp_max_resolution=32,
      cp_prop_num_levels=2, cp_prop_level_dim=2,
      num_prop_samples=(4, 4), num_nerf_samples=4, sample_n=2,
      bottleneck_width=16, net_width_viewdirs=16,
      ipe_density_width=16, ipe_density_depth=2, ipe_max_deg=4,
      **(mcfg_kw or {}))
  tcfg = ZipTrainConfig(batch_size=32, max_steps=4, lr_init=1e-2,
                        lr_final=1e-2, lr_delay_steps=0,
                        lr_delay_mult=1.0, **tcfg_kw)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg,
                                        tcfg)
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=False)
  return state, step


def _cp_tables(params):
  return params["nerf_mlp"]["cp_grid"]


def test_per_level_lr_gamma_scales_updates():
  """encoder_level_lr_gamma=g trains level l at mult * g^l: after one
  step the per-level Adam updates (~lr per entry at step 0) shrink
  geometrically with l, and trunk params still train."""
  g = 0.25
  state, step = _tiny_zip_setup(dict(encoder_lr_mult=4.0,
                                     encoder_level_lr_gamma=g,
                                     grad_max_norm=0.0))
  p0 = jax.device_get(state.params)
  state2, m = step(state, jax.random.PRNGKey(1))
  p1 = jax.device_get(state2.params)
  t0, t1 = _cp_tables(p0), _cp_tables(p1)
  # mean |update| per level; Adam step-0 updates are ~lr*mult*g^l
  dl = {k: float(np.mean(np.abs(t1[k] - t0[k]))) for k in t0}
  assert set(dl) >= {"v0", "v1", "v2"}
  assert dl["v1"] < 0.6 * dl["v0"]
  assert dl["v2"] < 0.6 * dl["v1"]
  # trunk moved too
  d_net = np.mean(np.abs(
      p1["nerf_mlp"]["density_out"]["kernel"]
      - p0["nerf_mlp"]["density_out"]["kernel"]))
  assert d_net > 0
  assert np.isfinite(float(m["loss"]))


def test_encoder_grad_clip_and_debug_norms():
  """encoder_grad_max_norm caps the table-group grad norm (visible via
  debug_grad_norms' pre-clip value vs a tiny cap's post-step update)."""
  state, step = _tiny_zip_setup(dict(encoder_lr_mult=1.0,
                                     debug_grad_norms=True,
                                     encoder_grad_max_norm=1e-8,
                                     grad_max_norm=0.0))
  _, m = step(state, jax.random.PRNGKey(1))
  # pre-clip norms are reported and finite/positive
  assert float(m["gnorm_grid"]) > 0
  assert float(m["gnorm_net"]) > 0
  assert np.isfinite(float(m["loss"]))


def test_factor_bound_trains_end_to_end():
  state, step = _tiny_zip_setup(dict(encoder_lr_mult=4.0),
                                mcfg_kw=dict(cp_factor_bound=0.5))
  for i in range(2):
    state, m = step(state, jax.random.PRNGKey(i))
  assert np.isfinite(float(m["loss"]))
  # raw tables are zero-mean-ish (bounded parameterization), not 1-mean
  t = _cp_tables(jax.device_get(state.params))
  assert abs(float(np.mean(t["v0"]))) < 0.5
