"""NLSPN completion arm (VERDICT r3 next #9): the propagation math's
invariants, the completion_fn plug-in contract, and the training smoke.

The reference's pipeline shells out to an external NLSPN_ECCV20
checkout it does not vendor (YORO_1CAM_PIPELINE_REFINE.py:706-714), so
unlike sdc.py there is no state_dict layout to import-parity against;
these tests pin the mechanism instead.
"""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.preprocess.nets import nlspn


def test_affinity_normalization_is_contraction():
  """sum_k |a_k| <= 1 for any raw affinity (paper eq. 7)."""
  rng = np.random.RandomState(0)
  raw = jnp.asarray(rng.randn(5, 7, nlspn.K_NEIGHBORS) * 10)
  a = nlspn._normalize_affinity(raw)
  s = np.asarray(jnp.sum(jnp.abs(a), axis=-1))
  assert s.max() <= 1.0 + 1e-5


def test_propagation_preserves_confident_measurements():
  """A confidence-1 measured pixel must survive propagation exactly;
  propagation must not produce values outside the neighbor hull."""
  H, W = 12, 16
  rng = np.random.RandomState(1)
  d0 = jnp.asarray(rng.rand(H, W).astype(np.float32) * 5)
  off = jnp.zeros((H, W, 2 * nlspn.K_NEIGHBORS), jnp.float32)
  aff = jnp.asarray(rng.randn(H, W, nlspn.K_NEIGHBORS).astype(np.float32))
  conf = jnp.ones((H, W), jnp.float32)
  sparse = np.zeros((H, W), np.float32)
  sparse[5, 7] = 3.25
  sparse_conf = (sparse > 0).astype(np.float32)
  out = nlspn._propagate_one(d0, off, aff, conf, jnp.asarray(sparse),
                             jnp.asarray(sparse_conf), steps=6)
  out = np.asarray(out)
  assert abs(out[5, 7] - 3.25) < 1e-6
  # signed (tanh) affinities: the update need not stay in the data
  # hull; finiteness over the fixed step count is the invariant.
  assert np.isfinite(out).all()

  # with NON-NEGATIVE affinities (sum <= 1) the update IS convex:
  # every iterate stays inside the [min, max] hull of (d0, sparse).
  aff_pos = jnp.abs(aff)
  out_c = np.asarray(nlspn._propagate_one(
      d0, off, aff_pos, conf, jnp.asarray(sparse),
      jnp.asarray(sparse_conf), steps=6))
  lo = min(float(jnp.min(d0)), 0.0)
  hi = max(float(jnp.max(d0)), 3.25)
  assert out_c.min() >= lo - 1e-5 and out_c.max() <= hi + 1e-5


def test_zero_affinity_is_identity():
  """With zero affinities the propagation is the confidence-anchored
  init depth (the fixed point of the update)."""
  H, W = 8, 10
  rng = np.random.RandomState(2)
  d0 = jnp.asarray(rng.rand(H, W).astype(np.float32))
  off = jnp.zeros((H, W, 2 * nlspn.K_NEIGHBORS), jnp.float32)
  aff = jnp.full((H, W, nlspn.K_NEIGHBORS), 0.0, jnp.float32)
  conf = jnp.ones((H, W), jnp.float32)
  sparse = jnp.zeros((H, W), jnp.float32)
  out = nlspn._propagate_one(d0, off, aff, conf, sparse,
                             jnp.zeros((H, W), jnp.float32), steps=4)
  np.testing.assert_allclose(np.asarray(out), np.asarray(d0), atol=1e-6)


def test_nonlocal_offsets_change_result():
  """The learned offsets must actually displace the sampling stencil
  (the non-local part — a fixed-3x3 SPN would be invariant to them)."""
  H, W = 10, 12
  rng = np.random.RandomState(3)
  d0 = jnp.asarray(rng.rand(H, W).astype(np.float32))
  aff = jnp.asarray(rng.randn(H, W, nlspn.K_NEIGHBORS).astype(np.float32))
  conf = jnp.ones((H, W), jnp.float32)
  zero = jnp.zeros((H, W), jnp.float32)
  off0 = jnp.zeros((H, W, 2 * nlspn.K_NEIGHBORS), jnp.float32)
  off1 = off0 + 2.5
  o0 = nlspn._propagate_one(d0, off0, aff, conf, zero, zero, steps=2)
  o1 = nlspn._propagate_one(d0, off1, aff, conf, zero, zero, steps=2)
  assert float(jnp.abs(o0 - o1).max()) > 1e-3


def test_completion_fn_contract():
  """Pipeline plug-in: exact returns kept, shape/dtype correct, odd
  sizes padded."""
  p = nlspn.init_params(jax.random.PRNGKey(0), width=16)
  fn = nlspn.make_nlspn_completion_fn(params=p)
  rng = np.random.RandomState(0)
  rgb = (rng.rand(21, 31, 3) * 255).astype(np.uint8)
  sparse = np.zeros((21, 31), np.float32)
  sparse[::4, ::5] = rng.rand(6, 7) * 10 + 1
  out = fn(rgb, sparse)
  assert out.shape == sparse.shape and out.dtype == np.float32
  v = sparse > 0.1
  np.testing.assert_allclose(out[v], sparse[v])
  assert np.isfinite(out).all() and (out >= 0).all()


def test_train_completion_learns():
  rng = np.random.RandomState(0)
  yy, xx = np.mgrid[0:40, 0:40].astype(np.float32)
  ims, ds = [], []
  for k in range(3):
    d = 2.0 + np.sin(xx / (5 + k)) + 0.5 * np.cos(yy / 4)
    im = np.stack([d * 40, 255 - d * 30, (xx + yy) % 255], -1)
    ims.append(im.astype(np.uint8))
    ds.append(d)
  params, losses = nlspn.train_completion(
      np.stack(ims), np.stack(ds), steps=60, crop=32, batch=2,
      width=16, lr=2e-3, seed=0)
  assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.7
