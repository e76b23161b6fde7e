"""RAFT-lite learned flow (preprocess/nets/raftlite.py) — parity class:
reference SepFlow (core/sepflow.py:1-259).

Full accuracy-vs-LK evaluation lives in scripts/eval_flow.py (table in
PERF.md); here: contract, differentiability/convergence, save/load.
"""

import numpy as np

from snerf_tpu.preprocess.nets import raftlite


def test_flow_fn_contract_shapes():
  fn = raftlite.make_raftlite_flow_fn(iters=2)
  rng = np.random.RandomState(0)
  img0 = rng.randint(0, 255, (40, 56, 3), np.uint8)
  img1 = rng.randint(0, 255, (40, 56, 3), np.uint8)
  out = fn(img0, img1)
  assert out.shape == (40, 56, 2) and out.dtype == np.float32
  assert np.isfinite(out).all()


def test_training_reduces_loss():
  _, params, losses = raftlite.train_raftlite(steps=40, size=(32, 32),
                                              iters=3, lr=1e-3,
                                              max_shift=2.5)
  first = np.mean(losses[:5])
  last = np.mean(losses[-5:])
  assert last < 0.8 * first, (first, last)


def test_save_load_roundtrip(tmp_path):
  import jax
  import jax.numpy as jnp
  model = raftlite.RaftLite(iters=2)
  z = jnp.zeros((32, 32, 1))
  params = model.init(jax.random.PRNGKey(1), z, z)["params"]
  path = str(tmp_path / "raft.npz")
  raftlite.save_params(path, params)
  loaded = raftlite.load_params(path, params)
  chk = jax.tree_util.tree_all(jax.tree_util.tree_map(
      lambda a, b: jnp.array_equal(a, b), params, loaded))
  assert bool(chk)
  fn = raftlite.make_raftlite_flow_fn(weights_path=path, iters=2)
  out = fn(np.zeros((32, 32, 3), np.uint8), np.zeros((32, 32, 3),
                                                     np.uint8))
  assert out.shape == (32, 32, 2)


def test_packaged_weights_beat_lk_on_large_shift():
  """The in-repo f16 weights (trained by scripts/eval_flow.py) load by
  default and solve the large-displacement regime where pyramidal LK
  breaks (PERF.md round-3 flow table)."""
  import os
  from scipy.ndimage import gaussian_filter
  from snerf_tpu.preprocess.flow import tpu_flow_fn
  assert os.path.exists(raftlite.PACKAGED_WEIGHTS)
  rng = np.random.RandomState(3)
  base = gaussian_filter(rng.rand(64, 96).astype(np.float32), 2.0)
  shift = 16
  img1 = np.roll(base, shift, axis=1)
  i0 = (base[..., None].repeat(3, -1) * 255).astype(np.uint8)
  i1 = (img1[..., None].repeat(3, -1) * 255).astype(np.uint8)
  raft = raftlite.make_raftlite_flow_fn()(i0, i1)
  lk = tpu_flow_fn(i0, i1, levels=4)
  m = np.zeros((64, 96), bool)
  m[16:-16, shift + 8:-16] = True
  epe = lambda f: float(np.median(
      np.hypot(f[..., 0] - shift, f[..., 1])[m]))
  assert epe(raft) < 4.0, epe(raft)
  assert epe(raft) < 0.5 * epe(lk), (epe(raft), epe(lk))


def test_tiled_inference_matches_untiled():
  """Tiled full-frame mode (ROADMAP: correlation volume is O((HW/16)^2),
  so nuScenes frames must be cropped): the feather-blended tile flows
  agree with the direct single-pass flow away from the frame border."""
  from scipy.ndimage import gaussian_filter
  rng = np.random.RandomState(5)
  base = gaussian_filter(rng.rand(96, 160).astype(np.float32), 2.0)
  img1 = np.roll(np.roll(base, 5, axis=1), 2, axis=0)
  i0 = (base[..., None].repeat(3, -1) * 255).astype(np.uint8)
  i1 = (img1[..., None].repeat(3, -1) * 255).astype(np.uint8)
  full = raftlite.make_raftlite_flow_fn()(i0, i1)
  tiled = raftlite.make_raftlite_flow_fn(tile=64, tile_overlap=32)(i0, i1)
  assert tiled.shape == full.shape and np.isfinite(tiled).all()
  m = np.zeros((96, 160), bool)
  m[16:-16, 16:-16] = True
  gt_epe = float(np.median(np.hypot(tiled[..., 0] - 5,
                                    tiled[..., 1] - 2)[m]))
  diff = float(np.median(np.hypot(*(tiled - full).transpose(2, 0, 1))[m]))
  assert gt_epe < 2.0, gt_epe
  assert diff < 1.0, diff


def test_tiled_small_image_is_single_pass():
  """Images <= tile take the direct path (bit-identical to untiled)."""
  rng = np.random.RandomState(0)
  i0 = rng.randint(0, 255, (40, 56, 3), np.uint8)
  i1 = rng.randint(0, 255, (40, 56, 3), np.uint8)
  a = raftlite.make_raftlite_flow_fn(iters=2)(i0, i1)
  b = raftlite.make_raftlite_flow_fn(iters=2, tile=64)(i0, i1)
  np.testing.assert_array_equal(a, b)


def test_synthetic_pair_flow_convention():
  """gt flow satisfies img1(x + flow) ~= img0(x) — the same (dx, dy)
  convention as tpu_flow_fn/farneback (test_preprocess.py)."""
  from scipy.ndimage import map_coordinates
  rng = np.random.RandomState(0)
  i0, i1, gt, valid = raftlite.synthetic_pair(rng, (48, 48),
                                              max_shift=3.0)
  yy, xx = np.mgrid[0:48, 0:48].astype(np.float32)
  resampled = map_coordinates(i1[..., 0], [yy + gt[..., 1],
                                           xx + gt[..., 0]],
                              order=1, mode="nearest")
  err = (np.abs(resampled - i0[..., 0]) * valid)[8:-8, 8:-8]
  assert np.median(err) < 0.02, np.median(err)


def test_hybrid_flow_dominates_lk():
  """The hybrid provider (RAFT init + LK polish + photometric
  selection, flow.make_hybrid_flow_fn — VERDICT r3 #5) must carry both
  regimes: sub-pixel accuracy at least LK-grade on small motion AND
  solve the large displacement LK structurally cannot."""
  from scipy.ndimage import gaussian_filter
  from scipy.ndimage import shift as ndshift
  from snerf_tpu.preprocess.flow import make_hybrid_flow_fn, tpu_flow_fn

  rng = np.random.RandomState(7)
  base = gaussian_filter(rng.rand(64, 96).astype(np.float32), 2.0)
  hybrid = make_hybrid_flow_fn()

  def epe(f, dx, m):
    return float(np.median(np.hypot(f[..., 0] - dx, f[..., 1])[m]))

  # small sub-pixel translation: hybrid must be at least LK-grade
  img1 = ndshift(base, (0.0, 3.5), order=1, mode="nearest")
  m = np.zeros((64, 96), bool)
  m[16:-16, 16:-16] = True
  e_h = epe(hybrid(base, img1), 3.5, m)
  e_lk = epe(tpu_flow_fn(base, img1, levels=4), 3.5, m)
  assert e_h <= e_lk * 1.1 + 0.02, (e_h, e_lk)

  # large shift: hybrid must inherit RAFT's basin
  shift = 16
  img1 = np.roll(base, shift, axis=1)
  m2 = np.zeros((64, 96), bool)
  m2[16:-16, shift + 8:-16] = True
  e_h2 = epe(hybrid(base, img1), shift, m2)
  e_lk2 = epe(tpu_flow_fn(base, img1, levels=4), shift, m2)
  assert e_h2 < 1.0, e_h2
  assert e_h2 < 0.25 * e_lk2, (e_h2, e_lk2)
