"""Native rasterizer + raycaster: geometry closed forms, C++ vs numpy."""

import numpy as np
import pytest

from snerf_tpu.sim import native
from snerf_tpu.sim.placement import (
    build_bev, find_max_region, sample_position, unproject_depth_semantic)


def make_quad(z=5.0, half=1.0):
  """Two triangles forming a z-constant square centered on the axis."""
  verts = np.array([[-half, -half, z], [half, -half, z],
                    [half, half, z], [-half, half, z]], np.float32)
  faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
  return verts, faces


K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
HW = (48, 64)


def test_rasterize_depth_and_mask():
  verts, faces = make_quad(z=5.0, half=1.0)
  attrs = np.ones((4, 3), np.float32) * 0.5
  attr, depth, mask = native.rasterize(verts, faces, attrs, K, HW)
  # center pixel covered at depth 5
  assert mask[24, 32]
  assert depth[24, 32] == pytest.approx(5.0, abs=1e-4)
  np.testing.assert_allclose(attr[24, 32], 0.5, atol=1e-4)
  # the quad spans 100*1/5 = 20 px half-width
  assert not mask[24, 32 + 25]
  assert mask[24, 32 + 15]


def test_rasterize_zbuffer_order():
  v1, f1 = make_quad(z=5.0)
  v2, f2 = make_quad(z=3.0, half=0.3)
  verts = np.concatenate([v1, v2])
  faces = np.concatenate([f1, f2 + 4])
  attrs = np.zeros((8, 1), np.float32)
  attrs[4:] = 1.0  # near quad white
  attr, depth, mask = native.rasterize(verts, faces, attrs, K, HW)
  assert depth[24, 32] == pytest.approx(3.0, abs=1e-4)
  assert attr[24, 32, 0] == pytest.approx(1.0, abs=1e-4)
  # outside the small quad: far quad visible
  assert depth[24, 32 + 15] == pytest.approx(5.0, abs=1e-4)


def test_native_matches_numpy_fallback():
  rng = np.random.RandomState(0)
  verts = rng.randn(12, 3).astype(np.float32)
  verts[:, 2] = np.abs(verts[:, 2]) + 2
  faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]],
                   np.int32)
  attrs = rng.rand(12, 2).astype(np.float32)
  a1, d1, m1 = native.rasterize(verts, faces, attrs, K, HW)
  a2, d2, m2 = native._rasterize_numpy(verts, faces, attrs, K, HW)
  if native.get_lib() is None:
    pytest.skip("native lib unavailable")
  assert (m1 == m2).mean() > 0.99
  np.testing.assert_allclose(d1[m1 & m2], d2[m1 & m2], atol=1e-3)


def test_raycast_hit_and_miss():
  verts, faces = make_quad(z=5.0, half=1.0)
  origins = np.array([[0, 0, 0], [0, 0, 0], [3, 3, 0]], np.float32)
  dirs = np.array([[0, 0, 1], [0, 1, 0], [0, 0, 1]], np.float32)
  t, tri = native.raycast(verts, faces, origins, dirs)
  assert t[0] == pytest.approx(5.0, abs=1e-5)
  assert tri[0] >= 0
  assert np.isinf(t[1]) and tri[1] == -1
  assert np.isinf(t[2])


def test_raycast_closest_hit():
  v1, f1 = make_quad(z=5.0)
  v2, f2 = make_quad(z=3.0)
  verts = np.concatenate([v1, v2])
  faces = np.concatenate([f1, f2 + 4])
  t, tri = native.raycast(verts, faces,
                          np.zeros((1, 3), np.float32),
                          np.array([[0, 0, 1.0]], np.float32))
  assert t[0] == pytest.approx(3.0, abs=1e-5)


def test_raycast_native_vs_numpy():
  if native.get_lib() is None:
    pytest.skip("native lib unavailable")
  rng = np.random.RandomState(1)
  verts = rng.randn(30, 3).astype(np.float32) * 2
  faces = rng.randint(0, 30, (20, 3)).astype(np.int32)
  origins = rng.randn(16, 3).astype(np.float32) * 3
  dirs = rng.randn(16, 3).astype(np.float32)
  dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
  t1, _ = native.raycast(verts, faces, origins, dirs)
  t2, _ = native._raycast_numpy(verts, faces, origins, dirs)
  np.testing.assert_allclose(t1, t2, rtol=1e-4, atol=1e-5)


# ---------------- placement ----------------


def test_unproject_and_bev_and_sample():
  # flat ground plane at z=0 seen from above-ish camera
  H, W = 40, 60
  Kc = np.array([[50.0, 0, 30], [0, 50.0, 20], [0, 0, 1]])
  c2w = np.eye(4)
  # camera at z=10 looking straight down (+z forward toward ground)
  c2w[:3, :3] = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
  c2w[:3, 3] = [0, 0, 10]
  # depth = 10 everywhere (ground plane) approx for small fov
  depth = np.full((H, W), 10.0, np.float32)
  sem = np.zeros((H, W), np.int32)  # all drivable class 0
  # an interior 'undrivable' strip (the BEV extent is defined by the
  # drivable points; markers outside it are clipped, as in the reference)
  sem[:, 25:30] = 1
  pts, labs = unproject_depth_semantic(
      depth[None], sem[None], Kc[None], c2w[None], drop_ratio=0.0)
  assert pts.shape[0] == H * W
  # all ground points near z=0
  assert np.abs(pts[:, 2]).max() < 1.5

  bev = build_bev(pts, labs, drivable_idx=0, undrivable_idx=(1,))
  assert bev["bev_map"].max() == 255
  assert (bev["bev_map_refined"] == 127).any()

  x, y, z, fail = sample_position(
      bev, reject_r=0.5, render_pose=c2w, intrinsic=Kc,
      rng=np.random.RandomState(0))
  assert not fail
  assert abs(z) < 1.5  # ground height


def test_find_max_region():
  m = np.zeros((20, 20), np.uint8)
  m[2:10, 2:10] = 255   # big blob
  m[15:17, 15:17] = 255  # small blob
  out = find_max_region(m)
  assert out[5, 5] == 255
  assert out[15, 15] == 0
