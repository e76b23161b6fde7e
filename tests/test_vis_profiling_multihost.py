"""Vis colormaps, profiling hooks, multi-host shard math."""

import numpy as np

from snerf_tpu.parallel.multihost import local_batch_slice, process_shard
from snerf_tpu.utils import vis
from snerf_tpu.utils.profiling import RaysPerSec, Timing


def test_visualize_depth_shapes_and_range():
  d = np.linspace(1, 50, 100).reshape(10, 10)
  rgb = vis.visualize_depth(d)
  assert rgb.shape == (10, 10, 3) and rgb.dtype == np.uint8
  # near != far colors
  assert not (rgb[0, 0] == rgb[-1, -1]).all()


def test_semantic_palette():
  lab = np.array([[0, 10], [13, 18]])
  rgb = vis.semantic_to_rgb(lab)
  assert rgb.shape == (2, 2, 3)
  np.testing.assert_array_equal(rgb[0, 0], [128, 64, 128])
  np.testing.assert_array_equal(rgb[1, 0], [0, 0, 142])


def test_overlay_and_bbox():
  img = np.zeros((20, 30, 3), np.uint8)
  out = vis.overlay_points(img, np.array([5.0]), np.array([7.0]),
                           values=np.array([1.0]))
  assert out[7, 5].sum() > 0
  boxed = vis.draw_bbox_2d(img, [dict(xmin=2, ymin=2, xmax=10, ymax=10,
                                      category="Car")])
  assert boxed[2, 5].sum() > 0


def test_timing_and_rays_meter():
  with Timing("x", verbose=False) as t:
    pass
  assert t.elapsed >= 0
  m = RaysPerSec()
  m.update(100)
  assert m.rate() > 0


def test_process_shard_single_host():
  sh = process_shard(10)
  np.testing.assert_array_equal(sh, np.arange(10))
  assert local_batch_slice(4096) == 4096


def test_kitti_depth_metrics():
  from snerf_tpu.utils.metrics import kitti_depth_metrics
  gt = np.array([[10.0, 20.0, 0.0]])  # last invalid
  pred = np.array([[11.0, 18.0, 5.0]])
  m = kitti_depth_metrics(pred, gt)
  assert m["n_valid"] == 2
  assert m["mae"] == 1500.0  # mean(|1|, |2|) m -> mm
  assert m["rmse"] > m["mae"] - 1e-6


def test_foreground_preprocess():
  from snerf_tpu.sim.mesh import foreground_preprocess
  rgba = np.zeros((4, 4, 4), np.float32)
  rgba[1:3, 1:3] = [0.5, 0.25, 1.0, 1.0]
  rgb, mask = foreground_preprocess(rgba)
  assert mask.sum() == 4
  np.testing.assert_allclose(rgb[1, 1], [0.5, 0.25, 1.0])
  np.testing.assert_allclose(rgb[0, 0], 0.0)


def test_draw_bbox_3d():
  b = dict(height=1.5, width=1.8, length=4.0, pos_x=0.0, pos_y=1.0,
           pos_z=10.0, rot_y=0.3)
  from snerf_tpu.utils.vis import draw_bbox_3d, kitti_bbox_corners
  corners = kitti_bbox_corners(b)
  assert corners.shape == (8, 3)
  # box extent along camera z is ~ within [pos_z - l, pos_z + l]
  assert corners[:, 2].min() > 10.0 - 4.0
  assert corners[:, 2].max() < 10.0 + 4.0
  K = np.array([[100.0, 0, 60], [0, 100.0, 40], [0, 0, 1]])
  img = np.zeros((80, 120, 3), np.uint8)
  out = draw_bbox_3d(img, [b], K)
  assert out.sum() > 0  # something was drawn
