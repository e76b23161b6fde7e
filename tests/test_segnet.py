"""Learned segmentation (preprocess/nets/segnet.py) — the default
toolchain must produce real multi-class semantic labels, not sky-only
(VERDICT r2 missing #2; reference mseg invocation YORO:731-743).
"""

import numpy as np

from snerf_tpu.preprocess.nets import segnet


def test_labeled_street_scene_fixture():
  images, labels = segnet.make_labeled_street_scene(4, 64, 96)
  assert images.shape == (4, 64, 96, 3) and labels.shape == (4, 64, 96)
  present = set(np.unique(labels).tolist())
  assert {0, 10}.issubset(present)       # road + sky always
  assert len(present) >= 4               # multi-class, not binary


def test_segmentation_fn_contract():
  fn = segnet.make_segmentation_fn()     # random init
  rgb = np.random.RandomState(0).randint(0, 255, (30, 44, 3), np.uint8)
  out = fn(rgb)
  assert out.shape == (30, 44) and out.dtype == np.int32


def test_trained_segnet_beats_sky_only_miou():
  """Train on the street fixture; held-out mIoU must beat the classical
  sky-only default (pipeline.default_segmentation_fn), which by
  construction scores 0 on every non-sky class."""
  from snerf_tpu.preprocess.pipeline import default_segmentation_fn
  images, labels = segnet.make_labeled_street_scene(8, 96, 128, seed=1)
  train_im, train_lab = images[:6], labels[:6]
  test_im, test_lab = images[6:], labels[6:]

  params, losses = segnet.train_segmentation(
      train_im, train_lab, steps=260, lr=3e-3, crop=64, batch=3)
  assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])

  fn = segnet.make_segmentation_fn(params=params,
                                   emit_pipeline_labels=False)
  preds = np.stack([fn(im) for im in test_im])
  learned_miou = segnet.miou(preds, test_lab, segnet.NUM_CLASSES)

  sky_only = np.stack([default_segmentation_fn(im) for im in test_im])
  # map the pipeline's 142 back to trainId space for a fair comparison
  sky_only_t = np.where(sky_only == segnet.MSEG_SKY, segnet.SKY_TRAINID,
                        255)
  baseline_miou = segnet.miou(sky_only_t, test_lab, segnet.NUM_CLASSES)

  assert learned_miou > baseline_miou + 0.1, (learned_miou,
                                              baseline_miou)
  assert learned_miou > 0.4, learned_miou


def test_pipeline_label_convention():
  t = np.array([[segnet.SKY_TRAINID, 0], [13, 8]], np.int32)
  out = segnet.to_pipeline_labels(t)
  assert out[0, 0] == segnet.MSEG_SKY
  assert out[0, 1] == 0 and out[1, 0] == 13 and out[1, 1] == 8


def test_learned_fn_plugs_into_depth_pipeline(tmp_path):
  """segmentation_fn contract end-to-end: sky depth override applied
  through process_frame with the learned labeler."""
  from snerf_tpu.preprocess import pipeline
  images, labels = segnet.make_labeled_street_scene(2, 48, 64, seed=2)
  params, _ = segnet.train_segmentation(images, labels, steps=40,
                                        lr=2e-3, crop=48, batch=2)
  seg_fn = segnet.make_segmentation_fn(params=params)
  H, W = 48, 64
  pts = np.stack([np.random.RandomState(0).uniform(0, W - 1, 40),
                  np.random.RandomState(1).uniform(0, H - 1, 40),
                  np.random.RandomState(2).uniform(3, 30, 40)])
  frame = pipeline.FrameData(
      rgb=images[0], rgb_adjacent=images[1],
      lidar_points=pts.astype(np.float32),
      lidar_points_adjacent=pts.astype(np.float32))
  png, _, _ = pipeline.process_frame(
      frame, flow_fn=lambda a, b: np.zeros((H, W, 2), np.float32),
      segmentation_fn=seg_fn)
  assert png.shape == (H, W) and png.dtype == np.uint16
  # sky must carry the 200 m override where the net labels sky
  sky_mask = seg_fn(images[0]) == segnet.MSEG_SKY
  if sky_mask.any():
    assert (png[sky_mask] == 200 * 256).mean() > 0.5
