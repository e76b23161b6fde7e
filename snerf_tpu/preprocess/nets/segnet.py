"""Learned semantic segmentation for the preprocessing toolchain.

Capability target: the reference's mseg-semantic external
(scripts/depth_model/external/mseg-semantic, invoked
YORO_1CAM_PIPELINE_REFINE.py:731-743), which produces full label maps
consumed two ways:
  - the depth pipeline reads sky(==142) to set sky depth to 200 m
    (YORO:797, preprocess/lidar.apply_sky_depth), and
  - the trainers consume Cityscapes-19 trainId maps as semantic
    supervision (s-nerf SemanticLoss; zip semantic NLL train.py:299-303).

The net is the in-repo ERFNet (nets/erfnet.py — segmentation is
ERFNet's original task; exact torch-import parity tested in
tests/test_erfnet_parity.py, so a real ERFNet cityscapes checkpoint
loads). Without a checkpoint, train_segmentation fits it to labeled
frames (e.g. the synthetic street fixture) so the default toolchain can
emit real multi-class maps instead of the sky-only classical fallback
(pipeline.default_segmentation_fn).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.preprocess.nets import erfnet
from snerf_tpu.preprocess.nets import torchconv as T

NUM_CLASSES = 19          # cityscapes trainIds
SKY_TRAINID = 10          # cityscapes 'sky'
MSEG_SKY = 142            # mseg universal 'sky' (YORO:797)


def to_pipeline_labels(trainids: np.ndarray) -> np.ndarray:
  """Cityscapes trainIds -> the depth pipeline's label convention
  (sky mapped to mseg's 142; everything else stays a trainId <19,
  which the pipeline ignores)."""
  out = trainids.astype(np.int32).copy()
  out[trainids == SKY_TRAINID] = MSEG_SKY
  return out


def logits_fn(params, rgb01, num_classes: int = NUM_CLASSES):
  """rgb01 NHWC in [0,1] -> logits NHWC[num_classes]."""
  return erfnet.apply(params, rgb01, 3, num_classes)


def make_segmentation_fn(params=None, weights_path: Optional[str] = None,
                         num_classes: int = NUM_CLASSES,
                         emit_pipeline_labels: bool = True,
                         pad_to: int = 8):
  """segmentation_fn(rgb u8 [H,W,3]) -> labels [H,W] int32 — the
  pipeline plug-in contract (preprocess/pipeline.py:14)."""
  if params is None:
    if weights_path is not None:
      params = erfnet.import_state_dict(
          T.load_state_dict_file(weights_path), 3, num_classes)
    else:
      params = erfnet.init_params(jax.random.PRNGKey(0), 3, num_classes)
  fwd = jax.jit(lambda p, x: jnp.argmax(
      logits_fn(p, x, num_classes), axis=-1))

  def segmentation_fn(rgb):
    h, w = rgb.shape[:2]
    x = np.asarray(rgb, np.float32)[None] / 255.0
    x = np.pad(x, ((0, 0), (0, -h % pad_to), (0, -w % pad_to), (0, 0)),
               mode="edge")
    labels = np.asarray(fwd(params, jnp.asarray(x)))[0, :h, :w]
    labels = labels.astype(np.int32)
    return to_pipeline_labels(labels) if emit_pipeline_labels else labels

  return segmentation_fn


def train_segmentation(images: np.ndarray, labels: np.ndarray,
                       steps: int = 300, lr: float = 1e-3,
                       num_classes: int = NUM_CLASSES,
                       crop: int = 64, batch: int = 4, seed: int = 0,
                       log_every: int = 0):
  """Fit ERFNet to (images u8 [N,H,W,3], labels int [N,H,W]) with
  random-crop batches + pixel cross-entropy. Returns (params, losses)."""
  import optax
  params = erfnet.init_params(jax.random.PRNGKey(seed), 3, num_classes)
  tx = optax.adam(lr)
  opt = tx.init(params)
  rng = np.random.RandomState(seed)
  N, H, W = labels.shape[:3]
  crop = min(crop, H, W)
  crop -= crop % 8

  @jax.jit
  def step(params, opt, x, y):
    def loss_fn(p):
      logits = logits_fn(p, x, num_classes)
      logp = jax.nn.log_softmax(logits, axis=-1)
      nll = -jnp.take_along_axis(logp, y[..., None], axis=-1)
      return jnp.mean(nll)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt, loss

  losses = []
  for s in range(steps):
    idx = rng.randint(0, N, batch)
    ys = rng.randint(0, H - crop + 1, batch)
    xs = rng.randint(0, W - crop + 1, batch)
    xb = np.stack([images[i, yy:yy + crop, xx:xx + crop]
                   for i, yy, xx in zip(idx, ys, xs)]) / np.float32(255.0)
    yb = np.stack([labels[i, yy:yy + crop, xx:xx + crop]
                   for i, yy, xx in zip(idx, ys, xs)]).astype(np.int32)
    params, opt, loss = step(params, opt, jnp.asarray(xb),
                             jnp.asarray(yb))
    if log_every and (s + 1) % log_every == 0:
      print(f"[segnet {s + 1}] loss={float(loss):.4f}", flush=True)
    losses.append(float(loss))
  return params, losses


def miou(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> float:
  """Mean IoU over classes present in gt (the zip Evaluator's metric,
  random_render_waymo_seq.py:34-90)."""
  ious = []
  for c in range(num_classes):
    gt_c = gt == c
    if not gt_c.any():
      continue
    pred_c = pred == c
    inter = np.logical_and(gt_c, pred_c).sum()
    union = np.logical_or(gt_c, pred_c).sum()
    ious.append(inter / max(union, 1))
  return float(np.mean(ious)) if ious else 0.0


# ---------------------------------------------------------------------------
# synthetic labeled street fixture (for in-repo training + tests)
# ---------------------------------------------------------------------------

_CLASS_COLORS = {
    0: (90, 90, 95),      # road — dark gray
    2: (160, 120, 90),    # building — brown
    8: (60, 140, 60),     # vegetation — green
    10: (170, 200, 235),  # sky — light blue
    13: (180, 40, 40),    # car — red
}


def make_labeled_street_scene(num_images: int = 8, H: int = 96,
                              W: int = 128, seed: int = 0):
  """Procedural street-ish frames with exact labels: sky above a rolling
  horizon, buildings/vegetation band, road below, car rectangles.
  Returns (images u8 [N,H,W,3], labels int32 [N,H,W] trainIds)."""
  rng = np.random.RandomState(seed)
  images = np.zeros((num_images, H, W, 3), np.uint8)
  labels = np.zeros((num_images, H, W), np.int32)
  xs = np.arange(W)
  for n in range(num_images):
    horizon = (0.35 * H + 0.08 * H * np.sin(
        2 * np.pi * xs / W * rng.uniform(0.5, 2) + rng.uniform(0, 6)))
    road_top = 0.62 * H + 0.05 * H * np.cos(
        2 * np.pi * xs / W * rng.uniform(0.5, 1.5))
    lab = np.zeros((H, W), np.int32)
    ys = np.arange(H)[:, None]
    lab[:] = 2                                  # building band default
    lab[ys < horizon[None, :]] = 10             # sky
    lab[ys >= road_top[None, :]] = 0            # road
    # vegetation blobs in the building band
    for _ in range(rng.randint(2, 5)):
      cy = rng.uniform(0.38, 0.58) * H
      cx = rng.uniform(0, 1) * W
      r = rng.uniform(0.04, 0.1) * H
      yy, xx = np.mgrid[0:H, 0:W]
      blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
      lab[blob & (lab == 2)] = 8
    # cars on the road
    for _ in range(rng.randint(1, 4)):
      cw = int(rng.uniform(0.08, 0.18) * W)
      ch = int(cw * 0.5)
      cx = rng.randint(0, W - cw)
      cy = int(rng.uniform(road_top.min(), H - ch - 1))
      lab[cy:cy + ch, cx:cx + cw] = 13
    img = np.zeros((H, W, 3), np.float32)
    for c, col in _CLASS_COLORS.items():
      img[lab == c] = np.array(col, np.float32)
    img += rng.normal(0, 6, img.shape)          # sensor noise
    # vertical shading gradient so the net can't just threshold color
    img *= (0.85 + 0.3 * (ys / H))[..., None]
    images[n] = np.clip(img, 0, 255).astype(np.uint8)
    labels[n] = lab
  return images, labels
