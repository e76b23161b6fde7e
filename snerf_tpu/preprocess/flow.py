"""Optical-flow providers for the depth pipeline.

The reference hardwires SepFlow (RAFT-like net + 4.3k LoC of GANet CUDA
aggregation ops, SURVEY §2.2 P5). Here flow is a plug-in contract
(pipeline.py); this module ships three providers:

  tpu_flow_fn — XLA-native coarse-to-fine dense Lucas-Kanade: image
      pyramid + per-level warp iterations, Gaussian-windowed structure
      tensor, closed-form 2x2 solve per pixel. Pure convolutions,
      bilinear gathers and elementwise math under one jit — runs on
      TPU/CPU with no external dependency. The accuracy target is the
      flow-vs-LiDAR consistency CHECK in the YORO pipeline
      (lidar.adaptive_flow_filter), which needs ~1-2 px agreement on
      mostly-rigid street motion, not SepFlow-grade boundaries.
  farneback_flow_fn — classical dense flow (cv2) fallback.
  make_model_flow_fn — adapter wrapping any learned flow callable
      (e.g. a JAX RAFT port or an ONNX SepFlow export).
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np


def farneback_flow_fn(img0, img1) -> np.ndarray:
  """Dense flow img0 -> img1, [H, W, 2] float32 pixels."""
  import cv2
  g0 = cv2.cvtColor(np.asarray(img0), cv2.COLOR_RGB2GRAY) \
      if img0.ndim == 3 else np.asarray(img0)
  g1 = cv2.cvtColor(np.asarray(img1), cv2.COLOR_RGB2GRAY) \
      if img1.ndim == 3 else np.asarray(img1)
  flow = cv2.calcOpticalFlowFarneback(
      g0, g1, None, pyr_scale=0.5, levels=4, winsize=21, iterations=3,
      poly_n=7, poly_sigma=1.5, flags=0)
  return flow.astype(np.float32)


# ---------------------------------------------------------------------------
# TPU-native pyramidal dense Lucas-Kanade
# ---------------------------------------------------------------------------


def _to_gray_f32(img) -> np.ndarray:
  img = np.asarray(img, np.float32)
  if img.ndim == 3:
    img = img[..., :3] @ np.array([0.299, 0.587, 0.114], np.float32)
  if img.max() > 1.5:  # uint8-scaled input
    img = img / 255.0
  return img.astype(np.float32)


def _gauss1d(win: int, sigma: float):
  import jax.numpy as jnp
  x = jnp.arange(win, dtype=jnp.float32) - (win - 1) / 2.0
  k = jnp.exp(-0.5 * (x / sigma) ** 2)
  return k / k.sum()


def _sep_conv(img, k):
  """Separable same-size [H, W] filter with edge replication."""
  import jax.numpy as jnp
  pad = (k.shape[0] - 1) // 2

  def conv1d(x, axis):
    x = jnp.moveaxis(x, axis, -1)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    # [rows, L+2p] (*) [win] via conv_general_dilated on a batch of rows
    lhs = xp[:, None, :]                      # [B, 1, L+2p]
    rhs = k[None, None, ::-1]                 # [1, 1, win] (correlation)
    out = _lax().conv_general_dilated(lhs, rhs, (1,), "VALID")[:, 0, :]
    return jnp.moveaxis(out, -1, axis)

  return conv1d(conv1d(img, 0), 1)


def _lax():
  from jax import lax
  return lax


def _bilinear(img, yx):
  """Sample [H, W] img at float coords yx [..., 2] (y, x), edge clamp."""
  from jax.scipy.ndimage import map_coordinates
  return map_coordinates(img, [yx[..., 0], yx[..., 1]], order=1,
                         mode="nearest")


def _resize(img, shape):
  import jax
  return jax.image.resize(img, shape, method="linear")


@functools.lru_cache(maxsize=None)
def _lk_jitted(shape, levels, iters, win, sigma):
  """Compile one pyramidal-LK program per image shape.

  flow_of(g0, g1, init_yx): init_yx [H, W, 2] (dy, dx) seeds the
  COARSEST pyramid level (downsampled + rescaled) instead of zero —
  the polish path of the hybrid flow (make_hybrid_flow_fn)."""
  import jax
  import jax.numpy as jnp

  H, W = shape

  def flow_of(g0, g1, init_yx):
    kb = _gauss1d(5, 1.0)
    kw = _gauss1d(win, sigma)
    # contrast-normalize so the 2x2-solve damping is scale-free
    mu = jnp.mean(g0)
    sd = jnp.std(g0) + 1e-8
    g0 = (g0 - mu) / sd
    g1 = (g1 - mu) / sd
    # image pyramids, fine -> coarse
    p0, p1 = [g0], [g1]
    for _ in range(levels - 1):
      h, w = p0[-1].shape
      h2, w2 = max(h // 2, 8), max(w // 2, 8)
      p0.append(_resize(_sep_conv(p0[-1], kb), (h2, w2)))
      p1.append(_resize(_sep_conv(p1[-1], kb), (h2, w2)))

    ch, cw = p0[-1].shape
    flow = _resize(init_yx, (ch, cw, 2)) * jnp.array(
        [ch / H, cw / W], jnp.float32)               # (dy, dx)
    for lvl in range(levels - 1, -1, -1):
      a, b = p0[lvl], p1[lvl]
      h, w = a.shape
      if flow.shape[:2] != (h, w):
        sy = h / flow.shape[0]
        sx = w / flow.shape[1]
        flow = _resize(flow, (h, w, 2)) * jnp.array([sy, sx],
                                                    jnp.float32)
      gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                            jnp.arange(w, dtype=jnp.float32),
                            indexing="ij")
      grid = jnp.stack([gy, gx], axis=-1)
      # spatial gradients of the target image (stable under warp)
      by = (jnp.roll(b, -1, 0) - jnp.roll(b, 1, 0)) * 0.5
      bx = (jnp.roll(b, -1, 1) - jnp.roll(b, 1, 1)) * 0.5

      def step(flow, _):
        warped = _bilinear(b, grid + flow)
        iy = _bilinear(by, grid + flow)
        ix = _bilinear(bx, grid + flow)
        it = warped - a
        axx = _sep_conv(ix * ix, kw)
        ayy = _sep_conv(iy * iy, kw)
        axy = _sep_conv(ix * iy, kw)
        bx_ = _sep_conv(ix * it, kw)
        by_ = _sep_conv(iy * it, kw)
        # Tikhonov damping relative to the local tensor trace: keeps
        # textureless regions at zero update without biasing textured
        # ones (the absolute-eps version crushed low-contrast inputs).
        lam = 1e-3 * (axx + ayy) + 1e-8
        axx = axx + lam
        ayy = ayy + lam
        det = axx * ayy - axy * axy
        du = (-ayy * bx_ + axy * by_) / det
        dv = (axy * bx_ - axx * by_) / det
        d = jnp.stack([dv, du], axis=-1)          # (dy, dx)
        d = jnp.clip(d, -float(win), float(win))
        return flow + d, None

      flow, _ = jax.lax.scan(step, flow, None, length=iters)
    return flow

  return jax.jit(flow_of)


def tpu_flow_fn(img0, img1, levels: int = 4, iters: int = 3,
                win: int = 21, sigma: float = 5.0) -> np.ndarray:
  """XLA-native dense flow img0 -> img1, [H, W, 2] float32 (dx, dy) px.

  Coarse-to-fine dense Lucas-Kanade: per pyramid level, `iters` warp
  iterations each solving the Gaussian-windowed 2x2 normal equations in
  closed form. Output convention matches farneback_flow_fn / the
  reference SepFlow npys: channel 0 = dx (columns), channel 1 = dy
  (rows) — consumed by lidar.flow_consistency_mask.
  """
  import jax.numpy as jnp

  g0 = _to_gray_f32(img0)
  g1 = _to_gray_f32(img1)
  if g0.shape != g1.shape:
    raise ValueError(f"frame shapes differ: {g0.shape} vs {g1.shape}")
  fn = _lk_jitted(g0.shape, int(levels), int(iters), int(win),
                  float(sigma))
  zero = jnp.zeros(g0.shape + (2,), jnp.float32)
  flow_yx = np.asarray(fn(jnp.asarray(g0), jnp.asarray(g1), zero))
  return flow_yx[..., ::-1].copy()  # (dy, dx) -> (dx, dy)


def lk_polish(img0, img1, init_dxdy, levels: int = 2, iters: int = 3,
              win: int = 21, sigma: float = 5.0) -> np.ndarray:
  """Sub-pixel LK refinement of an initial flow field (dx, dy) px.

  Runs the same dense-LK solver as tpu_flow_fn but seeded with
  `init_dxdy` at a shallow pyramid (the init already carries the
  large-displacement structure; LK supplies the sub-pixel tail its
  window solve is better at). Completes the reference's two-stage
  intent where SepFlow's refinement hierarchy lives inside the network
  (external/SeparableFlow-main/core/sepflow.py:1-259)."""
  import jax.numpy as jnp

  g0 = _to_gray_f32(img0)
  g1 = _to_gray_f32(img1)
  fn = _lk_jitted(g0.shape, int(levels), int(iters), int(win),
                  float(sigma))
  init_yx = jnp.asarray(np.asarray(init_dxdy, np.float32)[..., ::-1])
  flow_yx = np.asarray(fn(jnp.asarray(g0), jnp.asarray(g1), init_yx))
  return flow_yx[..., ::-1].copy()


@functools.lru_cache(maxsize=None)
def _residual_jitted(shape, win, sigma):
  """Windowed photometric residual of a candidate flow (lower=better)."""
  import jax
  import jax.numpy as jnp

  H, W = shape
  kw = _gauss1d(win, sigma)

  def resid(g0, g1, flow_yx):
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32),
                          indexing="ij")
    grid = jnp.stack([gy, gx], axis=-1)
    warped = _bilinear(g1, grid + flow_yx)
    return _sep_conv((warped - g0) ** 2, kw)

  return jax.jit(resid)


def make_hybrid_flow_fn(raft_fn: Callable | None = None,
                        polish_levels: int = 2, iters: int = 3,
                        win: int = 21, sigma: float = 5.0,
                        sel_win: int = 9) -> Callable:
  """Hybrid flow: RAFT-lite initialization + LK sub-pixel polish +
  per-pixel photometric selection against the pure-LK candidate.

  RAFT-lite carries the large-displacement regime its correlation
  pyramid is built for; the LK polish restores sub-pixel accuracy; the
  selector keeps whichever candidate (polished-RAFT vs full-pyramid LK)
  has the lower Gaussian-windowed photometric residual, so the hybrid
  upper-bounds both parents wherever brightness constancy holds.
  Mirrors the role of the reference's SepFlow stage
  (scripts/depth_model/external/SeparableFlow-main/core/sepflow.py)
  in the YORO depth pipeline."""
  import jax.numpy as jnp

  if raft_fn is None:
    from snerf_tpu.preprocess.nets import raftlite
    raft_fn = raftlite.make_raftlite_flow_fn()

  def flow_fn(img0, img1):
    g0 = _to_gray_f32(img0)
    g1 = _to_gray_f32(img1)
    f_lk = tpu_flow_fn(img0, img1, iters=iters, win=win, sigma=sigma)
    f_raft = np.asarray(raft_fn(img0, img1), np.float32)
    f_pol = lk_polish(img0, img1, f_raft, levels=polish_levels,
                      iters=iters, win=win, sigma=sigma)
    resid = _residual_jitted(g0.shape, int(sel_win), float(sel_win) / 3)
    e_lk = np.asarray(resid(jnp.asarray(g0), jnp.asarray(g1),
                            jnp.asarray(f_lk[..., ::-1])))
    e_pol = np.asarray(resid(jnp.asarray(g0), jnp.asarray(g1),
                             jnp.asarray(f_pol[..., ::-1])))
    e_raft = np.asarray(resid(jnp.asarray(g0), jnp.asarray(g1),
                              jnp.asarray(f_raft[..., ::-1])))
    # strict-improvement margin: where brightness constancy is broken
    # (occlusions) the residuals tie at noise level — prefer the LK
    # candidate there rather than flip-flopping on noise. The RAW raft
    # candidate covers the regime where the LK polish itself hurts
    # (large real flows drag the polish off the raft solution —
    # street-pair-wide measurement, PERF.md round-5).
    use_pol = (e_pol < 0.98 * e_lk)[..., None]
    out = np.where(use_pol, f_pol, f_lk).astype(np.float32)
    e_sel = np.where(use_pol[..., 0], e_pol, e_lk)
    use_raft = (e_raft < 0.98 * e_sel)[..., None]
    return np.where(use_raft, f_raft, out).astype(np.float32)

  return flow_fn


def make_model_flow_fn(model: Callable) -> Callable:
  """Wrap a learned flow model `model(img0_u8, img1_u8) -> [H, W, 2]`
  with contract validation."""

  def flow_fn(img0, img1):
    out = np.asarray(model(img0, img1), np.float32)
    if out.ndim != 3 or out.shape[-1] != 2:
      raise ValueError(f"flow model returned shape {out.shape}, "
                       "expected [H, W, 2]")
    return out

  return flow_fn
