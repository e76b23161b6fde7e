"""Optical-flow providers for the depth pipeline.

The reference hardwires SepFlow (RAFT-like net + 4.3k LoC of GANet CUDA
aggregation ops, SURVEY §2.2 P5). Here flow is a plug-in contract
(pipeline.py); this module ships two providers:

  farneback_flow_fn — classical dense flow (cv2), dependency-free
      default that keeps the whole pipeline runnable end-to-end.
  make_model_flow_fn — adapter wrapping any learned flow callable
      (e.g. a JAX RAFT port or an ONNX SepFlow export).
"""

from __future__ import annotations

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
