"""Cost-volume aggregation ops (GANet family), JAX-native.

Behavioral parity target (SURVEY §2.6.2): the SepFlow optical-flow net's
CUDA aggregation kernels (scripts/depth_model/external/SeparableFlow-main/
libs/GANet/src, 4.3k LoC: sga / lga / nlf directional aggregations over
cost volumes). These run in OFFLINE preprocessing, so a lax.scan
implementation is the right tradeoff on TPU (the survey explicitly
blesses a slower non-CUDA implementation here).

Shapes follow the GANet convention: cost volume x [B, C, H, W] (or
[B, C, D, H, W] for 3D), guidance weights g [B, K, H, W] normalized over
K (the per-direction mixing weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _directional_scan(x, g0, g1, axis: int, reverse: bool):
  """One semi-global pass: out[i] = g0[i] * x[i] + g1[i] * out[i-1]
  along `axis` (the linear recurrence at the core of SGA)."""
  x_m = jnp.moveaxis(x, axis, 0)
  g0_m = jnp.moveaxis(g0, axis, 0)
  g1_m = jnp.moveaxis(g1, axis, 0)

  def step(carry, inp):
    xi, a, b = inp
    out = a * xi + b * carry
    return out, out

  init = jnp.zeros_like(x_m[0])
  _, out = jax.lax.scan(step, init, (x_m, g0_m, g1_m), reverse=reverse)
  return jnp.moveaxis(out, 0, axis)


def sga(x, guidance):
  """Semi-global aggregation: 4 directional recurrences (down, up,
  right, left) mixed per pixel, max-selected as in GANet's SGA.

  x: [B, C, H, W]; guidance: [B, 4, 2, H, W] — per direction a pair
  (g0, g1) with g0 + g1 = 1 (weight on the current cost vs the carried
  aggregate). Returns [B, C, H, W].
  """
  outs = []
  dirs = [(2, False), (2, True), (3, False), (3, True)]
  for d, (axis, rev) in enumerate(dirs):
    g0 = guidance[:, d, 0][:, None]  # [B, 1, H, W]
    g1 = guidance[:, d, 1][:, None]
    outs.append(_directional_scan(x, g0, g1, axis, rev))
  # GANet takes the max over directions after aggregation
  return jnp.max(jnp.stack(outs, 0), axis=0)


def lga(x, filters):
  """Local guided aggregation: per-pixel 3x3 filtering of the cost with
  spatially-varying weights (GANet LGA).

  x: [B, C, H, W]; filters: [B, 9, H, W] (3x3 weights per pixel).
  """
  B, C, H, W = x.shape
  pads = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
          (1, -1), (1, 0), (1, 1)]
  xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
  out = jnp.zeros_like(x)
  for k, (dy, dx) in enumerate(pads):
    shifted = xp[:, :, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
    out = out + shifted * filters[:, k][:, None]
  return out


def nlf(x, g_down, g_up, g_left, g_right):
  """Non-local filtering: four full-image directional recurrences
  applied sequentially (GANet NLF_down/up/left/right composition).

  x: [B, C, H, W]; each g: [B, 1, H, W] carry weight in [0, 1).
  """
  out = x
  for g, (axis, rev) in zip(
      (g_down, g_up, g_right, g_left),
      [(2, False), (2, True), (3, False), (3, True)]):
    out = _directional_scan(out, 1.0 - g, g, axis, rev)
  return out


def cost_volume(feat0, feat1, max_disp: int):
  """Correlation cost volume over horizontal displacement
  (GANet costvolume.cu behavior for stereo/flow-x).

  feat0/feat1: [B, C, H, W] -> [B, max_disp, H, W] correlation.
  """
  B, C, H, W = feat0.shape
  vols = []
  for d in range(max_disp):
    shifted = jnp.pad(feat1, ((0, 0), (0, 0), (0, 0), (d, 0)))[
        :, :, :, :W]
    vols.append(jnp.mean(feat0 * shifted, axis=1))
  return jnp.stack(vols, axis=1)
