"""Chunked full-image rendering over the device mesh.

Behavioral parity target: reference s-nerf/model/models.py:328-360
(render_image: chunk rays, pad to device count, DataParallel scatter,
unshard) and zipnerf models.py:723-813 (per-rank slice + gather).

TPU-native: each chunk is batch-sharded over the mesh data axis with pjit
in-shardings; XLA gathers the output tiles (SURVEY §5.7 — ray-batch
sharding IS the context-parallelism analog here, no halo needed).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import numpy as np

from snerf_tpu.ops.rays import Rays, pad_rays


def render_rays_chunked(render_fn: Callable[[Rays], dict],
                        rays: Rays,
                        chunk: int = 4096,
                        mesh=None):
  """Apply a jitted per-chunk render fn over a flat [N] ray bundle.

  render_fn: Rays -> dict of [N, ...] arrays. Returns dict of np arrays.
  """
  n = rays.origins.shape[0]
  n_dev = mesh.devices.size if mesh is not None else 1
  outs = []
  for start in range(0, n, chunk):
    stop = min(start + chunk, n)
    sl = jax.tree_util.tree_map(lambda x: x[start:stop], rays)
    pad_to = max(((stop - start + n_dev - 1) // n_dev) * n_dev, n_dev)
    sl = pad_rays(sl, pad_to)
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      sh = NamedSharding(mesh, P(mesh.axis_names[0]))
      sl = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), sl)
    out = render_fn(sl)
    out = jax.tree_util.tree_map(
        lambda x: np.asarray(x[:stop - start]), out)
    outs.append(out)
  return jax.tree_util.tree_map(
      lambda *xs: np.concatenate(xs, axis=0), *outs)


def render_image(render_fn: Callable[[Rays], dict],
                 rays: Rays,
                 chunk: int = 4096,
                 mesh=None):
  """Render a full [H, W] ray grid; returns dict of [H, W, ...] arrays."""
  H, W = rays.origins.shape[:2]
  flat = jax.tree_util.tree_map(
      lambda x: x.reshape(-1, x.shape[-1]), rays)
  out = render_rays_chunked(render_fn, flat, chunk=chunk, mesh=mesh)
  return jax.tree_util.tree_map(
      lambda x: x.reshape(H, W, *x.shape[1:]), out)


def render_rays_scan(render_fn: Callable[[Rays], dict],
                     rays: Rays,
                     chunk: int = 4096,
                     mesh=None):
  """On-device whole-bundle render: lax.scan over chunks, ONE dispatch.

  The chunked host loop costs one host<->device round trip per chunk
  (the reference pattern, models.py:328-360). Here the whole flat ray
  bundle is padded to a chunk multiple, reshaped to [n_chunks, chunk],
  and a lax.scan applies the per-chunk render on device — the image
  never leaves HBM until one final fetch. On the tunneled v5e this
  removes ~25 ms RTT per chunk (12 round trips for a 256x384 image);
  serving-path win, same numerics.

  render_fn must be jit-compatible (NOT pre-jitted is fine too) and
  hashable-stable across calls (pass the same function object to reuse
  the compile). Returns dict of np arrays [N, ...].
  """
  n = rays.origins.shape[0]
  n_dev = mesh.devices.size if mesh is not None else 1
  chunk = max(((chunk + n_dev - 1) // n_dev) * n_dev, n_dev)
  n_pad = ((n + chunk - 1) // chunk) * chunk
  flat = pad_rays(rays, n_pad)
  n_chunks = n_pad // chunk
  batched = jax.tree_util.tree_map(
      lambda x: x.reshape(n_chunks, chunk, *x.shape[1:]), flat)

  shard = None
  if mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    batched = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batched)
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))

  # A functools.partial render_fn (the params-as-argument pattern) is
  # split so its bound arrays enter the scan jit as TRACED inputs; as a
  # plain closure they would lower to HLO constants — multi-MB params
  # embedded in the program body, which the tunneled TPU's
  # remote-compile endpoint rejects (HTTP 413, PERF.md).
  if isinstance(render_fn, functools.partial) and not render_fn.keywords:
    fn, bound = render_fn.func, render_fn.args
  else:
    fn, bound = render_fn, ()
  out = _scan_render(batched, fn, shard, *bound)
  return jax.tree_util.tree_map(lambda x: np.asarray(x[:n]), out)


@functools.partial(jax.jit, static_argnames=("render_fn", "shard"))
def _scan_render(batched, render_fn, shard, *bound):
  """Module-level jit so repeated renders (per-image eval loops) reuse
  the compiled scan instead of retracing a per-call closure — one
  compile per (render_fn, shapes, sharding)."""
  def body(_, r):
    out = render_fn(*bound, r)
    if shard is not None:
      out = jax.tree_util.tree_map(
          lambda x: jax.lax.with_sharding_constraint(x, shard), out)
    return 0, out
  _, outs = jax.lax.scan(body, 0, batched)
  return jax.tree_util.tree_map(
      lambda x: x.reshape(-1, *x.shape[2:]), outs)


def render_image_scan(render_fn: Callable[[Rays], dict],
                      rays: Rays,
                      chunk: int = 4096,
                      mesh=None):
  """render_image via the single-dispatch on-device scan path."""
  H, W = rays.origins.shape[:2]
  flat = jax.tree_util.tree_map(
      lambda x: x.reshape(-1, x.shape[-1]), rays)
  out = render_rays_scan(render_fn, flat, chunk=chunk, mesh=mesh)
  return jax.tree_util.tree_map(
      lambda x: x.reshape(H, W, *x.shape[1:]), out)


def make_eval_render_fn(model, params, white_bkgd: bool = False,
                        viewc=None):
  """Jitted deterministic render of the fine level (eval.py:133-169).

  params are bound via functools.partial over a params-as-ARGUMENT jit,
  NOT a closure: closed-over device arrays become HLO constants, which
  (a) retraces per param value and (b) embeds multi-MB tables into the
  program — the tunneled TPU's remote-compile endpoint rejects such
  bodies outright (HTTP 413, PERF.md).
  """

  @jax.jit
  def render_fn(p, rays: Rays):
    ret = model.apply({"params": p}, rays, rng=None,
                      white_bkgd=white_bkgd, viewc=viewc)
    fine = ret[-1]
    out = {"rgb": fine["rgb"], "distance": fine["distance"][..., None],
           "acc": fine["acc"][..., None]}
    if fine.get("semantic") is not None:
      out["semantic"] = fine["semantic"]
    return out

  return functools.partial(render_fn, params)


@functools.lru_cache(maxsize=8)
def make_zip_param_render_fn(model):
  """Params-as-ARGUMENT jitted zip-nerf eval render (one compile per
  model config; bind params with functools.partial — see
  make_eval_render_fn on why closures are forbidden here)."""

  @jax.jit
  def render_fn(p, rays):
    rend, _ = model.apply({"params": p}, rays, rng=None)
    fine = rend[-1]
    out = {"rgb": fine["rgb"], "distance": fine["depth"][..., None],
           "acc": fine["acc"][..., None]}
    if fine.get("semantic") is not None:
      out["semantic"] = fine["semantic"]
    return out

  return render_fn


@functools.lru_cache(maxsize=8)
def make_param_render_fn(model, white_bkgd: bool = False):
  """Like make_eval_render_fn but params are an ARGUMENT: the compile is
  reused across parameter values (periodic in-training evals would
  otherwise retrace per call — params were baked in as constants).
  flax modules are frozen dataclasses, so the lru_cache key is stable
  per model configuration."""

  @jax.jit
  def render_fn(params, rays: Rays):
    ret = model.apply({"params": params}, rays, rng=None,
                      white_bkgd=white_bkgd)
    fine = ret[-1]
    out = {"rgb": fine["rgb"], "distance": fine["distance"][..., None],
           "acc": fine["acc"][..., None]}
    if fine.get("semantic") is not None:
      out["semantic"] = fine["semantic"]
    return out

  return render_fn


def pred2real(pred_distance, near, far):
  """Disparity-space prediction -> metric depth (eval.py:28-30 parity):
  d = 1 / (s/far + (1-s)/near). Only used for models whose rendered
  `distance` lives in normalized disparity space."""
  return 1.0 / (pred_distance / far + (1.0 - pred_distance) / near)
