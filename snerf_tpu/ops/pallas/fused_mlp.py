"""Fused multi-layer MLP Pallas kernel (TPU).

The NeRF hot path evaluates a deep uniform-width MLP over ~0.5M points
per step. XLA materializes every layer's activations to HBM
([N, 1024] bf16 = 1 GB read+written per layer), ~40 ms/step at bench
shapes. This kernel keeps the activation tile resident in VMEM across
ALL layers — the TPU analog of tcnn's fully-fused MLP (the trick the
reference's GPU ecosystem uses for instant-NGP).

v5e VMEM is 16 MB, so the weight stack (8 x 1024^2) cannot live in VMEM:
weights stay in HBM and are DMA'd layer-by-layer into a double-buffered
VMEM scratch, overlapping the next layer's fetch with the current
layer's MXU work. Only the input tile and final output touch HBM.

Backward: custom VJP with checkpoint-style recompute (XLA matmuls) —
fusing the backward is round-2 work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
  return ((x + m - 1) // m) * m


def _fwd_kernel(x_ref, w_hbm, b_ref, out_ref, w_buf, sem,
                *, n_layers: int, last_relu: bool):
  """x_ref [T, D] VMEM; w_hbm [L, D, D] ANY/HBM; b_ref [L, 1, D] VMEM;
  w_buf [2, D, D] VMEM scratch; sem DMA semaphores [2]."""

  def fetch(layer, slot):
    return pltpu.make_async_copy(w_hbm.at[layer], w_buf.at[slot],
                                 sem.at[slot])

  fetch(0, 0).start()
  h = x_ref[:]
  for i in range(n_layers):
    slot = i % 2
    if i + 1 < n_layers:
      fetch(i + 1, (i + 1) % 2).start()
    fetch(i, slot).wait()
    h = jnp.dot(h, w_buf[slot], preferred_element_type=jnp.float32)
    h = h + b_ref[i]
    if i < n_layers - 1 or last_relu:
      h = jnp.maximum(h, 0.0)
    h = h.astype(x_ref.dtype)
  out_ref[:] = h


def _fwd(x, w_stack, b_stack, tile: int, last_relu: bool,
         interpret: bool = False):
  n, d = x.shape
  n_layers = w_stack.shape[0]
  n_pad = _round_up(max(n, tile), tile)
  if n_pad != n:
    x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

  out = pl.pallas_call(
      functools.partial(_fwd_kernel, n_layers=n_layers,
                        last_relu=last_relu),
      grid=(n_pad // tile,),
      in_specs=[
          pl.BlockSpec((tile, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pl.ANY),      # weights stay in HBM
          pl.BlockSpec(memory_space=pltpu.VMEM),  # biases (small)
      ],
      out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, d, d), w_stack.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(x, w_stack, b_stack)
  return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mlp(x, w_stack, b_stack, tile: int = 512,
              last_relu: bool = True, interpret: bool = False):
  """Uniform-width relu MLP: x [N, D] -> [N, D].

  w_stack [L, D, D], b_stack [L, 1, D]; D must be a multiple of 128
  (pad with pad_width). last_relu controls the final activation.
  """
  return _fwd(x, w_stack, b_stack, tile, last_relu, interpret)


def _fused_fwd(x, w_stack, b_stack, tile, last_relu, interpret):
  out = _fwd(x, w_stack, b_stack, tile, last_relu, interpret)
  return out, (x, w_stack, b_stack)


def _fused_bwd(tile, last_relu, interpret, res, g):
  """Checkpoint-style backward: recompute activations, then standard
  matmul grads (through XLA for round 1)."""
  x, w_stack, b_stack = res
  n_layers = w_stack.shape[0]

  acts = [x]
  h = x
  for i in range(n_layers):
    z = jnp.dot(h, w_stack[i], preferred_element_type=jnp.float32) \
        + b_stack[i]
    relu = i < n_layers - 1 or last_relu
    h = (jnp.maximum(z, 0.0) if relu else z).astype(x.dtype)
    acts.append(h)

  dh = g.astype(jnp.float32)
  dws, dbs = [], []
  for i in range(n_layers - 1, -1, -1):
    relu = i < n_layers - 1 or last_relu
    if relu:
      dh = dh * (acts[i + 1] > 0)
    a = acts[i].astype(jnp.float32)
    dws.append(jnp.einsum("nd,nk->dk", a, dh).astype(w_stack.dtype))
    dbs.append(jnp.sum(dh, axis=0, keepdims=True).astype(b_stack.dtype))
    dh = jnp.dot(dh, w_stack[i].T.astype(jnp.float32))
  dx = dh.astype(x.dtype)
  return dx, jnp.stack(dws[::-1]), jnp.stack(dbs[::-1])


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


def pad_width(x, multiple: int = 128):
  """Zero-pad the last dim up to a multiple (for kernel alignment)."""
  d = x.shape[-1]
  target = _round_up(d, multiple)
  if target == d:
    return x
  return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target - d)])
