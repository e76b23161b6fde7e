"""TPU-tuned primitives for the hash-grid encoder hot path.

The instant-NGP table ops (reference gridencoder.cu:50-160) are random
row gathers (forward) and random row scatter-adds (backward). On TPU v5e
these bound the zip-nerf hash path (PERF.md): there is no scatter
primitive, tpu.dynamic_gather is single-vreg, and there is no SparseCore,
so both directions ride XLA's serial gather/scatter unit. This module
ships the best measured formulations:

  - gather_rows: flat row-form gather (measured 169 M idx/s — 5x the
    flattened-scalar form, 1.5x the [N, 8]-batched form).
  - scatter_add_rows: custom-VJP-free helper with two backends:
      'xla'    — plain .at[].add (baseline)
      'sorted' — argsort + permuted-cumsum + boundary gathers, turning
                 the scatter into sorts/gathers (wins when the XLA
                 scatter regresses; both measured in PERF.md).
  - hash_gather: gather_rows with a custom VJP that routes the table
    gradient through scatter_add_rows, so the encoder's backward uses
    the fast path under jax.grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather_rows(table, idx):
  """table [T, C], idx [...] int32 -> [..., C] via ONE flat row gather."""
  flat = idx.reshape(-1)
  rows = jnp.take(table, flat, axis=0)
  return rows.reshape(*idx.shape, table.shape[-1])


def scatter_add_rows(idx, g, num_rows: int, backend: str = "xla"):
  """dT [num_rows, C] with dT[idx[q]] += g[q]. idx [Q], g [Q, C]."""
  if backend == "xla":
    return jnp.zeros((num_rows, g.shape[-1]), g.dtype).at[idx].add(g)
  if backend == "sorted":
    return _scatter_add_sorted(idx, g, num_rows)
  raise ValueError(backend)


def _scatter_add_sorted(idx, g, num_rows: int):
  """Gather-only scatter-add: sort updates by row, cumsum, per-row
  segment bounds by binary search (gathers), difference of cumsums."""
  order = jnp.argsort(idx)
  sidx = idx[order]
  sg = g[order]
  csum = jnp.cumsum(sg.astype(jnp.float32), axis=0)
  csum = jnp.concatenate([jnp.zeros_like(csum[:1]), csum], axis=0)
  rows = jnp.arange(num_rows, dtype=idx.dtype)
  lo = jnp.searchsorted(sidx, rows)
  hi = jnp.searchsorted(sidx, rows + 1)
  return (csum[hi] - csum[lo]).astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_gather(table, idx, backend: str = "xla"):
  """Differentiable (w.r.t. table) row gather with a routed backward."""
  return gather_rows(table, idx)


def _hash_gather_fwd(table, idx, backend):
  return gather_rows(table, idx), (idx, table.shape[0])


def _hash_gather_bwd(backend, res, ct):
  idx, num_rows = res
  flat_idx = idx.reshape(-1)
  flat_ct = ct.reshape(-1, ct.shape[-1])
  dtable = scatter_add_rows(flat_idx, flat_ct, num_rows, backend=backend)
  return (dtable, None)


hash_gather.defvjp(_hash_gather_fwd, _hash_gather_bwd)
