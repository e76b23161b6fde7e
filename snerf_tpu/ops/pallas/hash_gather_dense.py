"""Pallas VMEM gather kernel for DENSE (small-table) hash-grid levels.

The instant-NGP encoder's hot op is random row gathers from per-level
tables (gridencoder.cu:50-160). On v5e the only hardware gather is
`tpu.dynamic_gather` within a single (8, 128) vreg (PERF.md), so this
kernel keeps the level table resident in VMEM laid out channels-on-
sublanes ([C<=8, T] -> lane-blocks of 128 rows) and resolves each
128-query vreg with one gather + select per table block:

    out[:, q] = table[:, idx[q]]  via  sum_b select(idx//128 == b,
                                       gather(table_block_b, idx % 128))

Cost is O(#queries/128 * T/128) vreg ops — profitable only for tables
up to a few tens of thousands of rows (the dense levels 0-1; hashed
2^21 levels would need 16384 blocks/vreg and stay on the XLA path).
Backward (scatter-add) has no TPU primitive and routes through
ops.hash_ops.scatter_add_rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 2048  # queries per grid step (16 vregs of 128)


def _kernel(tab_ref, idx_ref, o_ref, *, n_blocks: int):
  for q in range(QBLOCK // 128):
    qi = idx_ref[:, q * 128:(q + 1) * 128]   # [8, 128] (same per sublane)
    lane = qi % 128
    blk = qi // 128

    def body(b, acc):
      tb = tab_ref[:, pl.ds(pl.multiple_of(b * 128, 128), 128)]
      gb = jnp.take_along_axis(tb, lane, axis=1)
      return jnp.where(blk == b, gb, acc)

    out = jax.lax.fori_loop(0, n_blocks, body,
                            jnp.zeros((8, 128), o_ref.dtype))
    o_ref[:, q * 128:(q + 1) * 128] = out


def gather_rows_dense(table, idx, interpret: bool = False):
  """table [T, C<=8] f32, idx [N] int32 -> [N, C].

  T is padded to a multiple of 128; N to a multiple of QBLOCK.
  """
  T, C = table.shape
  assert C <= 8, "channels ride the sublane dim"
  n = idx.shape[0]
  Tp = ((T + 127) // 128) * 128
  npad = ((n + QBLOCK - 1) // QBLOCK) * QBLOCK
  tab8 = jnp.zeros((8, Tp), table.dtype).at[:C, :T].set(table.T)
  idxp = jnp.zeros((npad,), jnp.int32).at[:n].set(idx)
  idx8 = jnp.broadcast_to(idxp.reshape(1, -1), (8, npad))

  grid = (npad // QBLOCK,)
  out8 = pl.pallas_call(
      functools.partial(_kernel, n_blocks=Tp // 128),
      grid=grid,
      in_specs=[
          pl.BlockSpec((8, Tp), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((8, QBLOCK), lambda i: (0, i),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((8, QBLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((8, npad), table.dtype),
      interpret=interpret,
  )(tab8, idx8)
  return out8[:C, :n].T


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_gather_dense(table, idx, interpret: bool = False):
  """Differentiable-in-table dense-level gather (Pallas forward, XLA
  scatter-add backward)."""
  return gather_rows_dense(table, idx, interpret)


def _fwd(table, idx, interpret):
  return gather_rows_dense(table, idx, interpret), (idx, table.shape[0])


def _bwd(interpret, res, ct):
  from snerf_tpu.ops.hash_ops import scatter_add_rows
  idx, num_rows = res
  return (scatter_add_rows(idx, ct, num_rows), None)


hash_gather_dense.defvjp(_fwd, _bwd)
