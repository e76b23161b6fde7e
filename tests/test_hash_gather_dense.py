"""Pallas dense-level gather kernel: parity vs the XLA row gather and
the hash encoder (interpret mode on CPU; chip numbers in PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops.pallas.hash_gather_dense import (
    gather_rows_dense, hash_gather_dense)


def test_gather_rows_dense_matches_xla():
  rng = np.random.RandomState(0)
  table = jnp.asarray(rng.rand(300, 4), np.float32)   # pads to 384 rows
  idx = jnp.asarray(rng.randint(0, 300, 3000), np.int32)
  out = gather_rows_dense(table, idx, interpret=True)
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(table)[np.asarray(idx)])


def test_hash_gather_dense_backward_scatter():
  rng = np.random.RandomState(1)
  table = jnp.asarray(rng.rand(256, 4), np.float32)
  idx = jnp.asarray(rng.randint(0, 256, 2048), np.int32)

  def loss(t):
    return (hash_gather_dense(t, idx, True) ** 2).sum()

  g = jax.grad(loss)(table)
  # dense reference gradient
  ref = np.zeros((256, 4), np.float32)
  rows = np.asarray(table)[np.asarray(idx)]
  np.add.at(ref, np.asarray(idx), 2 * rows)
  np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-5, atol=1e-5)
