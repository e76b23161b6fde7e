"""Prototype fast scatter-add designs for the hash-grid backward on v5e.

dT[idx[q]] += g[q]  for q in [0, Q), T rows, C=4.

Design A (XLA baseline): .at[idx].add(g)            -> ~24 M idx/s
Design B: sort by idx, then lax.scan over chunks; each chunk does a
  one-hot MXU matmul against a 256-row window anchored at the chunk's
  (128-aligned) min row, accumulated into the table with
  dynamic_update_slice. Sorted chunks span few rows, so a 512-chunk fits
  a 256-row window with high probability; stragglers fall back to a
  second window pass.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(tag, f, *args, n=5):
  out = f(*args)
  _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
  t0 = time.perf_counter()
  for _ in range(n):
    out = f(*args)
  _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
  dt = (time.perf_counter() - t0) / n
  print(f"{tag}: {dt*1e3:.1f} ms", flush=True)
  return dt


CHUNK = 1024
WIN = 2048  # window rows per chunk (multiple of 8)


def scatter_add_sorted_mxu(idx, g, num_rows):
  """Sorted chunked-window scatter-add. idx [Q] int32, g [Q, C]."""
  q, c = g.shape
  pad = (-q) % CHUNK
  if pad:
    idx = jnp.concatenate([idx, jnp.full((pad,), num_rows, jnp.int32)])
    g = jnp.concatenate([g, jnp.zeros((pad, c), g.dtype)])
  order = jnp.argsort(idx)
  sidx = idx[order]
  sg = g[order]
  nchunk = sidx.shape[0] // CHUNK
  sidx_c = sidx.reshape(nchunk, CHUNK)
  sg_c = sg.reshape(nchunk, CHUNK, c)
  base = (sidx_c[:, 0] // 8) * 8  # window anchor, 8-aligned
  # out-of-window updates (chunk straddles > WIN rows) fall back to XLA
  # scatter; with sorted uniform data this is rare.
  local = sidx_c - base[:, None]
  in_win = (local >= 0) & (local < WIN) & (sidx_c < num_rows)
  table = jnp.zeros((num_rows + WIN, c), g.dtype)  # tail pad for windows

  def body(tab, args):
    b, li, gi, m = args
    onehot = jax.nn.one_hot(jnp.where(m, li, WIN), WIN,
                            dtype=gi.dtype)            # [CHUNK, WIN]
    upd = onehot.T @ gi                                # [WIN, C]
    cur = jax.lax.dynamic_slice(tab, (b, 0), (WIN, c))
    tab = jax.lax.dynamic_update_slice(tab, cur + upd, (b, 0))
    return tab, None

  table, _ = jax.lax.scan(body, table, (base, local, sg_c, in_win))
  # stragglers
  rest_idx = jnp.where(in_win | (sidx_c >= num_rows), num_rows,
                       sidx_c).reshape(-1)
  table = table.at[rest_idx].add(sg_c.reshape(-1, c), mode="drop")
  return table[:num_rows]


def main():
  T = 2 ** 21
  C = 4
  for Q in (4_000_000, 33_000_000):
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, T, Q), jnp.int32)
    g = jnp.asarray(rng.rand(Q, C), np.float32)

    fB = jax.jit(functools.partial(scatter_add_sorted_mxu, num_rows=T))
    d = timeit(f"B sorted-mxu Q={Q}", fB, idx, g, n=3)
    print(f"   -> {Q/d/1e6:.0f} M idx/s", flush=True)

    if Q == 4_000_000:
      fA = jax.jit(lambda t, i, gg: jnp.zeros((T, C), jnp.float32)
                   .at[i].add(gg))
      d = timeit(f"A xla scatter Q={Q}", fA, None, idx, g, n=3)
      print(f"   -> {Q/d/1e6:.0f} M idx/s", flush=True)
      # correctness
      a = np.zeros((T, C), np.float32)
      np.add.at(a, np.asarray(idx), np.asarray(g))
      b = np.asarray(fB(idx, g))
      err = np.abs(a - b).max()
      print(f"   max err vs numpy: {err}", flush=True)


if __name__ == "__main__":
  main()
