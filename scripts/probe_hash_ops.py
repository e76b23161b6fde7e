"""Measure the primitive costs that bound the hash-grid step on v5e:
XLA gather formulations, scatter-add, one-hot matmul, sort, and the
Pallas gather+select block kernel."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(tag, f, *args, n=10):
  out = f(*args)
  _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
  t0 = time.perf_counter()
  for _ in range(n):
    out = f(*args)
  _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
  dt = (time.perf_counter() - t0) / n
  print(f"{tag}: {dt*1e3:.2f} ms", flush=True)
  return dt


def main():
  NQ = 4_000_000          # ~1 hashed level's worth of corner lookups / 9
  T = 2 ** 21
  C = 4
  rng = np.random.RandomState(0)
  idx = jnp.asarray(rng.randint(0, T, NQ), jnp.int32)
  table = jnp.asarray(rng.rand(T, C), jnp.float32)
  g = jnp.asarray(rng.rand(NQ, C), jnp.float32)

  # 1. XLA row gather
  f1 = jax.jit(lambda t, i: t[i].sum())
  d = timeit("xla row gather  [4M from 2^21 x 4]", f1, table, idx)
  print(f"   -> {NQ/d/1e6:.0f} M idx/s")

  # 2. XLA flat gather (table flattened, fetch 4 scalars per row)
  flat = table.ravel()
  fi = (idx[:, None] * C + jnp.arange(C)[None]).ravel()
  f2 = jax.jit(lambda t, i: t[i].sum())
  d = timeit("xla flat gather [16M scalars]", f2, flat, fi)
  print(f"   -> {NQ/d/1e6:.0f} M row/s")

  # 3. XLA scatter-add (the autodiff backward of 1)
  f3 = jax.jit(lambda t, i, g: jnp.zeros_like(t).at[i].add(g).sum())
  d = timeit("xla scatter-add [4M into 2^21 x 4]", f3, table, idx, g)
  print(f"   -> {NQ/d/1e6:.0f} M idx/s")

  # 4. sort 4M int32 (the bucketing primitive)
  f4 = jax.jit(lambda i: jnp.sort(i)[0])
  timeit("xla sort 4M int32", f4, idx)
  f4b = jax.jit(lambda i: jnp.argsort(i)[0])
  timeit("xla argsort 4M int32", f4b, idx)

  # 5. scatter-add with SORTED indices
  sidx = jnp.sort(idx)
  f5 = jax.jit(lambda t, i, g: jnp.zeros_like(t).at[i].add(
      g, indices_are_sorted=True, unique_indices=False).sum())
  timeit("xla scatter-add sorted", f5, table, sidx, g)

  # 6. segment_sum with sorted indices
  f6 = jax.jit(lambda i, g: jax.ops.segment_sum(
      g, i, num_segments=T, indices_are_sorted=True).sum())
  timeit("xla segment_sum sorted", f6, sidx, g)

  # 7. Pallas gather+select within a small dense table (level-0 scale):
  # table [8, 4992] f32 = 39 blocks of 128 lanes; queries in vregs.
  TB = 4992
  nq2 = 2 ** 20

  def kern(tab_ref, idx_ref, o_ref):
    tab = tab_ref[:]          # [8, TB] (rows = 4 channels padded to 8)
    qi = idx_ref[:]           # [8, NL] int32 row ids in [0, TB)
    blk = qi // 128
    lane = qi % 128
    out = jnp.zeros(qi.shape, jnp.float32)
    for b in range(TB // 128):
      gb = jnp.take_along_axis(tab[:, b * 128:(b + 1) * 128], lane, axis=1)
      out = jnp.where(blk == b, gb, out)
    o_ref[:] = out

  NL = nq2 // 8
  tab2 = jnp.asarray(rng.rand(8, TB), jnp.float32)
  qidx = jnp.asarray(rng.randint(0, TB, (8, NL)), jnp.int32)

  @jax.jit
  def f7(tab, qi):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, NL), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, qi).sum()

  try:
    d = timeit("pallas gather+select [1M from 4992-row dense]", f7, tab2,
               qidx)
    print(f"   -> {nq2/d/1e6:.0f} M idx/s", flush=True)
  except Exception as e:  # noqa: BLE001
    print("pallas gather+select FAILED:", str(e).split(chr(10))[0][:120])


if __name__ == "__main__":
  main()
