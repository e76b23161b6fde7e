"""Probe tpu.dynamic_gather via Pallas take_along_axis: correctness across
vreg boundaries (lane dim > 128, sublane dim > 8) and throughput."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_lane(x_ref, idx_ref, o_ref):
  o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def kernel_sub(x_ref, idx_ref, o_ref):
  o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def run(kernel, x, idx):
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
  )(x, idx)


def test_correct(tag, kernel, axis, S, L, dtype=jnp.float32):
  x = jnp.arange(S * L, dtype=dtype).reshape(S, L)
  rng = np.random.RandomState(0)
  idx = jnp.asarray(rng.randint(0, x.shape[axis], (S, L)), jnp.int32)
  try:
    out = jax.jit(functools.partial(run, kernel))(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
    ok = np.array_equal(np.asarray(out), ref)
    print(f"{tag} S={S} L={L} {np.dtype(dtype).name}: "
          f"{'CORRECT' if ok else 'WRONG'}", flush=True)
    return ok
  except Exception as e:  # noqa: BLE001
    msg = str(e).split("\n")[0][:110]
    print(f"{tag} S={S} L={L}: FAIL {type(e).__name__}: {msg}", flush=True)
    return False


def bench(tag, kernel, axis, S, L, n=30):
  x = jnp.arange(S * L, dtype=jnp.float32).reshape(S, L)
  rng = np.random.RandomState(0)
  idx = jnp.asarray(rng.randint(0, x.shape[axis], (S, L)), jnp.int32)
  f = jax.jit(lambda x, i: run(kernel, x, i).sum())
  v = float(f(x, idx))
  t0 = time.perf_counter()
  for _ in range(n):
    v = f(x, idx)
  v = float(v)
  dt = (time.perf_counter() - t0) / n
  rate = S * L / dt
  print(f"{tag} S={S} L={L}: {dt*1e3:.2f} ms = {rate/1e9:.2f} G idx/s",
        flush=True)


if __name__ == "__main__":
  # lane gather (dim=1): does idx address the full lane range?
  test_correct("lane", kernel_lane, 1, 8, 128)
  test_correct("lane", kernel_lane, 1, 8, 512)
  test_correct("lane", kernel_lane, 1, 8, 4096)
  test_correct("lane", kernel_lane, 1, 16, 32768)
  # sublane gather (dim=0): across the 8-sublane vreg boundary?
  test_correct("sub ", kernel_sub, 0, 8, 128)
  test_correct("sub ", kernel_sub, 0, 64, 128)
  test_correct("sub ", kernel_sub, 0, 1024, 128)
  # throughput on whatever worked
  bench("lane", kernel_lane, 1, 8, 4096)
  bench("lane", kernel_lane, 1, 64, 4096)
  bench("lane", kernel_lane, 1, 8, 131072)
  bench("lane", kernel_lane, 1, 64, 131072)
