"""Probe the v5e int8 MXU path: dot rate + fused quantize costs."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(tag, fn, *args, n=20, flops=None):
  out = fn(*args)
  _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
  dt = (time.perf_counter() - t0) / n
  msg = f"{tag}: {dt*1e3:.2f} ms"
  if flops:
    msg += f" = {flops/dt/1e12:.0f} TFLOP/s"
  print(msg, flush=True)
  return dt


def main():
  M, K, N = 524288, 1024, 1024
  flops = 2 * M * K * N
  kx, kw = jax.random.split(jax.random.PRNGKey(0))
  x16 = (jax.random.normal(kx, (M, K)) * 10).astype(jnp.bfloat16)
  w16 = (jax.random.normal(kw, (K, N))).astype(jnp.bfloat16)
  x8 = (jax.random.normal(kx, (M, K)) * 10).astype(jnp.int8)
  w8 = (jax.random.normal(kw, (K, N)) * 10).astype(jnp.int8)

  @jax.jit
  def dot16(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32).sum()

  @jax.jit
  def dot8(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).sum()

  @jax.jit
  def dot8_chain(x, w):
    # int8 matmul -> rescale -> relu -> requantize -> int8 matmul:
    # the realistic quantized-MLP inner pattern (fusion test)
    y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * (1.0 / 127.0)
    yf = jax.nn.relu(yf)
    s = jnp.max(jnp.abs(yf), axis=-1, keepdims=True) / 127.0
    yq = jnp.clip(jnp.round(yf / s), -127, 127).astype(jnp.int8)
    y2 = jax.lax.dot_general(yq, w, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    return y2.sum()

  timeit("bf16 dot", dot16, x16, w16, flops=flops)
  timeit("int8 dot", dot8, x8, w8, flops=flops)
  timeit("int8 dot chain(2) +quant", dot8_chain, x8, w8, flops=2 * flops)


if __name__ == "__main__":
  main()
