"""Fused-MLP fwd+bwd decision measurement (VERDICT r3 next #7).

The Pallas fused-MLP forward measured 151 TFLOP/s vs XLA's 182 at
524288x1024x8 bf16 (PERF.md); its backward is checkpoint-recompute
through XLA matmuls. This probe times the full value_and_grad step for
(a) the Pallas-fwd + recompute-bwd path and (b) plain XLA, so the
ship-or-retire decision rests on a measured fwd+bwd number.

Run on the chip: python scripts/probe_fused_mlp_bwd.py [N D L]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.ops.pallas.fused_mlp import fused_mlp


def main():
  N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
  D = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
  L = int(sys.argv[3]) if len(sys.argv) > 3 else 8
  dtype = jnp.bfloat16

  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    key = jax.random.PRNGKey(0)
    kx, kw, kb = jax.random.split(key, 3)
    x = (jax.random.normal(kx, (N, D), jnp.float32) / np.sqrt(D))
    w = (jax.random.normal(kw, (L, D, D), jnp.float32) / np.sqrt(D))
    b = jnp.zeros((L, 1, D), jnp.float32)
  dev = jax.devices()[0]
  x = jax.device_put(x.astype(dtype), dev)
  w = jax.device_put(w.astype(dtype), dev)
  b = jax.device_put(b.astype(dtype), dev)

  def xla_mlp(x, w, b):
    h = x
    for i in range(L):
      h = jnp.maximum(
          jnp.dot(h, w[i], preferred_element_type=jnp.float32) + b[i],
          0.0).astype(x.dtype)
    return h

  @jax.jit
  def step_fused(x, w, b):
    loss, grads = jax.value_and_grad(
        lambda w_, b_: jnp.sum(fused_mlp(x, w_, b_).astype(jnp.float32)),
        argnums=(0, 1))(w, b)
    return loss, grads

  @jax.jit
  def step_xla(x, w, b):
    loss, grads = jax.value_and_grad(
        lambda w_, b_: jnp.sum(xla_mlp(x, w_, b_).astype(jnp.float32)),
        argnums=(0, 1))(w, b)
    return loss, grads

  flops = 2 * N * D * D * L * 3   # fwd + dW + dX
  for name, fn in (("xla", step_xla), ("pallas_fwd+recompute_bwd",
                                       step_fused)):
    loss, grads = fn(x, w, b)     # compile
    float(loss)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
      loss, grads = fn(x, w, b)
    float(loss)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1e3:.1f} ms/step = {flops / dt / 1e12:.1f} "
          f"TFLOP/s (N={N} D={D} L={L} bf16)", flush=True)


if __name__ == "__main__":
  main()
