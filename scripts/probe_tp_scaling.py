"""Virtual-mesh TP scaling probe (VERDICT r3 next #10).

Compares the mip trainer under pure data parallelism (8x1) vs 2-D
(data, model) tensor parallelism (4x2, 2x4) at EQUAL global batch on
the 8-device virtual CPU mesh — the perf datapoint behind the TP claim
that so far had only loss-equality evidence
(tests/test_tensor_parallel.py).

What transfers from a virtual CPU mesh to real TPU hardware, and what
doesn't: this host has ONE physical core, so 8 virtual devices
timeshare it and wall-clock comparisons across mesh shapes measure
total work + scheduling, not the parallel step time a real 8-chip mesh
would see. The load-independent evidence reported instead:
  (a) the collective schedule XLA SPMD inserts for the sharding
      annotations (counted from optimized HLO),
  (b) per-device FLOPs / bytes from compiled.cost_analysis() — TP at
      equal global batch must cut per-device trunk FLOPs ~1/tp while
      adding all-reduce traffic,
  (c) loss equality across shapes (same step semantics).
Pass --time to additionally record the (contention-sensitive) wall
times. Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/probe_tp_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def collective_counts(compiled):
  """Instruction-definition counts per collective op in optimized HLO.

  Matches the op name at its call site `all-reduce(` (tuple-typed
  definitions wrap across lines, so line-oriented parsing misses
  them); operand USES are excluded because they carry a `%` prefix
  (`get-tuple-element(%all-reduce.36)`).
  """
  import re
  txt = compiled.as_text()
  out = {}
  for op in ("all-reduce", "all-gather", "reduce-scatter",
             "collective-permute", "all-to-all"):
    pat = re.compile(r"(?<![%\w-])" + re.escape(op)
                     + r"(?:-start)?\(")
    out[op] = len(pat.findall(txt))
  return out


def cost_stats(compiled):
  """Per-device flops / bytes from XLA's cost model (list per program;
  the SPMD partitioner emits one program, so take element 0)."""
  try:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return {"gflops": ca.get("flops", 0.0) / 1e9,
            "gbytes": ca.get("bytes accessed", 0.0) / 1e9}
  except Exception:
    return {"gflops": float("nan"), "gbytes": float("nan")}


def run(shape, batch, steps=6, hidden=1024, do_time=False):
  import jax.numpy as jnp
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.mipnerf import MipNerfConfig
  from snerf_tpu.parallel import make_mesh, make_mesh_2d
  from snerf_tpu.train.trainer import (
      TrainConfig, create_train_state, make_train_step)

  from snerf_tpu.parallel import shard_state

  dp, tp = shape
  mesh = make_mesh(jax.devices()) if tp == 1 else make_mesh_2d(dp, tp)
  scene = make_synthetic_scene(num_images=4, H=32, W=32)
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(num_samples=16, num_fine=16, hidden_layer=hidden,
                       proposal_hidden_layer=256, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=batch, depth_loss=True, proposal_loss=True,
                     n_iters=steps)
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  if tp > 1:
    # THE tensor-parallel entry point (parallel/tp.py): place params
    # (and Adam moments) with Megatron-style model-axis shardings; the
    # jit then infers in_shardings from the arrays and XLA SPMD inserts
    # the collectives. Without this the model axis is pure replication.
    state = shard_state(state, mesh)
  step = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                         scene.near, scene.far, donate=False, mesh=mesh)
  with mesh:
    # AOT-compile ONCE; reuse the executable for both the collective
    # census and the timing loop (a second trace via step() would
    # double the dominant CPU-compile cost). make_train_step returns
    # functools.partial(jit(train_step), bound) — unwrap it.
    jitted, bound = step.func, step.args
    compiled = jitted.lower(*bound, state, jax.random.PRNGKey(0)).compile()
    cc = collective_counts(compiled)
    cs = cost_stats(compiled)
    state, m = compiled(*bound, state, jax.random.PRNGKey(0))
    loss = float(m["loss"])          # also the loss-equality datapoint
    dt = float("nan")
    if do_time:
      t0 = time.perf_counter()
      for i in range(steps):
        state, m = compiled(*bound, state, jax.random.PRNGKey(i + 1))
      float(m["loss"])
      dt = (time.perf_counter() - t0) / steps
  return dt, cc, cs, loss


def main():
  do_time = "--time" in sys.argv
  batch = int(os.environ.get("TP_PROBE_BATCH", 1024))
  print(f"devices={jax.device_count()} global_batch={batch} "
        f"hidden=1024 (TP shards the wide trunk)")
  rows = []
  for shape in ((8, 1), (4, 2), (2, 4)):
    dt, cc, cs, loss = run(shape, batch, do_time=do_time)
    rows.append((shape, dt, cc, cs, loss))
    t = f"{dt * 1e3:.1f} ms/step | " if do_time else ""
    print(f"| {shape[0]}x{shape[1]} | {t}{cs['gflops']:.2f} GF/dev | "
          f"{cs['gbytes']:.2f} GB/dev | {cc} | loss {loss:.4f} |",
          flush=True)
  base = rows[0]
  for shape, dt, cc, cs, loss in rows[1:]:
    print(f"{shape}: flops/dev {cs['gflops'] / base[3]['gflops']:.2f}x "
          f"DP, bytes/dev {cs['gbytes'] / base[3]['gbytes']:.2f}x DP, "
          f"loss match {abs(loss - base[4]) < 5e-3}")


if __name__ == "__main__":
  main()
