"""Training-throughput benchmark: rays/sec on the S-NeRF headline config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the reference's SHIPPED nuScenes config (BASELINE.md,
s-nerf/exp/scene_0916/args.txt): 4,096 rays/step, 128 coarse + 128 fine
samples/ray, 1024-wide fine MLP with 3 rgb layers, cone ray shape
(args.txt:94), the unbounded-scene warp path (fn2 contraction + log
s->t), proposal + rgb + depth losses, Adam — the full jitted train step
including on-device ray generation, dispatched as a 15-step lax.scan
loop (the production --unroll_steps path).

vs_baseline anchors to the REFERENCE IMPLEMENTATION's estimated
throughput for this config on one A100 (BASELINE.md: the baseline is
the reference's numbers; the repo publishes none, so we derive a
deliberately GENEROUS ceiling for it):
  - the reference trains eager float32 torch — no autocast/AMP anywhere
    in s-nerf (train.py, model/models.py), and torch's matmul TF32 flag
    defaults OFF, so out-of-the-box it runs cuBLAS FP32 at <= 19.5
    TFLOP/s on A100 -> ~31.9 TFLOP/step / 17 effective ~= 1.9 s/step
    ~= 2.2k rays/s;
  - granting it TF32 (explicit user opt-in, 156 TFLOP/s peak) at a
    generous 65% end-to-end efficiency and ZERO DataParallel/Python/
    host-sampling overhead: 31.9 TFLOP / 100 TFLOP/s ~= 0.32 s/step
    ~= 12.8k rays/s.
We anchor at that most-generous 12.8k. (Round-1 used 25k — the
"optimistic end" of generic 2-6 it/s folklore — which an f32 eager
torch stack cannot physically reach on an A100; it described a bf16
rewrite, not the reference.)

Roofline context (PERF.md has the measurements): this workload costs
~31 TFLOP/step (10.4 fwd + 20.8 bwd), so one v5e (197 TFLOP/s bf16)
physically caps at ~25.6k rays/s at 100% MXU utilization and ZERO
non-matmul work. The measured step runs the fine MLP at 95-100% of the
MXU peak with ~19 ms of everything-else — ~86% of the chip's physical
ceiling. The same step on one v5p (459 TFLOP/s) maps to ~50k rays/s.
"""

import json
import os
import time

A100_REF_RAYS_PER_SEC = 12_800.0

# BENCH_TINY=1 shrinks everything so the script smoke-tests on CPU in
# seconds (used by tests; the reported number is then meaningless).
TINY = os.environ.get("BENCH_TINY") == "1"


def main():
  import jax
  import numpy as np

  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.mipnerf import MipNerfConfig
  from snerf_tpu.train.trainer import (
      TrainConfig, create_train_state, make_train_step)

  scene = make_synthetic_scene(num_images=6, H=24 if TINY else 96,
                               W=32 if TINY else 128)
  dev = scene_to_device(scene)

  mcfg = MipNerfConfig(
      num_samples=8 if TINY else 128, num_fine=8 if TINY else 128,
      hidden_layer=16 if TINY else 1024, rgb_layer=1 if TINY else 3,
      proposal_hidden_layer=16 if TINY else 256, ray_shape="cone",
      no_warp_sample=False, warp_fn=1, t_transform="log",
      density_noise=0.0, compute_dtype=jax.numpy.bfloat16)
  n_rgb = 64 if TINY else 4096
  unroll = 2 if TINY else 15
  while n_rgb >= (16 if TINY else 512):
    try:
      tcfg = TrainConfig(n_rgb=n_rgb, depth_loss=True, proposal_loss=True)
      # Initialize on the CPU backend: param init only needs shapes, and
      # compiling the init graph on a remote TPU costs ~70s of tunnel RTT.
      try:
        cpu = jax.devices("cpu")[0]
      except RuntimeError:
        cpu = None
      if cpu is not None and jax.devices()[0].platform != "cpu":
        with jax.default_device(cpu):
          model, pose_model, state = create_train_state(
              jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
        state = jax.device_put(state, jax.devices()[0])
      else:
        model, pose_model, state = create_train_state(
            jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
      from snerf_tpu.train.trainer import make_train_loop
      raw = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                            scene.near, scene.far, donate=False, jit=False)
      step = make_train_loop(raw, unroll_steps=unroll, donate=True)
      key = jax.random.PRNGKey(1)
      # warmup / compile; float() forces a real device round-trip
      # (block_until_ready can be a no-op on tunneled backends).
      key, k = jax.random.split(key)
      state, metrics = step(state, k)
      assert np.isfinite(float(metrics["loss"]))

      # Timing: dispatch n_dispatch loop calls asynchronously — each
      # consumes the previous donated state, so fetching the FINAL loss
      # forces the whole chain; one host round-trip total.
      n_dispatch = 2
      t0 = time.perf_counter()
      for _ in range(n_dispatch):
        key, k = jax.random.split(key)
        state, metrics = step(state, k)
      last = float(metrics["loss"])
      dt = time.perf_counter() - t0
      assert np.isfinite(last)
      rays_per_sec = n_rgb * unroll * n_dispatch / dt
      print(json.dumps({
          "metric": "train_rays_per_sec",
          "value": round(rays_per_sec, 1),
          "unit": "rays/s/chip",
          "vs_baseline": round(rays_per_sec / A100_REF_RAYS_PER_SEC, 3),
      }))
      return
    except Exception as e:  # noqa: BLE001 - OOM fallback
      if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
        n_rgb //= 2
        continue
      raise
  raise RuntimeError("could not run benchmark at any batch size")


def _run_inner():
  try:
    main()
  except Exception as e:  # noqa: BLE001
    # transient tunneled-TPU worker crashes/wedges (UNAVAILABLE,
    # FAILED_PRECONDITION after a worker restart) recover after a
    # cool-down; one in-process retry is cheap insurance
    msg = str(e)
    if ("UNAVAILABLE" in msg or "crashed" in msg
        or "FAILED_PRECONDITION" in msg or "INTERNAL" in msg):
      time.sleep(30)
      main()
    else:
      raise


if __name__ == "__main__":
  if os.environ.get("BENCH_INNER") == "1" or TINY:
    _run_inner()
  else:
    # Watchdog: the tunneled TPU worker occasionally WEDGES (device ops
    # block forever, observed as FAILED_PRECONDITION or an indefinite
    # hang after a worker restart). Run the measurement in a subprocess
    # with a hard timeout and retry, so an unattended driver run gets a
    # number (or a fast failure) instead of hanging.
    import subprocess
    import sys
    for attempt in range(3):
      try:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "BENCH_INNER": "1"},
            timeout=1500).returncode
      except subprocess.TimeoutExpired:
        rc = -1
      if rc == 0:
        sys.exit(0)
      if attempt < 2:
        time.sleep(60)
    sys.exit(1)
