"""Round-2 perf experiments on the real chip (not part of the package API).

Times train-step variants at the shipped S-NeRF config to locate the
~30 ms/step needed to clear 25k rays/s (VERDICT item 3). Run under axon.
"""

import time

import jax
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.mipnerf import MipNerfConfig
from snerf_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step, make_train_loop)

N_RGB = 4096


def build(mcfg):
  scene = make_synthetic_scene(num_images=6, H=96, W=128)
  dev = scene_to_device(scene)
  tcfg = TrainConfig(n_rgb=N_RGB, depth_loss=True, proposal_loss=True)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, pose_model, state = create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  state = jax.device_put(state, jax.devices()[0])
  return scene, dev, tcfg, model, pose_model, state


def time_per_step(step, state, n_steps, sync_every=None):
  key = jax.random.PRNGKey(1)
  # warmup / compile
  key, k = jax.random.split(key)
  state, metrics = step(state, k)
  assert np.isfinite(float(metrics["loss"]))
  t0 = time.perf_counter()
  for _ in range(n_steps):
    key, k = jax.random.split(key)
    state, metrics = step(state, k)
  last = float(jax.tree_util.tree_map(lambda x: x, metrics)["loss"])
  dt = time.perf_counter() - t0
  assert np.isfinite(last)
  return dt / n_steps


def main():
  mcfg = MipNerfConfig(
      num_samples=128, num_fine=128, hidden_layer=1024, rgb_layer=3,
      proposal_hidden_layer=256, no_warp_sample=False, warp_fn=1,
      t_transform="log", density_noise=0.0,
      compute_dtype=jax.numpy.bfloat16)
  scene, dev, tcfg, model, pose_model, state = build(mcfg)

  # E1: per-step dispatch (current bench)
  step = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                         scene.near, scene.far, donate=True)
  dt = time_per_step(step, state, 15)
  print(f"E1 per-step dispatch: {dt*1e3:.1f} ms/step "
        f"= {N_RGB/dt:.0f} rays/s", flush=True)

  # E2: scan-unrolled 15 steps per dispatch
  raw = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                        scene.near, scene.far, donate=False, jit=False)
  loop = make_train_loop(raw, unroll_steps=15, donate=True)
  with jax.default_device(jax.devices("cpu")[0]):
    _, _, state2 = create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  state2 = jax.device_put(state2, jax.devices()[0])
  dt = time_per_step(loop, state2, 3) / 15
  print(f"E2 scan(15)/dispatch:  {dt*1e3:.1f} ms/step "
        f"= {N_RGB/dt:.0f} rays/s", flush=True)

  # E4: cone ray shape (shipped-config exactness), scan mode
  mcfg_cone = MipNerfConfig(
      num_samples=128, num_fine=128, hidden_layer=1024, rgb_layer=3,
      proposal_hidden_layer=256, no_warp_sample=False, warp_fn=1,
      t_transform="log", density_noise=0.0, ray_shape="cone",
      compute_dtype=jax.numpy.bfloat16)
  scene, dev, tcfg, model, pose_model, state3 = build(mcfg_cone)
  raw = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                        scene.near, scene.far, donate=False, jit=False)
  loop = make_train_loop(raw, unroll_steps=15, donate=True)
  dt = time_per_step(loop, state3, 3) / 15
  print(f"E4 cone + scan(15):    {dt*1e3:.1f} ms/step "
        f"= {N_RGB/dt:.0f} rays/s", flush=True)


if __name__ == "__main__":
  main()
