"""Round-2 perf experiments, part 2: IPE method + loss-term costs."""

import time

import jax
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.mipnerf import MipNerfConfig
from snerf_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)

N_RGB = 4096


def run(tag, mcfg, tcfg, n_steps=15):
  scene = make_synthetic_scene(num_images=6, H=96, W=128)
  dev = scene_to_device(scene)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, pose_model, state = create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  state = jax.device_put(state, jax.devices()[0])
  step = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                         scene.near, scene.far, donate=True)
  key = jax.random.PRNGKey(1)
  key, k = jax.random.split(key)
  state, metrics = step(state, k)
  assert np.isfinite(float(metrics["loss"]))
  t0 = time.perf_counter()
  for _ in range(n_steps):
    key, k = jax.random.split(key)
    state, metrics = step(state, k)
  last = float(metrics["loss"])
  dt = (time.perf_counter() - t0) / n_steps
  assert np.isfinite(last)
  print(f"{tag}: {dt*1e3:.1f} ms/step = {N_RGB/dt:.0f} rays/s", flush=True)
  return dt


def main():
  base = dict(num_samples=128, num_fine=128, hidden_layer=1024, rgb_layer=3,
              proposal_hidden_layer=256, no_warp_sample=False, warp_fn=1,
              t_transform="log", density_noise=0.0, ray_shape="cone",
              compute_dtype=jax.numpy.bfloat16)
  tcfg = TrainConfig(n_rgb=N_RGB, depth_loss=True, proposal_loss=True)

  # E6: double-angle IPE
  run("E6 ipe=double_angle", MipNerfConfig(**base, ipe_method="double_angle"),
      tcfg)
  # E8: loss-term cost probes (double-angle base)
  run("E8 -proposal_loss", MipNerfConfig(**base, ipe_method="double_angle"),
      TrainConfig(n_rgb=N_RGB, depth_loss=True, proposal_loss=False))
  run("E9 -depth_loss", MipNerfConfig(**base, ipe_method="double_angle"),
      TrainConfig(n_rgb=N_RGB, depth_loss=False, proposal_loss=True))


if __name__ == "__main__":
  main()
