"""Quality A/B: zip-nerf hash encoder vs IPE backbone, equal budgets.

Round-1 evidence was one 12-view 300-step run (VERDICT r1 weak #3);
this runs a 24-view 192x256 scene for 1200 steps per arm with identical
sampling budgets and reports held-out PSNR. Run on the chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.zipnerf import ZipNerfConfig
from snerf_tpu.train.zip_trainer import (
    ZipTrainConfig, create_zip_train_state, make_zip_train_step)

STEPS = 1200
BATCH = 1024
COMMON = dict(num_prop_samples=(16, 16), num_nerf_samples=8, sample_n=3,
              raydist_fn="power_transformation")


def run(tag, mcfg, scene, dev, lr=8e-3):
  tcfg = ZipTrainConfig(batch_size=BATCH, max_steps=STEPS, lr_init=lr,
                        lr_final=lr / 10, lr_delay_steps=0)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg,
                                          tcfg)
  state = jax.device_put(state, jax.devices()[0])
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=True)
  key = jax.random.PRNGKey(1)
  t0 = time.perf_counter()
  for i in range(1, STEPS + 1):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    if i % 100 == 0:
      loss = float(m["loss"])
      print(f"[{tag} {i}] loss={loss:.5f} "
            f"({time.perf_counter()-t0:.0f}s)", flush=True)
      assert np.isfinite(loss)

  # held-out PSNR on 2 test views, chunked render
  from snerf_tpu.data.raygen import rays_for_image
  psnrs = []
  for ti in np.asarray(scene.i_test)[:2]:
    rays = rays_for_image(jnp.asarray(scene.poses[ti]),
                          jnp.asarray(scene.intrinsics[ti]),
                          scene.hw[0], scene.hw[1], scene.near, scene.far)
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, x.shape[-1]), rays)
    n = flat.origins.shape[0]
    outs = []
    fn = jax.jit(lambda r: model.apply({"params": state.params}, r,
                                       rng=None)[0][-1]["rgb"])
    for s in range(0, n, 4096):
      chunk = jax.tree_util.tree_map(lambda x: x[s:s + 4096], flat)
      outs.append(np.asarray(fn(chunk)))
    pred = np.concatenate(outs).reshape(*scene.hw, 3)
    gt = scene.images[ti].astype(np.float32) / 255.0
    mse = float(np.mean((pred - gt) ** 2))
    psnrs.append(-10 * np.log10(mse))
  print(f"RESULT {tag}: held-out psnr = {np.mean(psnrs):.2f} dB "
        f"({time.perf_counter()-t0:.0f}s total)", flush=True)


def main():
  scene = make_synthetic_scene(num_images=24, H=192, W=256, datahold=8)
  dev = scene_to_device(scene)
  run("ipe", ZipNerfConfig(encoder_type="ipe", **COMMON), scene, dev)
  run("hash", ZipNerfConfig(encoder_type="hash", grid_num_levels=10,
                            grid_log2_hashmap_size=19, **COMMON),
      scene, dev)


if __name__ == "__main__":
  main()
