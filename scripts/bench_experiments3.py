"""Round-2 perf experiments, part 3: decompose the 190 ms train step."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.mipnerf import MipNerfConfig
from snerf_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)

N_RGB = 4096


def timeit(tag, fn, *args, n=10):
  out = fn(*args)
  _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
  dt = (time.perf_counter() - t0) / n
  print(f"{tag}: {dt*1e3:.1f} ms", flush=True)
  return dt


def main():
  mcfg = MipNerfConfig(
      num_samples=128, num_fine=128, hidden_layer=1024, rgb_layer=3,
      proposal_hidden_layer=256, no_warp_sample=False, warp_fn=1,
      t_transform="log", density_noise=0.0, ray_shape="cone",
      compute_dtype=jnp.bfloat16, ipe_method="double_angle")
  tcfg = TrainConfig(n_rgb=N_RGB, depth_loss=True, proposal_loss=True)
  scene = make_synthetic_scene(num_images=6, H=96, W=128)
  dev = scene_to_device(scene)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, pose_model, state = create_train_state(
        jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  params = jax.device_put(state.params, jax.devices()[0])

  from snerf_tpu.data import sampler, raygen
  from snerf_tpu.ops.rays import Rays

  i_train = jnp.asarray(scene.i_train, jnp.int32)

  def make_rays(key):
    rays, targets = sampler.sample_batch(
        key, dev, i_train, N_RGB, scene.near, scene.far, single_image=True)
    return rays, targets

  rays, targets = jax.jit(make_rays)(jax.random.PRNGKey(0))
  rays = jax.tree_util.tree_map(lambda x: x.copy(), rays)

  # A: model forward only
  def fwd(params, rays, key):
    ret = model.apply({"params": params}, rays, rng=key, white_bkgd=False)
    return ret[1]["rgb"].sum() + ret[0]["weights"].sum()

  k = jax.random.PRNGKey(1)
  timeit("A model fwd", jax.jit(fwd), params, rays, k)

  # B: model fwd + bwd (grad wrt params)
  timeit("B model fwd+bwd", jax.jit(jax.grad(fwd)), params, rays, k)

  # C: pure fine-MLP stack fwd and fwd+bwd at the same shape
  from snerf_tpu.models.mlp import NerfMLP
  mlp = NerfMLP(net_width=1024, condition_depth=3,
                compute_dtype=jnp.bfloat16)
  x = jax.random.normal(jax.random.PRNGKey(2), (N_RGB, 127, 96))
  cond = jax.random.normal(jax.random.PRNGKey(3), (N_RGB, 27))
  with jax.default_device(cpu):
    mlp_vars = mlp.init(jax.random.PRNGKey(4), x[:2, :2], cond[:2])
  mlp_params = jax.device_put(mlp_vars["params"], jax.devices()[0])

  def mlp_fwd(p, x, cond):
    rgb, dens, _ = mlp.apply({"params": p}, x, cond)
    return rgb.sum() + dens.sum()

  timeit("C fine-MLP fwd", jax.jit(mlp_fwd), mlp_params, x, cond)
  timeit("D fine-MLP fwd+bwd", jax.jit(jax.grad(mlp_fwd)), mlp_params,
         x, cond)

  # E: sampling + raygen only
  timeit("E sample_batch", jax.jit(make_rays), jax.random.PRNGKey(5))


if __name__ == "__main__":
  main()
