import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.raygen import rays_for_image
from snerf_tpu.models.mipnerf import MipNerfConfig, init_model
from snerf_tpu.train.renderer import (
    make_eval_render_fn, render_image, render_image_scan)

cpu = jax.devices("cpu")[0]
cfg = MipNerfConfig(num_samples=128, num_fine=128, hidden_layer=1024,
                    proposal_hidden_layer=256, ray_shape="cone",
                    no_warp_sample=False, warp_fn=1, t_transform="log",
                    density_noise=0.0, compute_dtype=jnp.bfloat16)
with jax.default_device(cpu):
  model, variables = init_model(jax.random.PRNGKey(0), cfg, num_rays=4)
params = jax.device_put(variables["params"], jax.devices()[0])
scene = make_synthetic_scene(num_images=2, H=256, W=384)
rays = rays_for_image(jnp.asarray(scene.poses[0]),
                      jnp.asarray(scene.intrinsics[0]), 256, 384,
                      scene.near, scene.far)
fn = make_eval_render_fn(model, params)
n = 256 * 384
for name, f in (("chunked", render_image), ("scan", render_image_scan)):
  out = f(fn, rays, chunk=8192)            # compile + warm
  t0 = time.perf_counter()
  for _ in range(3):
    out = f(fn, rays, chunk=8192)
    assert np.isfinite(out["rgb"]).all()   # np already fetched
  dt = (time.perf_counter() - t0) / 3
  print(f"{name}: {dt*1e3:.1f} ms/image = {n/dt:,.0f} rays/s", flush=True)
