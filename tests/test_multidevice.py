"""Multi-device coverage on the 8-way virtual CPU mesh: sharded renderer,
confidence-on-mesh training, scan-loop equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.raygen import rays_for_image
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.mipnerf import MipNerfConfig
from snerf_tpu.parallel import make_mesh
from snerf_tpu.train.renderer import make_eval_render_fn, render_image
from snerf_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_loop, make_train_step)

SMALL = dict(num_samples=8, num_fine=8, hidden_layer=16,
             proposal_hidden_layer=16, density_noise=0.0)


def test_sharded_renderer_matches_single_device():
  scene = make_synthetic_scene(num_images=4, H=16, W=24)
  mcfg = MipNerfConfig(**SMALL)
  from snerf_tpu.models.mipnerf import init_model
  model, variables = init_model(jax.random.PRNGKey(0), mcfg)
  render_fn = make_eval_render_fn(model, variables["params"])
  rays = rays_for_image(jnp.asarray(scene.poses[0]),
                        jnp.asarray(scene.intrinsics[0]), 16, 24,
                        scene.near, scene.far)
  out_single = render_image(render_fn, rays, chunk=128, mesh=None)
  mesh = make_mesh()
  with mesh:
    out_mesh = render_image(render_fn, rays, chunk=128, mesh=mesh)
  np.testing.assert_allclose(out_single["rgb"], out_mesh["rgb"],
                             atol=1e-5)
  # chunk not divisible by device count exercises the pad path
  with mesh:
    out_odd = render_image(render_fn, rays, chunk=100, mesh=mesh)
  np.testing.assert_allclose(out_single["rgb"], out_odd["rgb"],
                             atol=1e-5)


def test_confidence_training_on_mesh():
  scene = make_synthetic_scene(num_images=8, H=16, W=20, datahold=8)
  from snerf_tpu.models.confidence import precompute_conf_maps
  maps = precompute_conf_maps(("rgb", "depth"), scene, conf_num=1)
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(**SMALL)
  tcfg = TrainConfig(n_rgb=64, n_iters=50, depth_loss=True,
                     depth_conf=True, conf_modes=("rgb", "depth"),
                     pose_refine=True)
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  mesh = make_mesh()
  with mesh:
    step = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                           scene.near, scene.far, donate=False,
                           mesh=mesh, conf_maps=maps)
    state, metrics = step(state, jax.random.PRNGKey(1))
  assert np.isfinite(float(metrics["loss"]))
  assert state.conf_params is not None


def test_scan_loop_matches_per_step():
  scene = make_synthetic_scene(num_images=4, H=12, W=16)
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(**SMALL)
  tcfg = TrainConfig(n_rgb=32, n_iters=100, randomized=False)
  model, pose_model, state0 = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  raw = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                        scene.near, scene.far, jit=False)
  jit_step = jax.jit(raw)

  # 4 per-step calls with keys derived identically to the scan
  key = jax.random.PRNGKey(7)
  keys = jax.random.split(key, 4)
  s_seq = state0
  for k in keys:
    s_seq, m_seq = jit_step(s_seq, k)

  loop = make_train_loop(raw, 4, donate=False)
  s_loop, m_loop = loop(state0, key)
  np.testing.assert_allclose(
      np.asarray(s_loop.params["mlp"]["rgb"]["bias"]),
      np.asarray(s_seq.params["mlp"]["rgb"]["bias"]), atol=1e-6)
  assert int(s_loop.step) == 4


def test_render_scan_matches_chunked():
  """render_image_scan (one on-device lax.scan dispatch) == render_image
  (host chunk loop), including the pad/trim path (N not a chunk
  multiple) and mesh sharding."""
  import jax
  import jax.numpy as jnp
  import numpy as np
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.parallel import make_mesh
  from snerf_tpu.models.mipnerf import MipNerfConfig, init_model
  from snerf_tpu.train.renderer import (
      make_eval_render_fn, render_image, render_image_scan)

  scene = make_synthetic_scene(num_images=3, H=20, W=26)  # 520 rays
  cfg = MipNerfConfig(num_samples=4, num_fine=4, hidden_layer=16,
                      proposal_hidden_layer=16, density_noise=0.0)
  model, variables = init_model(jax.random.PRNGKey(0), cfg, num_rays=4)
  fn = make_eval_render_fn(model, variables["params"])
  rays = rays_for_image(
      jnp.asarray(scene.poses[0]), jnp.asarray(scene.intrinsics[0]),
      20, 26, scene.near, scene.far)
  mesh = make_mesh(jax.devices()[:8])
  with mesh:
    a = render_image(fn, rays, chunk=128, mesh=mesh)
    b = render_image_scan(fn, rays, chunk=128, mesh=mesh)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=1e-5, err_msg=k)
  # no-mesh path too
  c = render_image_scan(fn, rays, chunk=96)
  np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(c["rgb"]),
                             atol=1e-5)
