"""Tensor parallelism: the wide-MLP model-axis sharding (parallel/tp.py).

The reference has no TP (SURVEY.md §2.5 — DDP/DataParallel only); this is
the TPU stretch goal: a 2-D (data, model) mesh where the fine MLP's hidden
width is sharded over "model" and XLA SPMD inserts the ICI collectives.
Verified on the 8-device virtual CPU mesh: the TP run must match the pure
data-parallel run numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.data.sampler import scene_to_device
from snerf_tpu.models.mipnerf import MipNerfConfig
from snerf_tpu.parallel import (
    MODEL_AXIS, make_mesh, make_mesh_2d, num_model_shards, shard_state,
    state_shardings)
from snerf_tpu.parallel.tp import spec_axes
from snerf_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step)


def _setup(n_rgb):
  scene = make_synthetic_scene(num_images=4, H=16, W=16)
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(num_samples=6, num_fine=6, hidden_layer=64,
                       proposal_hidden_layer=32, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=n_rgb, depth_loss=True, proposal_loss=True,
                     pose_refine=True)
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  return scene, dev, tcfg, model, pose_model, state


def _run(scene, dev, tcfg, model, pose_model, state, mesh, steps=2):
  step = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                         scene.near, scene.far, donate=False, mesh=mesh)
  out = []
  with mesh:
    for i in range(steps):
      state, metrics = step(state, jax.random.PRNGKey(100 + i))
      out.append(float(metrics["loss"]))
  return state, out


def test_state_shardings_cover_trunk_and_moments():
  _, _, _, _, _, state = _setup(n_rgb=32)
  mesh = make_mesh_2d(4, 2)
  sh = state_shardings(state, mesh)
  trunk_kernel = sh.params["mlp"]["trunk_0"]["kernel"]
  assert MODEL_AXIS in spec_axes(trunk_kernel.spec)
  # odd trunk layers are row-parallel (contraction dim sharded)
  assert sh.params["mlp"]["trunk_1"]["kernel"].spec[0] == MODEL_AXIS
  # Adam moments mirror the param layout (mu lives in opt_state[0].mu).
  n = num_model_shards(state, mesh)
  n_params_only = num_model_shards(state.params, mesh)
  assert n >= 3 * n_params_only  # params + mu + nu
  # pose params and scalars stay replicated
  for s in jax.tree_util.tree_leaves(
      state_shardings(state.pose_params, mesh),
      is_leaf=lambda x: hasattr(x, "spec")):
    assert MODEL_AXIS not in spec_axes(s.spec)


def test_tp_matches_data_parallel():
  scene, dev, tcfg, model, pose_model, state = _setup(n_rgb=32)

  mesh_dp = make_mesh(jax.devices()[:8])
  st_dp, losses_dp = _run(scene, dev, tcfg, model, pose_model, state,
                          mesh_dp)

  mesh_tp = make_mesh_2d(4, 2)
  state_tp = shard_state(state, mesh_tp)
  assert num_model_shards(state, mesh_tp) > 0
  # params really live sharded on the devices
  k = state_tp.params["mlp"]["trunk_0"]["kernel"]
  assert MODEL_AXIS in spec_axes(k.sharding.spec)
  st_out, losses_tp = _run(scene, dev, tcfg, model, pose_model, state_tp,
                           mesh_tp)
  np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4, atol=1e-6)
  # updated params match the replicated run (same trajectory)
  p_dp = jax.device_get(st_dp.params["mlp"]["trunk_0"]["kernel"])
  p_tp = jax.device_get(st_out.params["mlp"]["trunk_0"]["kernel"])
  np.testing.assert_allclose(p_dp, p_tp, rtol=2e-4, atol=1e-6)


def test_tp_width_not_divisible_stays_replicated():
  scene, dev, tcfg, model, pose_model, state = _setup(n_rgb=32)
  mesh = make_mesh_2d(2, 4)  # tp=4
  sh = state_shardings(state, mesh)
  # width 64 % 4 == 0 so trunk shards; density head out-dim 1 never does
  assert MODEL_AXIS not in spec_axes(sh.params["mlp"]["density"]["bias"].spec)


def test_zip_tp_shardings():
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state, make_zip_train_step)
  scene = make_synthetic_scene(num_images=4, H=16, W=16)
  dev = scene_to_device(scene)
  zcfg = ZipNerfConfig(
      num_prop_samples=(4, 4), num_nerf_samples=4,
      prop_grid_resolutions=(32, 64), nerf_grid_resolution=128,
      grid_num_levels=3, grid_log2_hashmap_size=10,
      bottleneck_width=16, net_width_viewdirs=16, sample_n=2)
  ztcfg = ZipTrainConfig(batch_size=32, max_steps=4, lr_delay_steps=0)
  zmodel, zstate = create_zip_train_state(
      jax.random.PRNGKey(2), zcfg, ztcfg, num_images=scene.num_images)
  mesh = make_mesh_2d(4, 2)
  assert num_model_shards(zstate, mesh) > 0
  zstate = shard_state(zstate, mesh)
  with mesh:
    zstep = make_zip_train_step(zmodel, zcfg, ztcfg, dev, scene.i_train,
                                scene.near, scene.far, donate=False,
                                mesh=mesh)
    zstate, zmetrics = zstep(zstate, jax.random.PRNGKey(3))
    assert np.isfinite(float(zmetrics["loss"]))


def test_grid_table_sharded_over_model_axis():
  """SURVEY §2.5 stretch goal: hash table rows sharded over ICI."""
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state)
  zcfg = ZipNerfConfig(
      num_prop_samples=(4, 4), num_nerf_samples=4,
      prop_grid_resolutions=(32, 64), nerf_grid_resolution=128,
      grid_num_levels=3, grid_log2_hashmap_size=10,
      bottleneck_width=16, net_width_viewdirs=16, sample_n=2)
  ztcfg = ZipTrainConfig(batch_size=32, max_steps=4, lr_delay_steps=0)
  _, zstate = create_zip_train_state(
      jax.random.PRNGKey(2), zcfg, ztcfg, num_images=4)
  mesh = make_mesh_2d(4, 2)
  sh = state_shardings(zstate, mesh)
  found = []
  def visit(path, s):
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if keys and keys[-1] == "table":
      found.append(s)
    return s
  jax.tree_util.tree_map_with_path(visit, sh,
      is_leaf=lambda x: hasattr(x, "spec"))
  assert found, "no hash table found in state"
  for s in found:
    assert s.spec[0] == MODEL_AXIS, s.spec


def test_tp_eval_render_matches_replicated():
  """Forward-only TP: render a full image with model-axis-sharded params
  and compare to the replicated render."""
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.train.renderer import make_eval_render_fn, render_image
  scene, dev, tcfg, model, pose_model, state = _setup(n_rgb=32)
  H, W = scene.hw
  rays = rays_for_image(
      jnp.asarray(scene.poses[0]), jnp.asarray(scene.intrinsics[0]),
      H, W, scene.near, scene.far)

  fn = make_eval_render_fn(model, state.params)
  mesh_dp = make_mesh(jax.devices()[:8])
  with mesh_dp:
    ref = render_image(fn, rays, chunk=64, mesh=mesh_dp)

  mesh_tp = make_mesh_2d(4, 2)
  params_tp = jax.device_put(
      state.params, state_shardings(state, mesh_tp).params)
  fn_tp = make_eval_render_fn(model, params_tp)
  with mesh_tp:
    out = render_image(fn_tp, rays, chunk=64, mesh=mesh_tp)
  np.testing.assert_allclose(np.asarray(ref["rgb"]),
                             np.asarray(out["rgb"]), atol=2e-5)


def test_train_cli_with_tp(tmp_path):
  """End-to-end: `train.py --tp 2` trains on a 4x2 mesh; the checkpoint
  restores and evals on the default (replicated) path."""
  import train as T
  import eval as E
  base = str(tmp_path)
  args = ["--config", "configs/synthetic_tiny", "--basedir", base,
          "--N_iters", "20", "--i_weights", "20", "--i_print", "20",
          "--N_samples", "6", "--N_fine", "6", "--hidden_layer", "32",
          "--proposal_hidden_layer", "16", "--N_rgb", "64"]
  T.main(args + ["--tp", "2"])
  import os
  ckpt_dir = os.path.join(base, "synthetic_tiny", "checkpoints")
  assert os.path.isdir(ckpt_dir)
  # eval restores the TP-trained checkpoint (snapshot carries --tp but
  # eval builds its own mesh; restored arrays are host-replicated)
  E.main(["--config", "configs/synthetic_tiny", "--basedir", base,
          "--tp", "1"])
