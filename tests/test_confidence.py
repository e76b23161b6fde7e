"""Confidence subsystem: warping geometry, conf aggregation, trainer wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from snerf_tpu.data import make_synthetic_scene
from snerf_tpu.models.confidence import (
    ConfidenceModel, bilinear_sample, build_neighbor_table,
    precompute_conf_maps, project_to_view, reproj_conf_maps, warp_image)


def test_bilinear_sample_exact_on_grid():
  img = jnp.arange(12.0).reshape(3, 4, 1)
  out = bilinear_sample(img, jnp.array([1.0, 2.0]), jnp.array([0.0, 2.0]))
  np.testing.assert_allclose(np.asarray(out[:, 0]), [1.0, 10.0])
  # halfway between pixels
  mid = bilinear_sample(img, jnp.array([0.5]), jnp.array([0.0]))
  np.testing.assert_allclose(np.asarray(mid), [[0.5]])


def test_project_identity_pose_roundtrip():
  """Projecting into the SAME view must land on the source pixels."""
  scene = make_synthetic_scene(num_images=4, H=16, W=20)
  depth = jnp.asarray(scene.depths[1])
  pose = jnp.asarray(scene.poses[1])
  K = jnp.asarray(scene.intrinsics[1])
  tx, ty, pd, front = project_to_view(depth, pose, K, pose, K)
  ys, xs = np.meshgrid(np.arange(16), np.arange(20), indexing="ij")
  np.testing.assert_allclose(np.asarray(tx), xs, atol=1e-2)
  np.testing.assert_allclose(np.asarray(ty), ys, atol=1e-2)
  np.testing.assert_allclose(np.asarray(pd), np.asarray(depth), rtol=1e-4)
  assert np.all(np.asarray(front))


def test_warp_between_views_matches_image():
  """Warping a neighbor into the base frame should approximate the base
  image where geometry is consistent (synthetic scene is Lambertian)."""
  scene = make_synthetic_scene(num_images=12, H=24, W=32)
  i, j = 3, 4
  fake, tgt_d, proj_d, valid = warp_image(
      jnp.asarray(scene.depths[i]), jnp.asarray(scene.poses[i]),
      jnp.asarray(scene.intrinsics[i]),
      jnp.asarray(scene.images[j], jnp.float32) / 255.0,
      jnp.asarray(scene.depths[j]), jnp.asarray(scene.poses[j]),
      jnp.asarray(scene.intrinsics[j]))
  v = np.asarray(valid)
  assert v.mean() > 0.5  # neighboring cameras see most of the frame
  base = scene.images[i].astype(np.float32) / 255.0
  err = np.abs(np.asarray(fake) - base)[v].mean()
  assert err < 0.12, err
  # depth consistency between projected and target-sampled depth
  d_err = (np.abs(np.asarray(proj_d) - np.asarray(tgt_d)) /
           np.maximum(np.asarray(tgt_d), 1e-6))[v]
  assert np.median(d_err) < 0.15


def test_neighbor_table_same_camera_only():
  i_train = np.array([0, 1, 2, 3, 4, 5])
  cam = np.array([0, 0, 0, 1, 1, 1])
  ids, ws = build_neighbor_table(i_train, cam, conf_num=1)
  # image 2 (cam 0): +1 neighbor is img 3 (cam 1) -> masked; -1 is img 1 ok
  assert ws[2].tolist() == [0.0, 1.0]
  assert ids[2, 1] == 1
  # image 0: only +1 neighbor
  assert ws[0].tolist() == [1.0, 0.0]
  assert ids[0, 0] == 1


def test_conf_maps_rank_consistent_geometry():
  """Pixels with corrupted depth must get lower confidence."""
  scene = make_synthetic_scene(num_images=12, H=24, W=32)
  i = 3
  bad_depth = scene.depths[i].copy()
  bad_depth[5:12, 5:12] *= 1.6  # corrupt a block
  neighbors = [
      {"img": jnp.asarray(scene.images[k], jnp.float32) / 255.0,
       "depth": jnp.asarray(scene.depths[k]),
       "pose": jnp.asarray(scene.poses[k]),
       "intr": jnp.asarray(scene.intrinsics[k]), "weight": 1.0}
      for k in (2, 4)]
  confs = reproj_conf_maps(
      ("rgb", "depth"), jnp.asarray(scene.images[i], jnp.float32) / 255.0,
      jnp.asarray(bad_depth), jnp.asarray(scene.poses[i]),
      jnp.asarray(scene.intrinsics[i]), neighbors, tau=0.2)
  c = np.asarray(confs["depth"])
  corrupt = c[6:11, 6:11].mean()
  clean = np.concatenate([c[:4].ravel(), c[14:].ravel()]).mean()
  assert corrupt < clean, (corrupt, clean)


def test_precompute_and_combine():
  scene = make_synthetic_scene(num_images=8, H=16, W=20, datahold=8)
  modes = ("rgb", "ssim", "depth")
  maps = precompute_conf_maps(modes, scene, conf_num=1, tau=0.3)
  assert maps.shape == (len(scene.i_train), 3, 16, 20)
  assert maps.dtype == np.uint8
  cm = ConfidenceModel(modes, scene.num_images)
  params = cm.init_params()
  stack = jnp.asarray(maps[0], jnp.float32) / 255.0  # [3, H, W]
  out = cm.combine(params, stack.reshape(3, -1),
                   jnp.full((16 * 20,), int(scene.i_train[0])))
  assert out.shape == (16 * 20,)
  # zero lambdas => sigmoid=0.5 each => plain average over modes
  np.testing.assert_allclose(
      np.asarray(out), np.asarray(stack.reshape(3, -1).mean(0)), atol=1e-5)


def test_trainer_with_confidence():
  scene = make_synthetic_scene(num_images=8, H=16, W=20, datahold=8)
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.mipnerf import MipNerfConfig
  from snerf_tpu.train.trainer import (
      TrainConfig, create_train_state, make_train_step)
  modes = ("rgb", "depth")
  maps = precompute_conf_maps(modes, scene, conf_num=1)
  dev = scene_to_device(scene)
  mcfg = MipNerfConfig(num_samples=8, num_fine=8, hidden_layer=16,
                       proposal_hidden_layer=16, density_noise=0.0)
  tcfg = TrainConfig(n_rgb=32, n_iters=50, depth_loss=True,
                     depth_conf=True, conf_modes=modes)
  model, pose_model, state = create_train_state(
      jax.random.PRNGKey(0), mcfg, tcfg, scene.num_images)
  assert state.conf_params is not None
  step = make_train_step(model, pose_model, tcfg, dev, scene.i_train,
                         scene.near, scene.far, donate=False,
                         conf_maps=maps)
  s2, metrics = step(state, jax.random.PRNGKey(1))
  assert np.isfinite(float(metrics["loss"]))
  # lambdas receive gradient (depth loss is conf-weighted)
  delta = np.abs(np.asarray(s2.conf_params["lambdas"]) -
                 np.asarray(state.conf_params["lambdas"])).sum()
  assert delta > 0


def test_feature_fn_random_pyramid():
  from snerf_tpu.models.features import make_feature_fn
  fn = make_feature_fn()
  a = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3), jnp.float32)
  e0 = fn(a, a)
  np.testing.assert_allclose(np.asarray(e0), 0.0, atol=1e-5)
  b = jnp.asarray(np.random.RandomState(1).rand(32, 32, 3), jnp.float32)
  assert float(fn(a, b).mean()) > 1e-3


def test_precompute_with_vgg_mode():
  scene = make_synthetic_scene(num_images=6, H=16, W=20, datahold=6)
  from snerf_tpu.models.features import make_feature_fn
  modes = ("rgb", "depth", "vgg")
  maps = precompute_conf_maps(modes, scene, conf_num=1,
                              feature_fn=make_feature_fn())
  assert maps.shape == (len(scene.i_train), 3, 16, 20)
  # vgg channel produced meaningful (non-constant) confidences
  vgg_channel = maps[:, 2].astype(np.float32)
  assert vgg_channel.std() > 0


def test_flow_mode_completes_reference_reproj_flow_err():
  """The "flow" confidence mode (finishing reference loss.py:181-216,
  which pdb's and returns None): geometry-consistent flow scores high,
  corrupted flow scores low."""
  from snerf_tpu.models.confidence import reproj_err_maps
  scene = make_synthetic_scene(num_images=12, H=24, W=32)
  i, j = 3, 4
  depth = jnp.asarray(scene.depths[i])
  pose_i = jnp.asarray(scene.poses[i])
  K_i = jnp.asarray(scene.intrinsics[i])
  pose_j = jnp.asarray(scene.poses[j])
  K_j = jnp.asarray(scene.intrinsics[j])
  tx, ty, _, _ = project_to_view(depth, pose_i, K_i, pose_j, K_j)
  ys, xs = np.meshgrid(np.arange(24, dtype=np.float32),
                       np.arange(32, dtype=np.float32), indexing="ij")
  true_flow = jnp.stack([tx - xs, ty - ys], -1)

  errs, valid = reproj_err_maps(
      ("flow",), jnp.asarray(scene.images[i], jnp.float32) / 255.0, depth,
      pose_i, K_i, jnp.asarray(scene.images[j], jnp.float32) / 255.0,
      jnp.asarray(scene.depths[j]), pose_j, K_j, base_flow=true_flow)
  v = np.asarray(valid)
  assert np.abs(np.asarray(errs["flow"]))[v].max() < 1e-3

  bad_flow = true_flow.at[8:16, 8:16].add(5.0)
  errs_bad, _ = reproj_err_maps(
      ("flow",), jnp.asarray(scene.images[i], jnp.float32) / 255.0, depth,
      pose_i, K_i, jnp.asarray(scene.images[j], jnp.float32) / 255.0,
      jnp.asarray(scene.depths[j]), pose_j, K_j, base_flow=bad_flow)
  e = np.asarray(errs_bad["flow"])
  assert e[8:16, 8:16][v[8:16, 8:16]].min() > 1.0
  outside = np.ones_like(v, bool)
  outside[8:16, 8:16] = False
  assert e[outside & v].max() < 1e-3


def test_precompute_flow_mode_via_scene_side_channel():
  """precompute_conf_maps consumes Scene.flow for the +-1 neighbors."""
  scene = make_synthetic_scene(num_images=6, H=16, W=20)
  n = scene.images.shape[0]
  rng = np.random.RandomState(0)
  # small random flow: not geometry-consistent, but exercises the path
  scene.flow = rng.uniform(-1, 1, (2, n, 16, 20, 2)).astype(np.float32)
  maps = precompute_conf_maps(("rgb", "flow"), scene, conf_num=1)
  assert maps.shape[1] == 2
  assert maps.dtype == np.uint8
  # flow-mode maps are populated (nonzero somewhere) and bounded
  assert maps[:, 1].max() > 0


def test_flow_flag_enables_flow_mode():
  from snerf_tpu.config import load_config
  cfg = load_config(["--flow", "True", "--depth_conf", "True"])
  assert cfg.conf_modes() == ("rgb", "ssim", "depth", "flow")
  assert load_config([]).conf_modes() == ("rgb", "ssim", "depth")
