"""Reference-checkpoint importer: .tar -> native orbax experiment.

Builds a real reference torch MipNerfModel, saves a checkpoint in the
reference's .tar format (s-nerf/train.py:264-273), imports it with
scripts/import_reference_ckpt.py, then checks (a) eval-side restore
sees the imported weights and (b) our forward from the imported params
matches the torch forward (the same contract as
test_full_model_parity, now through the on-disk migration path).
Skipped when /root/reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/s-nerf"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

N_SAMPLES = 8
HIDDEN = 32
PROP_HIDDEN = 16


def _reference_model(semantic=False):
  sys.path.append(REF)  # APPEND: inserting at 0 makes bare
  # 'import train' resolve to the REFERENCE's train.py for every
  # later test in the process
  import torch
  import model.models as ref_models
  torch.manual_seed(0)
  # warp path: the reference's own no_warp branch crashes
  # (models.py:178 UnboundLocalError on s_vals)
  model = ref_models.MipNerfModel(
      n_samples=N_SAMPLES, no_warp_sample=False, ray_shape="cone",
      fn=1, radius=3.0, transform_idx=0, density_noise=0.0,
      hidden_layer=HIDDEN, rgb_layer=1, proposal_hidden_layer=PROP_HIDDEN,
      N_fine=N_SAMPLES, max_deg_point=8,
      semantic=semantic, semantic_class_num=5 if semantic else 0)
  return model.eval()


def _config_args(tmp_path):
  return ["--config", "configs/synthetic_tiny",
          "--basedir", str(tmp_path),
          "--expname", "imported",
          "--N_samples", str(N_SAMPLES), "--N_fine", str(N_SAMPLES),
          "--hidden_layer", str(HIDDEN), "--rgb_layer", "1",
          "--proposal_hidden_layer", str(PROP_HIDDEN),
          "--max_degree", "8", "--no_warp_sample", "False",
          "--fn", "1", "--radius", "3.0", "--transform_idx", "0",
          "--depth_conf", "False"]


def test_import_reference_tar_roundtrip(tmp_path):
  import torch

  from scripts.import_reference_ckpt import main as import_main

  ref = _reference_model()
  tar = str(tmp_path / "090000.tar")
  # the reference's exact save format (train.py:264-273), incl. the
  # DataParallel 'module.' prefix and the misspelled optimizer key
  torch.save({
      "global_step": 90000,
      "model_param": {"module." + k: v for k, v in
                      ref.state_dict().items()},
      "optimzer": {},
  }, tar)

  import_main(["--tar", tar] + _config_args(tmp_path))

  ckpt_dir = os.path.join(str(tmp_path), "imported", "checkpoints")
  from snerf_tpu.train import checkpoints as ckpt_lib
  assert ckpt_lib.latest_step(ckpt_dir) == 90000

  # restore through the normal path and compare a forward vs torch
  import jax
  import jax.numpy as jnp
  from collections import namedtuple

  from snerf_tpu.config import load_config
  from snerf_tpu.utils.ref_import import _repo_train_module
  T = _repo_train_module()

  cfg = load_config(_config_args(tmp_path))
  scene = T.load_scene(cfg)
  model, _, state = T.build_model_state(cfg, cfg.train_config(),
                                        scene.num_images)
  state, step = ckpt_lib.restore_checkpoint(ckpt_dir, state, host=True)
  assert step == 90000

  n = 4
  rng = np.random.RandomState(0)
  d = rng.randn(n, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  origins = rng.randn(n, 3).astype(np.float32) * 0.1
  radii = np.full((n, 1), 0.005, np.float32)
  near = np.full((n, 1), 0.5, np.float32)
  far = np.full((n, 1), 20.0, np.float32)
  ones = np.ones((n, 1), np.float32)

  TorchRays = namedtuple(
      "Rays", ("origins", "directions", "viewdirs", "radii", "lossmult",
               "near", "far", "app"))
  t_rays = TorchRays(*[torch.tensor(x) for x in
                       (origins, d, d, radii, ones, near, far,
                        np.zeros((n, 1), np.float32))])
  with torch.no_grad():
    ref_out = ref(t_rays, False, False, torch.zeros(3))
  ref_rgb = ref_out[1][0].numpy()

  from snerf_tpu.ops.rays import Rays
  rays = Rays(origins=jnp.asarray(origins), directions=jnp.asarray(d),
              viewdirs=jnp.asarray(d), radii=jnp.asarray(radii),
              lossmult=jnp.asarray(ones), near=jnp.asarray(near),
              far=jnp.asarray(far), app=jnp.zeros((n, 1), jnp.int32))
  with jax.default_matmul_precision("float32"):
    ret = model.apply({"params": state.params}, rays, rng=None,
                      white_bkgd=False, viewc=jnp.zeros(3))
  np.testing.assert_allclose(np.asarray(ret[1]["rgb"]), ref_rgb,
                             atol=2e-5)


def test_map_semantic_head():
  from snerf_tpu.utils.ref_import import map_mip_state_dict
  ref = _reference_model(semantic=True)
  params = map_mip_state_dict(ref.state_dict())
  assert "semantic_hidden" in params["mlp"]
  assert params["mlp"]["semantic"]["kernel"].shape[-1] == 5


def _zip_flags():
  return ["--model", "zipnerf", "--zip_batch_size", "16",
          "--zip_num_prop_samples", "(4,4)", "--zip_num_nerf_samples", "4",
          "--zip_sample_n", "2", "--zip_grid_num_levels", "3",
          "--zip_log2_hashmap_size", "10", "--zip_bottleneck_width", "16",
          "--zip_prop_grid_resolutions", "(32,64)",
          "--zip_nerf_grid_resolution", "128"]


def _reference_zip_state_dict(params):
  """Build a reference-layout zip state_dict from our param tree by
  inverting the mapping (the real torch zip model needs the CUDA
  gridencoder to even instantiate; table-layout parity is covered by
  the hashgrid tests)."""
  import torch

  sd = {}

  def put_dense(prefix, p):
    sd[prefix + ".weight"] = torch.tensor(np.asarray(p["kernel"]).T)
    sd[prefix + ".bias"] = torch.tensor(np.asarray(p["bias"]))

  for name, m in params.items():
    if name == "glo_vecs":
      sd["glo_vecs.weight"] = torch.tensor(np.asarray(m["embedding"]))
      continue
    sd[name + ".encoder.embeddings"] = torch.tensor(
        np.asarray(m["grid"]["table"]))
    # buffers the reference state_dict carries along
    sd[name + ".encoder.offsets"] = torch.zeros(4, dtype=torch.int32)
    put_dense(name + ".density_layer.0", m["density_hidden"])
    put_dense(name + ".density_layer.2", m["density_out"])
    i = 0
    while f"view_{i}" in m:
      put_dense(f"{name}.lin_second_stage_{i}", m[f"view_{i}"])
      i += 1
    if "rgb_out" in m:
      put_dense(name + ".rgb_layer", m["rgb_out"])
  return sd


def test_import_zip_ckpt_roundtrip(tmp_path):
  """Synthesized reference-layout zip .ckpt -> import CLI -> native
  render.py produces images from the imported weights."""
  import torch

  import jax
  from scripts.import_reference_ckpt import main as import_main
  from snerf_tpu.config import load_config
  from snerf_tpu.train.zip_trainer import create_zip_train_state

  args = ["--config", "configs/synthetic_tiny",
          "--basedir", str(tmp_path), "--expname", "zipimp"] + _zip_flags()
  cfg = load_config(args)
  _, state = create_zip_train_state(
      jax.random.PRNGKey(7), cfg.zip_model_config(), cfg.zip_train_config())
  ref_sd = _reference_zip_state_dict(
      jax.tree_util.tree_map(np.asarray, state.params))

  ckpt = str(tmp_path / "checkpoint_777.ckpt")
  torch.save({"step": 777, "state_dict": ref_sd}, ckpt)
  import_main(["--tar", ckpt] + args)

  from snerf_tpu.train import checkpoints as ckpt_lib
  ckpt_dir = os.path.join(str(tmp_path), "zipimp", "checkpoints")
  assert ckpt_lib.latest_step(ckpt_dir) == 777

  # restored params == the originals we serialized through torch
  state2, step = ckpt_lib.restore_checkpoint(ckpt_dir, state, host=True)
  assert step == 777
  a = jax.tree_util.tree_leaves(state.params)
  b = jax.tree_util.tree_leaves(state2.params)
  for x, y in zip(a, b):
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)

  # the imported experiment renders natively
  import render as R
  R.main(["--config", "configs/synthetic_tiny", "--basedir", str(tmp_path),
          "--expname", "zipimp", "--render_mode", "test", "--render_n", "1"])
  out = os.path.join(str(tmp_path), "zipimp", "render")
  assert os.listdir(os.path.join(out, "rgb"))


def test_zip_unmapped_weights_are_loud():
  from snerf_tpu.utils.ref_import import map_zip_state_dict
  import torch
  sd = {"nerf_mlp.density_layer.0.weight": torch.zeros(64, 12),
        "nerf_mlp.density_layer.0.bias": torch.zeros(64),
        "nerf_mlp.density_layer.2.weight": torch.zeros(16, 64),
        "nerf_mlp.density_layer.2.bias": torch.zeros(16),
        "nerf_mlp.diffuse_layer.weight": torch.zeros(3, 12),
        "nerf_mlp.diffuse_layer.bias": torch.zeros(3)}
  with pytest.raises(ValueError, match="unmapped"):
    map_zip_state_dict(sd)


def test_shape_mismatch_is_loud(tmp_path):
  import torch

  from snerf_tpu.config import load_config
  from snerf_tpu.utils.ref_import import (
      _repo_train_module, import_reference_tar)
  load_scene = _repo_train_module().load_scene

  ref = _reference_model()
  tar = str(tmp_path / "bad.tar")
  torch.save({"global_step": 1, "model_param": ref.state_dict()}, tar)
  # config with the WRONG hidden width
  args = _config_args(tmp_path)
  args[args.index("--hidden_layer") + 1] = str(HIDDEN * 2)
  cfg = load_config(args)
  scene = load_scene(cfg)
  with pytest.raises(ValueError, match="do not match the config"):
    import_reference_tar(tar, cfg, scene.num_images)
