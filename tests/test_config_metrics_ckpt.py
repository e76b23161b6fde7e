"""Config parsing, metrics (SSIM vs closed forms), checkpoint round-trip."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from snerf_tpu.config import Config, load_config, parse_config_file
from snerf_tpu.utils.metrics import (
    MetricHarness, MiouEvaluator, ms_ssim, psnr, ssim)


def test_parse_reference_style_config(tmp_path):
  p = tmp_path / "cfg"
  p.write_text("""
expname = scene_x
N_rgb = 2048
lrate = 5e-4
ray_shape = 'cone'
depth_loss = True
fn = 1
radius = 3.
no_align = 1
""")
  vals = parse_config_file(str(p))
  assert vals["expname"] == "scene_x"
  assert vals["N_rgb"] == 2048
  assert vals["lrate"] == 5e-4
  assert vals["ray_shape"] == "cone"
  assert vals["depth_loss"] is True
  assert vals["no_align"] == 1


def test_load_config_cli_overrides(tmp_path):
  p = tmp_path / "cfg"
  p.write_text("N_rgb = 1024\nexpname = a\n")
  cfg = load_config(["--config", str(p), "--N_rgb", "512",
                     "--depth_loss", "--lrate=1e-3"])
  assert cfg.N_rgb == 512
  assert cfg.expname == "a"
  assert cfg.depth_loss is True
  assert cfg.lrate == 1e-3


def test_load_reference_shipped_config_names():
  cfg = load_config(["--config", "configs/nuScenes_depth_6cams"])
  assert cfg.N_rgb == 4096
  assert cfg.hidden_layer == 1024
  assert cfg.transform_idx == 0
  assert cfg.pose_refine is True
  mcfg = cfg.model_config()
  assert mcfg.num_samples == 128 and mcfg.t_transform == "log"
  tcfg = cfg.train_config()
  assert tcfg.disparity_depth is True


def test_unknown_key_rejected(tmp_path):
  p = tmp_path / "cfg"
  p.write_text("definitely_not_a_flag = 1\n")
  with pytest.raises(ValueError):
    load_config(["--config", str(p)])


def test_ssim_identity_and_noise():
  img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3),
                    jnp.float32)
  assert float(ssim(img, img)) > 0.999
  noisy = jnp.clip(img + 0.3 * np.random.RandomState(1).randn(32, 32, 3), 0, 1)
  v = float(ssim(img, noisy.astype(jnp.float32)))
  assert v < 0.8
  m = ssim(img, img, return_map=True)
  assert m.shape == (22, 22, 3)  # VALID conv: 32 - 2*(11-1)/2*2


def test_msssim_and_psnr():
  img = jnp.asarray(np.random.RandomState(0).rand(192, 192, 3), jnp.float32)
  assert float(ms_ssim(img, img)) > 0.99
  assert float(psnr(img, img + 0.1)) == pytest.approx(20.0, abs=0.1)


def test_metric_harness_and_miou():
  h = MetricHarness()
  img = jnp.ones((24, 24, 3)) * 0.5
  m = h(img, img + 0.05)
  assert m["psnr"] == pytest.approx(26.02, abs=0.1)
  ev = MiouEvaluator(3)
  gt = np.array([0, 0, 1, 1, 2, 2])
  pred = np.array([0, 0, 1, 2, 2, 2])
  ev.add_batch(gt, pred)
  # class0: 2/2, class1: 1/2, class2: 2/3
  assert ev.miou() == pytest.approx((1 + 0.5 + 2 / 3) / 3, abs=1e-6)


def test_checkpoint_roundtrip(tmp_path):
  from snerf_tpu.train import checkpoints as C
  state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
  C.save_checkpoint(str(tmp_path / "ck"), state, step=7, wait=True)
  target = {"params": {"w": jnp.zeros(4)}, "step": jnp.asarray(0)}
  restored, step = C.restore_checkpoint(str(tmp_path / "ck"), target)
  assert step == 7
  np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                             np.arange(4.0))
  # resume-latest picks the max step
  C.save_checkpoint(str(tmp_path / "ck"), state, step=12, wait=True)
  _, step = C.restore_checkpoint(str(tmp_path / "ck"), target)
  assert step == 12


def test_checkpoint_host_restore(tmp_path):
  """host=True restores numpy leaves (no accelerator transfers) with the
  same values — the fast path for eval/render over the tunneled TPU."""
  from snerf_tpu.train import checkpoints as C
  state = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                      "b": jnp.ones((3,), jnp.bfloat16)},
           "step": jnp.asarray(3)}
  C.save_checkpoint(str(tmp_path / "ck"), state, step=3, wait=True)
  restored, step = C.restore_checkpoint(str(tmp_path / "ck"), state,
                                        host=True)
  assert step == 3
  assert isinstance(restored["params"]["w"], np.ndarray)
  assert restored["params"]["b"].dtype == jnp.bfloat16
  np.testing.assert_array_equal(restored["params"]["w"],
                                np.arange(6.0).reshape(2, 3))
  # numpy leaves feed a jitted step unchanged
  import jax
  out = jax.jit(lambda p: p["w"].sum())(
      {"w": restored["params"]["w"]})
  assert float(out) == 15.0


def test_render_cli_random_mode(tmp_path):
  """render.py --render_mode random on the synthetic fixture."""
  import jax
  import train as T
  import render as R
  import os
  base = str(tmp_path)
  T.main(["--config", "configs/synthetic_tiny", "--basedir", base,
          "--N_iters", "20", "--i_weights", "20", "--i_print", "20",
          "--N_samples", "8", "--N_fine", "8", "--hidden_layer", "16",
          "--proposal_hidden_layer", "16"])
  R.main(["--config", "configs/synthetic_tiny", "--basedir", base,
          "--N_samples", "8", "--N_fine", "8", "--hidden_layer", "16",
          "--proposal_hidden_layer", "16",
          "--render_mode", "random", "--render_n", "2",
          "--render_seed", "1"])
  out = os.path.join(base, "synthetic_tiny", "render")
  assert sorted(os.listdir(os.path.join(out, "rgb"))) == \
      ["00000.png", "00001.png"]
  assert os.path.exists(os.path.join(out, "raw_target_poses.npy"))
  assert os.path.exists(os.path.join(out, "intrinsic.npy"))
  import numpy as np
  poses = np.load(os.path.join(out, "render_poses.npy"))
  assert poses.shape == (2, 4, 4)


def test_pose_checkpoint_stream(tmp_path):
  from snerf_tpu.train import checkpoints as C
  pose = {"r": jnp.ones((4, 3)), "t": jnp.zeros((4, 3))}
  C.save_pose_checkpoint(str(tmp_path), pose, step=5, wait=True)
  target = {"r": jnp.zeros((4, 3)), "t": jnp.zeros((4, 3))}
  restored, step = C.restore_pose_checkpoint(str(tmp_path), target)
  assert step == 5
  np.testing.assert_allclose(np.asarray(restored["r"]), 1.0)


def test_gin_config_adapter(tmp_path):
  """Load the reference's own waymo.gin through the adapter."""
  import shutil
  ref_gin = "/root/reference/s-nerfpp/zipnerf/configs/waymo.gin"
  if os.path.exists(ref_gin):
    p = tmp_path / "waymo.gin"
    shutil.copy(ref_gin, p)
  else:
    p = tmp_path / "waymo.gin"
    p.write_text("Config.exp_name = 'test3'\n"
                 "Config.dataset_loader = 'waymo'\n"
                 "Model.raydist_fn = 'power_transformation'\n")
  cfg = load_config(["--config", str(p)])
  assert cfg.model == "zipnerf"
  assert cfg.expname == "test3"
  assert cfg.dataset_type == "waymo"


def test_cli_resume_continues_training(tmp_path):
  import train as T
  base = str(tmp_path)
  args = ["--config", "configs/synthetic_tiny", "--basedir", base,
          "--i_weights", "20", "--i_print", "20", "--N_samples", "8",
          "--N_fine", "8", "--hidden_layer", "16",
          "--proposal_hidden_layer", "16"]
  T.main(args + ["--N_iters", "20"])
  ckpt_dir = os.path.join(base, "synthetic_tiny", "checkpoints")
  from snerf_tpu.train import checkpoints as C
  assert C.latest_step(ckpt_dir) == 20
  # second invocation resumes from 20 and trains to 40
  T.main(args + ["--N_iters", "40"])
  assert C.latest_step(ckpt_dir) == 40


def test_cli_zip_resume_multidevice(tmp_path):
  """Resuming zip-nerf training on a multi-device mesh: the restored state
  must be replicated over the mesh before the sharded step (the mipnerf
  path had this bug first; ADVICE r1 found the zip path shared it)."""
  import train as T
  base = str(tmp_path)
  args = ["--config", "configs/synthetic_tiny", "--basedir", base,
          "--model", "zipnerf", "--expname", "zip_resume",
          "--i_weights", "4", "--i_print", "4",
          "--zip_batch_size", "16", "--zip_encoder", "ipe",
          "--zip_num_prop_samples", "(4,4)", "--zip_num_nerf_samples", "4",
          "--zip_sample_n", "2", "--zip_grid_num_levels", "3",
          "--zip_log2_hashmap_size", "10", "--zip_bottleneck_width", "16",
          "--zip_prop_grid_resolutions", "(32,64)",
          "--zip_nerf_grid_resolution", "128"]
  T.main(args + ["--zip_max_steps", "4"])
  ckpt_dir = os.path.join(base, "zip_resume", "checkpoints")
  from snerf_tpu.train import checkpoints as C
  assert C.latest_step(ckpt_dir) == 4
  # second invocation restores onto device 0 and must replicate over the
  # 8-device mesh before stepping
  T.main(args + ["--zip_max_steps", "8"])
  assert C.latest_step(ckpt_dir) == 8


def test_bench_smoke_tiny(capsys):
  """bench.py end-to-end in tiny mode (protects the driver-critical
  script from regressions)."""
  import json as _json
  os.environ["BENCH_TINY"] = "1"
  try:
    import importlib
    import bench
    importlib.reload(bench)
    bench.main()
  finally:
    os.environ.pop("BENCH_TINY", None)
  line = capsys.readouterr().out.strip().splitlines()[-1]
  rec = _json.loads(line)
  assert rec["metric"] == "train_rays_per_sec"
  assert rec["value"] > 0


def test_load_config_with_snapshot_restores_structure_flags(tmp_path):
  """eval/render must rebuild the train-time state STRUCTURE from the
  exp-dir args.txt snapshot (regression: a --depth_conf checkpoint was
  un-restorable from eval.py, which built a conf-less target tree)."""
  from snerf_tpu.config import (
      load_config, load_config_with_snapshot, snapshot_config)
  cfg = load_config(["--basedir", str(tmp_path), "--expname", "e1",
                     "--depth_conf", "True", "--conf_num", "2",
                     "--N_rgb", "128"])
  snapshot_config(cfg)

  # eval-style invocation: no structural flags on the CLI
  cfg2 = load_config_with_snapshot(
      ["--basedir", str(tmp_path), "--expname", "e1"])
  assert cfg2.depth_conf is True and cfg2.conf_num == 2
  # CLI still outranks the snapshot
  cfg3 = load_config_with_snapshot(
      ["--basedir", str(tmp_path), "--expname", "e1",
       "--depth_conf", "False"])
  assert cfg3.depth_conf is False and cfg3.conf_num == 2
  # no snapshot -> plain load_config behavior
  cfg4 = load_config_with_snapshot(
      ["--basedir", str(tmp_path), "--expname", "missing"])
  assert cfg4.depth_conf is False


def test_cli_zip_render_from_snapshot(tmp_path):
  """render.py restores a zip-nerf experiment WITHOUT repeating any
  structural flag: model/zip_* come from the args.txt snapshot (the
  snapshot outranks the --config file; fresh CLI flags outrank both)."""
  import train as T
  import render as R
  base = str(tmp_path)
  T.main(["--config", "configs/synthetic_tiny", "--basedir", base,
          "--model", "zipnerf", "--zip_batch_size", "16",
          "--zip_num_prop_samples", "(4,4)", "--zip_num_nerf_samples", "4",
          "--zip_sample_n", "2", "--zip_grid_num_levels", "3",
          "--zip_log2_hashmap_size", "10", "--zip_bottleneck_width", "16",
          "--zip_prop_grid_resolutions", "(32,64)",
          "--zip_nerf_grid_resolution", "128",
          "--zip_max_steps", "4", "--i_weights", "4", "--i_print", "4"])
  R.main(["--config", "configs/synthetic_tiny", "--basedir", base,
          "--render_mode", "test", "--render_n", "1"])
  out = os.path.join(base, "synthetic_tiny", "render")
  assert os.listdir(os.path.join(out, "rgb"))
  assert os.listdir(os.path.join(out, "depth"))


def test_cli_profile_window(tmp_path):
  """--profile_steps N captures a jax.profiler trace into
  <exp_dir>/profile (SURVEY.md §5.1)."""
  import glob

  import train as T
  base = str(tmp_path)
  T.main(["--config", "configs/synthetic_tiny", "--basedir", base,
          "--N_iters", "20", "--i_print", "10", "--i_weights", "20",
          "--profile_steps", "4", "--profile_start", "8"])
  traces = glob.glob(os.path.join(base, "synthetic_tiny", "profile",
                                  "**", "*"), recursive=True)
  assert traces, "no profiler trace files written"


def test_cli_zip_periodic_test_render(tmp_path):
  """zip training renders a held-out view every i_testset steps
  (reference train_render_every, zipnerf/train.py:458-476) and logs
  test_psnr."""
  import json as _json

  import train as T
  base = str(tmp_path)
  T.main(["--config", "configs/synthetic_tiny", "--basedir", base,
          "--model", "zipnerf", "--zip_batch_size", "16",
          "--zip_num_prop_samples", "(4,4)", "--zip_num_nerf_samples", "4",
          "--zip_sample_n", "2", "--zip_grid_num_levels", "3",
          "--zip_log2_hashmap_size", "10", "--zip_bottleneck_width", "16",
          "--zip_prop_grid_resolutions", "(32,64)",
          "--zip_nerf_grid_resolution", "128",
          "--zip_max_steps", "4", "--i_weights", "4", "--i_print", "4",
          "--i_testset", "2"])
  log = os.path.join(base, "synthetic_tiny", "train_log.jsonl")
  entries = [_json.loads(l) for l in open(log)]
  psnrs = [e["test_psnr"] for e in entries if "test_psnr" in e]
  assert len(psnrs) == 2  # steps 2 and 4
  assert all(np.isfinite(p) for p in psnrs)


def test_cp_tri_and_ema_flags_flow_to_configs():
  """round-3 flags: --zip_encoder cp_tri + --zip_ema_decay reach the
  model/train configs (and the encoder-aware lr defaults still fire)."""
  from snerf_tpu.config import Config
  cfg = Config(zip_encoder="cp_tri", zip_cp_tri_resolution=512,
               zip_cp_tri_level_dim=8, zip_ema_decay=0.999)
  m = cfg.zip_model_config()
  assert m.encoder_type == "cp_tri"
  assert m.cp_tri_resolution == 512 and m.cp_tri_level_dim == 8
  t = cfg.zip_train_config()
  assert t.ema_decay == 0.999
  # non-hash encoders drop the hash lr schedule unless overridden
  assert t.lr_init == 0.002 and t.encoder_lr_mult == 4.0
  # mip-family EMA is a separate knob (--ema_decay)
  cfg2 = Config(ema_decay=0.995)
  assert cfg2.train_config().ema_decay == 0.995
  assert cfg2.zip_train_config().ema_decay == 0.0
