"""Diagnose the ~10 dB held-out flatline of bench_quality on the
realfocal fixture (all families; PERF.md run-21). Isolates:
  (a) disk roundtrip: train on the DISK-loaded fixture vs the same
      scene built IN MEMORY by make_synthetic_scene;
  (b) eval-view placement: per-view PSNR for every test view (arc-end
      view 0 is an extrapolation target, mid-arc views interpolate);
  (c) depth supervision: the fixture ships depth maps and the
      reference always trains street scenes with lidar depth.

Usage: python scripts/debug_realfocal.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "nuscenes_realfocal")


def disk_scene():
  from snerf_tpu.data.scene import load_nuscenes_scene
  return load_nuscenes_scene(FIXTURE, bd_factor=0.0, cam_num=0,
                             datahold=8, no_align=True)


def mem_scene():
  from snerf_tpu.data import make_synthetic_scene
  return make_synthetic_scene(
      num_images=48, H=96, W=128, radius=3.0, near=2.0, far=4.5,
      focal=1266.4, detail_blobs=140, detail_extent=0.12,
      detail_sig_range=(0.005, 0.015), detail_only=True,
      n_render_samples=384, datahold=8, arc=np.deg2rad(60.0))


def train_and_eval(tag, scene, depth_mult=0.0):
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state, eval_params,
      make_zip_train_step)
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(
      num_prop_samples=(32, 32), num_nerf_samples=16, sample_n=4,
      raydist_fn="power_transformation", encoder_type="cp_ipe",
      cp_num_levels=4, cp_level_dim=16, cp_base_resolution=128,
      cp_max_resolution=1024, ipe_max_deg=12)
  tcfg = ZipTrainConfig(batch_size=2048, max_steps=STEPS, lr_init=2e-3,
                        lr_final=2e-4, lr_delay_steps=0,
                        encoder_lr_mult=4.0,
                        depth_loss_mult=depth_mult)
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg,
                                          tcfg)
  state = jax.device_put(state, jax.devices()[0])
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=True)
  key = jax.random.PRNGKey(1)
  t0 = time.perf_counter()
  tpsnr = 0.0
  for i in range(1, STEPS + 1):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    if i % 500 == 0:
      tpsnr = float(m.get("psnr", 0.0))
      print(f"[{tag} {i}] loss={float(m['loss']):.5f} "
            f"train_psnr={tpsnr:.2f} ({time.perf_counter()-t0:.0f}s)",
            flush=True)
  fn = jax.jit(lambda p, r: model.apply({"params": p}, r,
                                        rng=None)[0][-1]["rgb"])
  params = eval_params(state)
  per_view = []
  for ti in np.asarray(scene.i_test):
    rays = rays_for_image(jnp.asarray(scene.poses[ti]),
                          jnp.asarray(scene.intrinsics[ti]),
                          scene.hw[0], scene.hw[1], scene.near,
                          scene.far)
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, x.shape[-1]), rays)
    outs = []
    for s in range(0, flat.origins.shape[0], 4096):
      chunk = jax.tree_util.tree_map(lambda x: x[s:s + 4096], flat)
      outs.append(np.asarray(fn(params, chunk)))
    pred = np.concatenate(outs).reshape(*scene.hw, 3)
    gt = scene.images[ti].astype(np.float32) / 255.0
    psnr = -10 * np.log10(np.mean((pred - gt) ** 2))
    per_view.append((int(ti), psnr))
  views = " ".join(f"{t}:{p:.1f}" for t, p in per_view)
  mean = np.mean([p for _, p in per_view])
  print(f"RESULT {tag}: train_psnr={tpsnr:.2f} "
        f"held-out mean={mean:.2f} per-view [{views}]", flush=True)


def main():
  arms = sys.argv[2:] or ["disk", "mem", "disk_depth"]
  sd = disk_scene()
  print(f"disk near/far = {sd.near:.3f}/{sd.far:.3f}", flush=True)
  if "mem" in arms:
    sm = mem_scene()
    # images must roundtrip exactly (poses legitimately differ: the
    # loader recenters + changes convention)
    di = np.max(np.abs(sd.images.astype(np.int32) -
                       sm.images.astype(np.int32)))
    print(f"roundtrip: max image delta={di}  "
          f"mem near/far = {sm.near:.3f}/{sm.far:.3f}", flush=True)
  if "disk" in arms:
    train_and_eval("disk", sd)
  if "mem" in arms:
    train_and_eval("mem", sm)
  if "disk_depth" in arms:
    train_and_eval("disk_depth", sd, depth_mult=0.1)


if __name__ == "__main__":
  main()
