"""Realistic-focal committed fixture (VERDICT r2 next #2): real nuScenes
focal (~1266 px) on a 96x128 crop => production-scale cone radii, so the
zip-nerf family (IPE/CP integrated encoders) trains meaningfully on a
committed fixture — unlike nuscenes_tiny whose toy focal makes IPE
correctly suppress all high frequencies (PERF.md diagnosis).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "nuscenes_realfocal")


def load():
  from snerf_tpu.data.scene import load_nuscenes_scene
  return load_nuscenes_scene(FIXTURE, bd_factor=0.0, cam_num=0,
                             datahold=8, no_align=True)


def test_fixture_has_real_scale_cone_radii():
  scene = load()
  assert scene.images.shape == (48, 96, 128, 3)
  # focal must be the real nuScenes scale, three orders above the toy
  # fixture's 0.8*W = 64
  assert scene.intrinsics[0][0, 0] > 1000
  # ray radii ~ pixel pitch / focal: the production scale is ~1e-3/unit
  from snerf_tpu.data.raygen import rays_for_image
  rays = rays_for_image(jnp.asarray(scene.poses[0]),
                        jnp.asarray(scene.intrinsics[0]),
                        scene.hw[0], scene.hw[1], scene.near, scene.far)
  r = float(np.median(np.asarray(rays.radii)))
  assert 1e-4 < r < 2e-3, r


def test_fixture_views_overlap():
  """The 5.8 deg FoV demands view spacing inside the FoV: with the old
  full-circle layout neighboring views shared NO content (neighbor PSNR
  11.5 dB) and held-out eval was unpredictable by construction."""
  scene = load()

  def psnr(a, b):
    m = np.mean((a.astype(np.float32) / 255 -
                 b.astype(np.float32) / 255) ** 2)
    return -10 * np.log10(m)

  for ti in np.asarray(scene.i_test):
    nb = ti + 1 if ti + 1 < len(scene.images) else ti - 1
    assert psnr(scene.images[ti], scene.images[nb]) > 20.0


def test_fixture_has_high_frequency_content():
  scene = load()
  # detail blobs must actually produce in-frame texture: neighboring
  # pixel differences well above sensor-noise floor
  img = scene.images[0].astype(np.float32)
  grad = np.abs(np.diff(img, axis=1)).mean()
  assert grad > 2.0, grad


def test_zip_cp_trains_on_realfocal_fixture():
  """The zip family must LEARN on this fixture (train PSNR moves well
  above the ~14 dB IPE plateau seen on the toy-focal fixture)."""
  scene = load()
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state, make_zip_train_step)
  dev = scene_to_device(scene)
  mcfg = ZipNerfConfig(encoder_type="cp_ipe", num_prop_samples=(8,),
                       num_levels=2, num_nerf_samples=8, sample_n=2,
                       cp_num_levels=3, cp_level_dim=8,
                       cp_base_resolution=64, cp_max_resolution=512,
                       ipe_max_deg=10, ipe_density_width=64,
                       ipe_density_depth=2, bottleneck_width=32,
                       net_width_viewdirs=32)
  tcfg = ZipTrainConfig(batch_size=512, max_steps=360, lr_init=3e-3,
                        lr_final=1e-3, lr_delay_steps=0,
                        encoder_lr_mult=4.0)
  model, state = create_zip_train_state(jax.random.PRNGKey(0), mcfg,
                                        tcfg)
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=True)
  key = jax.random.PRNGKey(1)
  losses = []
  for i in range(360):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    losses.append(float(m["loss"]))
  assert np.isfinite(losses).all()
  # The failure mode this guards against is the toy-focal plateau
  # (PERF.md: loss flatlines immediately at ~14 dB because IPE
  # suppresses everything). Single-minibatch losses are noisy on the
  # 48-view fixture, so compare 60-step window MEANS: they must
  # decrease monotonically and meaningfully (measured 0.214 -> 0.182,
  # ratio 0.85; the scene is 140 high-frequency blobs — 360 tiny CPU
  # steps only begin fitting it).
  win = [float(np.mean(losses[i:i + 60])) for i in range(0, 360, 60)]
  assert all(b < a for a, b in zip(win, win[1:])), win
  assert win[-1] < 0.9 * win[0], win


def test_fixture_multiview_photoconsistency():
  """The DISK-loaded fixture must be geometrically consistent: warping
  a neighbor view through the loaded depth + poses + intrinsics must
  photometrically match. Guards the generator's pose-convention
  contract with build_poses_bounds — before the round-3 fix the
  written c2ws were in the loader's OUTPUT convention instead of
  OpenCV, each camera came back y/z-flipped, and every model family
  flatlined at ~10 dB held-out while this metric read
  photo_err 0.30 / valid 58% (fixed: 0.005 / 99%)."""
  from snerf_tpu.models.confidence import warp_image
  scene = load()
  for i in (5, 20, 35):
    base = jnp.asarray(scene.images[i], jnp.float32) / 255.0
    tgt = jnp.asarray(scene.images[i + 1], jnp.float32) / 255.0
    fake, _, _, valid = warp_image(
        jnp.asarray(scene.depths[i]), jnp.asarray(scene.poses[i]),
        jnp.asarray(scene.intrinsics[i]), tgt,
        jnp.asarray(scene.depths[i + 1]),
        jnp.asarray(scene.poses[i + 1]),
        jnp.asarray(scene.intrinsics[i + 1]))
    v = np.asarray(valid)
    err = float(np.abs(np.asarray(fake) - np.asarray(base))[v].mean())
    assert v.mean() > 0.9, v.mean()
    assert err < 0.03, err
