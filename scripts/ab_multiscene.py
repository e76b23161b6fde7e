"""Multi-scene seed-paired equal-wall-clock encoder ladder
(VERDICT r3 next #3: the "cp_hash F=64 beats exact hash" headline
rested on ONE synthetic scene largely at seed 1).

Scenes:
  a: the round-3 protocol — 24 views, 192x256, default ~64 deg FoV,
     smooth 3-blob content (scripts/ab_round3.py:632).
  b: different content + FoV + resolution — 24 views, 160x160,
     focal=0.5*W (~90 deg FoV), 48 high-frequency detail blobs.

Arms (the runs-19..21 ladder, PERF.md):
  hash    exact instant-NGP 10x2^19, lr 8e-3, 5000 steps
  cns_ema cp_hash F=16 + EMA, 5000 steps
  f64     cp_hash F=64 + 10% lr warmup + EMA, 20000 steps
          (equal-wall-clock comparison point vs hash@5000)

Usage:
  python scripts/ab_multiscene.py --scene b --seeds 0 1 2 \
      --arms hash cns_ema f64 [--out /tmp/ab_b.json]
Emits one JSON line per (scene, arm, seed).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

BATCH = 1024
COMMON = dict(num_prop_samples=(16, 16), num_nerf_samples=8, sample_n=3,
              raydist_fn="power_transformation")

ARMS = {
    "hash": dict(steps=5000, lr=8e-3, encoder_lr_mult=1.0,
                 lr_delay_frac=0.0, ema=0.0,
                 mcfg=dict(encoder_type="hash", grid_num_levels=10,
                           grid_log2_hashmap_size=19)),
    "cns_ema": dict(steps=5000, lr=2e-3, encoder_lr_mult=4.0,
                    lr_delay_frac=0.0, ema=0.999,
                    mcfg=dict(encoder_type="cp_hash", ipe_max_deg=12,
                              cp_num_levels=4, cp_level_dim=16,
                              cp_base_resolution=128,
                              cp_max_resolution=1024,
                              cp_hash_resolution=2048, cp_hash_log2=19,
                              cp_hash_use_spread=False)),
    "f64": dict(steps=20000, lr=2e-3, encoder_lr_mult=4.0,
                lr_delay_frac=0.1, ema=0.999,
                mcfg=dict(encoder_type="cp_hash", ipe_max_deg=12,
                          cp_num_levels=4, cp_level_dim=64,
                          cp_base_resolution=128,
                          cp_max_resolution=1024,
                          cp_hash_resolution=2048, cp_hash_log2=19,
                          cp_hash_use_spread=False)),
}

# Stability-knob variants (round-4: cns_ema DIVERGES on scene b seeds
# 0/1 — 14.56 dB — and f64 seed 2 lands at 34.2; the bounded factor
# tables / per-level lr knobs are the candidate cures). Same ladder
# protocol; *_bound arms run WITHOUT the 10% warmup crutch.
ARMS["cns_bound"] = dict(
    ARMS["cns_ema"],
    mcfg={**ARMS["cns_ema"]["mcfg"], "cp_factor_bound": 0.5})
ARMS["f64_bound"] = dict(
    ARMS["f64"], lr_delay_frac=0.0,
    mcfg={**ARMS["f64"]["mcfg"], "cp_factor_bound": 0.5})
ARMS["f64_plvl"] = dict(
    ARMS["f64"], lr_delay_frac=0.0,
    tcfg=dict(encoder_level_lr_gamma=0.5))
# density_zero_init: THE measured cure (f64 probe dz64: trains from
# lr_delay 0 to 40.2 dB @ 800 steps where base64 collapses to 9.4) —
# zero the density column of density_out so the CP features' DC cannot
# kick the density head at step 0.
ARMS["cns_dz"] = dict(
    ARMS["cns_ema"],
    mcfg={**ARMS["cns_ema"]["mcfg"], "density_zero_init": True})
ARMS["f64_dz"] = dict(
    ARMS["f64"], lr_delay_frac=0.0,
    mcfg={**ARMS["f64"]["mcfg"], "density_zero_init": True})
# F=128 capacity point (VERDICT r3 #4 done-criterion), dz-cured
ARMS["f128_dz"] = dict(
    ARMS["f64"], lr_delay_frac=0.0,
    mcfg={**ARMS["f64"]["mcfg"], "cp_level_dim": 128,
          "density_zero_init": True})
# anisotropic cast + topology on the A/B ladder (scene-level check of
# the realfocal win; same 5k budget as cns_ema)
ARMS["cns_aniso"] = dict(
    ARMS["cns_ema"],
    mcfg={**ARMS["cns_ema"]["mcfg"], "cp_anisotropic": True,
          "ipe_skip_layer": 4, "density_hidden_width": 512,
          "density_zero_init": True})
# round-5 scene-b cure: centered CP features scaled to the instant-NGP
# small-init regime (cp_feature_center + scale 1e-2 + dz) — the probe
# arm cnsb_small_dz trains to >30 dB on scene b where every other knob
# (warm/bound/dz/clip/bias/lr) pins at the 14.90 constant-color floor
# (PERF.md round-5). Ladder arms measure its scene-a cost and its
# composition with the production aniso arm.
ARMS["cns_small"] = dict(
    ARMS["cns_ema"],
    mcfg={**ARMS["cns_ema"]["mcfg"], "cp_feature_center": True,
          "cp_feature_scale": 0.01, "density_zero_init": True})
ARMS["cns_aniso_small"] = dict(
    ARMS["cns_ema"],
    mcfg={**ARMS["cns_ema"]["mcfg"], "cp_anisotropic": True,
          "ipe_skip_layer": 4, "density_hidden_width": 512,
          "density_zero_init": True, "cp_feature_center": True,
          "cp_feature_scale": 0.01})
ARMS["f64_small"] = dict(
    ARMS["f64"], lr_delay_frac=0.0,
    mcfg={**ARMS["f64"]["mcfg"], "cp_feature_center": True,
          "cp_feature_scale": 0.01, "density_zero_init": True})
# center at FULL noise scale (the probe's simplest scene-b cure:
# centering alone trains; scale 1e-2 additionally needs dz) — the
# shipping candidates
ARMS["cns_center"] = dict(
    ARMS["cns_ema"],
    mcfg={**ARMS["cns_ema"]["mcfg"], "cp_feature_center": True,
          "density_zero_init": True})
# the SHIPPED config's encoder recipe minus aniso/topology: F=64 +
# center at FULL scale + dz (f64_small's scale-1e-2 variant collapses
# on scene b where plain f64_dz trains — the scale knob, not
# centering, is the F=64 wide-FoV re-trigger hypothesis under test)
ARMS["f64_center"] = dict(
    ARMS["f64"], lr_delay_frac=0.0,
    mcfg={**ARMS["f64"]["mcfg"], "cp_feature_center": True,
          "density_zero_init": True})
ARMS["cns_aniso_center"] = dict(
    ARMS["cns_ema"],
    mcfg={**ARMS["cns_ema"]["mcfg"], "cp_anisotropic": True,
          "ipe_skip_layer": 4, "density_hidden_width": 512,
          "density_zero_init": True, "cp_feature_center": True})


def make_scene(which):
  from snerf_tpu.data import make_synthetic_scene
  if which == "a":
    return make_synthetic_scene(num_images=24, H=192, W=256,
                                datahold=8)
  if which == "b":
    return make_synthetic_scene(num_images=24, H=160, W=160,
                                focal=80.0, detail_blobs=48,
                                datahold=8)
  raise ValueError(which)


def run_arm(scene, dev, arm, seed):
  import jax
  import jax.numpy as jnp
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state, eval_params,
      make_zip_train_step)

  spec = ARMS[arm]
  steps = spec["steps"]
  mcfg = ZipNerfConfig(**spec["mcfg"], **COMMON)
  tcfg = ZipTrainConfig(
      batch_size=BATCH, max_steps=steps, lr_init=spec["lr"],
      lr_final=spec["lr"] / 10,
      lr_delay_steps=int(spec["lr_delay_frac"] * steps),
      lr_delay_mult=1e-3 if spec["lr_delay_frac"] > 0 else 1.0,
      encoder_lr_mult=spec["encoder_lr_mult"], ema_decay=spec["ema"],
      **spec.get("tcfg", {}))
  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, state = create_zip_train_state(jax.random.PRNGKey(seed),
                                          mcfg, tcfg)
  state = jax.device_put(state, jax.devices()[0])
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=True)
  key = jax.random.PRNGKey(seed + 1)
  state, m = step(state, key)     # compile (excluded from wall)
  float(m["loss"])
  t0 = time.perf_counter()
  for i in range(1, steps + 1):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    if i % 1000 == 0:
      assert np.isfinite(float(m["loss"])), (arm, seed, i)
  float(m["loss"])
  wall = time.perf_counter() - t0

  fn = jax.jit(lambda p, r: model.apply({"params": p}, r,
                                        rng=None)[0][-1]["rgb"])
  rparams = eval_params(state)
  psnrs = []
  for ti in np.asarray(scene.i_test)[:2]:
    rays = rays_for_image(jnp.asarray(scene.poses[ti]),
                          jnp.asarray(scene.intrinsics[ti]),
                          scene.hw[0], scene.hw[1], scene.near,
                          scene.far)
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, x.shape[-1]), rays)
    n = flat.origins.shape[0]
    outs = []
    for s in range(0, n, 4096):
      chunk = jax.tree_util.tree_map(lambda x: x[s:s + 4096], flat)
      outs.append(np.asarray(fn(rparams, chunk)))
    pred = np.concatenate(outs).reshape(*scene.hw, 3)
    gt = scene.images[ti].astype(np.float32) / 255.0
    mse = float(np.mean((pred - gt) ** 2))
    psnrs.append(-10 * np.log10(mse))
  return float(np.mean(psnrs)), wall


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--scene", choices=["a", "b"], required=True)
  ap.add_argument("--arms", nargs="+", default=["hash", "cns_ema",
                                                "f64"])
  ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
  ap.add_argument("--out", type=str, default="")
  args = ap.parse_args()

  from snerf_tpu.data.sampler import scene_to_device
  scene = make_scene(args.scene)
  dev = scene_to_device(scene)
  lines = []
  for seed in args.seeds:
    for arm in args.arms:
      psnr, wall = run_arm(scene, dev, arm, seed)
      rec = {"scene": args.scene, "arm": arm, "seed": seed,
             "steps": ARMS[arm]["steps"], "psnr": round(psnr, 2),
             "wall_s": round(wall, 1)}
      line = json.dumps(rec)
      print(line, flush=True)
      lines.append(line)
      if args.out:
        with open(args.out, "w") as f:
          f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
  main()
