"""Instrumented reproduction of the CP F>=64 lr_delay=0 divergence
(VERDICT r3 next #4: understand and remove the 10% warmup crutch).

Known facts (PERF.md rounds 3-4): cp_ipe/cp_hash with cp_level_dim=64
(256 total CP dims) lands at 9.24 dB (constant output) when trained at
full lr from step 0 on the 24-view synthetic protocol — at every lr
(2e-3/3e-3/8e-3), init scale (0.05/0.1), feature norm (center/
layernorm), and matmul precision (DEFAULT/HIGHEST) tried — and a 10%
lr warmup (the reference's own shipped schedule, lr_delay_mult 1e-3)
cures it. F=16 trains everywhere.

ROUND-4 CORRECTION: the round-3 "trains on the CPU backend" datapoint
was an artifact — JAX_PLATFORMS=cpu alone is overridden by the axon
plugin, so that control silently ran on the chip. With the backend
actually forced (--cpu), the CPU trajectory collapses identically
(step-800: psnr 9.45, rgb_std 0, dens_mean 22k, grads ~1e-14) — the
divergence is BACKEND-INDEPENDENT, not TPU numerics.

Measured mechanism (base64, both backends): all-opaque collapse inside
the first 40 steps — density 0.7 -> 3000 while rgb_std -> 0, then
gradients vanish (1e-13, saturated). The CP features' DC (init mean 1
x 256 dims) kicks the density head at step 0.

Per --log_every steps it records:
  loss / train psnr            (step metrics)
  gnorm_grid / gnorm_net       (pre-clip grad norms, debug_grad_norms)
  per-level factor-table stats (max |v|, rms(v - 1); host-side)
  probe-ray forward stats      (per-level mean/max density, final acc)

Arms:
  base64   F=64, lr_delay 0            (expected: diverges on TPU)
  base16   F=16, lr_delay 0            (control: trains)
  warm64   F=64, 10% warmup            (control: trains)
plus candidate-fix arms added as config knobs grow (bounded factors,
per-level lr, encoder-only clip).

Usage: python scripts/probe_f64_stability.py --arm base64 \
    [--steps 800] [--log_every 20] [--out /tmp/f64_base.jsonl]
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
    "base64": dict(level_dim=64, lr_delay_frac=0.0),
    "base16": dict(level_dim=16, lr_delay_frac=0.0),
    "warm64": dict(level_dim=64, lr_delay_frac=0.1),
    # candidate fixes (all lr_delay 0)
    "bound64": dict(level_dim=64, lr_delay_frac=0.0,
                    mcfg=dict(cp_factor_bound=0.5)),
    "plvl64": dict(level_dim=64, lr_delay_frac=0.0,
                   tcfg=dict(encoder_level_lr_gamma=0.5)),
    "clip64": dict(level_dim=64, lr_delay_frac=0.0,
                   tcfg=dict(encoder_grad_max_norm=0.0005)),
    "b2_64": dict(level_dim=64, lr_delay_frac=0.0,
                  tcfg=dict(adam_beta2=0.999, adam_eps=1e-8)),
    # zero-init the density column of density_out: the measured failure
    # mode (TPU probe, base64) is an all-opaque collapse inside the
    # first 40 steps (dens_mean 0.7 -> 2963, rgb_std -> 0, grads ->
    # 1e-13 saturated) — the CP features' DC (init mean 1 x 256 dims)
    # kicks the density head hard at step 0; mip's zero-mean IPE
    # features never do. Zero column = density starts at
    # softplus(bias) everywhere, no early kick.
    "dz64": dict(level_dim=64, lr_delay_frac=0.0,
                 mcfg=dict(density_zero_init=True)),
    # capacity scaling past the old F=64 wall, under the cure
    "dz128": dict(level_dim=128, lr_delay_frac=0.0,
                  mcfg=dict(density_zero_init=True)),
}

# Scene-b instability family (round-4: the cns cp_hash F=16 arms
# collapse to scene b's constant-output 14.56 dB at seeds 0/1 at full
# lr REGARDLESS of density_zero_init or the anisotropic cast — a
# DIFFERENT failure than the F>=64 DC-kick; never probed with warmup
# or bounded tables). Use with --scene b; config mirrors
# ab_multiscene's cns arm (cp_hash, F=16, lr 2e-3 x4).
_CNS_MCFG = dict(encoder_type="cp_hash", ipe_max_deg=12,
                 cp_num_levels=4, cp_level_dim=16,
                 cp_base_resolution=128, cp_max_resolution=1024,
                 cp_hash_resolution=2048, cp_hash_log2=19,
                 cp_hash_use_spread=False)
ARMS.update({
    "cnsb_base": dict(level_dim=16, lr_delay_frac=0.0,
                      mcfg=dict(_CNS_MCFG)),
    "cnsb_warm": dict(level_dim=16, lr_delay_frac=0.1,
                      mcfg=dict(_CNS_MCFG)),
    "cnsb_bound": dict(level_dim=16, lr_delay_frac=0.0,
                       mcfg={**_CNS_MCFG, "cp_factor_bound": 0.5}),
    "cnsb_dz": dict(level_dim=16, lr_delay_frac=0.0,
                    mcfg={**_CNS_MCFG, "density_zero_init": True}),
    "cnsb_clip": dict(level_dim=16, lr_delay_frac=0.0,
                      mcfg=dict(_CNS_MCFG),
                      tcfg=dict(encoder_grad_max_norm=0.0005)),
    # Transparent-init family: the measured scene-b signature is
    # acc_mean=1.0 at step 1 — softplus(density_bias=-1) ~ 0.31 makes
    # the INIT itself a near-opaque fog over scene-b's ray lengths, so
    # the all-opaque minimum is downhill from step 0 regardless of the
    # DC kick (dz) or the lr schedule (warm collapses by step 40 at
    # ~1e-3 of full lr). Start transparent instead: bias=-5 gives
    # softplus(-5) ~ 6.7e-3 (acc ~ 0 at init), dz removes the kick.
    "cnsb_bias": dict(level_dim=16, lr_delay_frac=0.0,
                      mcfg={**_CNS_MCFG, "density_bias": -5.0}),
    "cnsb_dzbias": dict(level_dim=16, lr_delay_frac=0.0,
                        mcfg={**_CNS_MCFG, "density_bias": -5.0,
                              "density_zero_init": True}),
    # Trunk-side arms: step-1 gnorm_net is 0.4 (vs gnorm_grid 5e-4) —
    # the constant-color commit is driven by the TRUNK/head update,
    # which encoder-side knobs (bound/clip/dz/warm lr ramp) never
    # touch. cnsb_lr1 halves the trunk lr while holding the encoder's
    # ABSOLUTE lr constant (encoder lr = encoder_lr_mult x base
    # schedule, zip_trainer.py:206 — so lr_init 2e-3 x4 == 1e-3 x8),
    # isolating the trunk as the variable; cnsb_gclip is a 10x tighter
    # global clip.
    "cnsb_lr1": dict(level_dim=16, lr_delay_frac=0.0,
                     mcfg=dict(_CNS_MCFG),
                     tcfg=dict(lr_init=1e-3, lr_final=1e-4,
                               encoder_lr_mult=8.0)),
    "cnsb_gclip": dict(level_dim=16, lr_delay_frac=0.0,
                       mcfg=dict(_CNS_MCFG),
                       tcfg=dict(grad_max_norm=0.0001)),
    # Wave-2 arms (round-5): the wave-1 result is that EVERY encoder-
    # side knob (warm/bound/dz/clip) and the transparent init (bias -5)
    # still land at the constant-color 14.90 floor — dz flips the
    # collapse to all-TRANSPARENT (density -> 0, the opaque background
    # absorbing every ray) instead of all-opaque, so the attractor is
    # the constant-color solution itself, reachable in either density
    # direction. These arms bisect encoder family vs trunk dynamics vs
    # compositing semantics:
    "cnsb_ipe": dict(level_dim=16, lr_delay_frac=0.0,
                     mcfg=dict(encoder_type="ipe", ipe_max_deg=12)),
    "cnsb_hash": dict(level_dim=16, lr_delay_frac=0.0,
                      mcfg=dict(encoder_type="hash", grid_num_levels=10,
                                grid_log2_hashmap_size=19)),
    # the ladder's hash arm trains at lr 8e-3 mult 1 — control at the
    # cns schedule AND at its own
    "cnsb_hash8": dict(level_dim=16, lr_delay_frac=0.0,
                       mcfg=dict(encoder_type="hash",
                                 grid_num_levels=10,
                                 grid_log2_hashmap_size=19),
                       tcfg=dict(lr_init=8e-3, lr_final=8e-4,
                                 encoder_lr_mult=1.0)),
    # transparent background: remove the free constant-color sink
    "cnsb_nobg": dict(level_dim=16, lr_delay_frac=0.0,
                      mcfg={**_CNS_MCFG, "opaque_background": False}),
    # coarse-to-fine CP level window (rescued F=64 in round 3)
    "cnsb_anneal": dict(level_dim=16, lr_delay_frac=0.0,
                        mcfg={**_CNS_MCFG, "cp_anneal_frac": 0.3}),
    # the shipped production cast + topology on scene b
    "cnsb_aniso": dict(level_dim=16, lr_delay_frac=0.0,
                       mcfg={**_CNS_MCFG, "cp_anisotropic": True,
                             "ipe_skip_layer": 4,
                             "density_hidden_width": 512,
                             "density_zero_init": True}),
    # a deeper global lr cut than lr1's half
    "cnsb_lr5e4": dict(level_dim=16, lr_delay_frac=0.0,
                       mcfg=dict(_CNS_MCFG),
                       tcfg=dict(lr_init=5e-4, lr_final=5e-5,
                                 encoder_lr_mult=16.0)),
    # CP feature output transform (models/cpgrid.py): zero-mean
    # features (center) and the instant-NGP small-init regime
    # (center + scale 1e-2). Hypothesis: the collapse is the trunk
    # exploiting the O(init_scale) spatial feature noise to build the
    # constant-color solution before the tables learn structure —
    # hash's U(-1e-4,1e-4) init denies it that lever, which is why the
    # exact-hash arm trains where every cns arm collapses.
    "cnsb_center": dict(level_dim=16, lr_delay_frac=0.0,
                        mcfg={**_CNS_MCFG, "cp_feature_center": True}),
    "cnsb_small": dict(level_dim=16, lr_delay_frac=0.0,
                       mcfg={**_CNS_MCFG, "cp_feature_center": True,
                             "cp_feature_scale": 0.01}),
    "cnsb_small_dz": dict(level_dim=16, lr_delay_frac=0.0,
                          mcfg={**_CNS_MCFG, "cp_feature_center": True,
                                "cp_feature_scale": 0.01,
                                "density_zero_init": True}),
    # center at FULL noise scale trains without dz (34.1 dB @400 CPU
    # steps) — the DC was the poison, not the noise scale. This arm
    # validates the shipping candidate: center + dz together (dz is
    # auto-on for cp encoders and cures the separate F>=64 DC-kick).
    "cnsb_center_dz": dict(level_dim=16, lr_delay_frac=0.0,
                           mcfg={**_CNS_MCFG, "cp_feature_center": True,
                                 "density_zero_init": True}),
})

# The production-trio bisect under the cure (ladder fact: cns_small
# [center+scale+dz] trains to 41.1 on scene b, but cns_aniso_small
# [the same + cp_anisotropic + ipe_skip_layer 4 +
# density_hidden_width 512] collapses right back to 14.56): which of
# the three round-4 production knobs re-triggers the commit?
_CURE = {"cp_feature_center": True, "cp_feature_scale": 0.01,
         "density_zero_init": True}
ARMS.update({
    "cnsb_cure_aniso": dict(level_dim=16, lr_delay_frac=0.0,
                            mcfg={**_CNS_MCFG, **_CURE,
                                  "cp_anisotropic": True}),
    "cnsb_cure_skip": dict(level_dim=16, lr_delay_frac=0.0,
                           mcfg={**_CNS_MCFG, **_CURE,
                                 "ipe_skip_layer": 4}),
    "cnsb_cure_dh": dict(level_dim=16, lr_delay_frac=0.0,
                         mcfg={**_CNS_MCFG, **_CURE,
                               "density_hidden_width": 512}),
})


def factor_stats(params):
  """Host-side stats of the nerf MLP's CP factor tables.

  Takes the LIVE (device) param tree and fetches ONLY the cp_grid
  subtree — device_get of the full tree stalls the tunnel for the
  cp_hash arms (the 2^19-row hash level alone is ~32 MB per pull).
  """
  import jax
  out = {}
  try:
    cp = params["nerf_mlp"]["cp_grid"]
  except (KeyError, TypeError):
    for k in params:
      if "cp_grid" in str(k):
        cp = params[k]
        break
    else:
      return out
  for name, v in cp.items():
    v = np.asarray(jax.device_get(v))
    out[f"{name}_absmax"] = float(np.max(np.abs(v)))
    out[f"{name}_rms1"] = float(np.sqrt(np.mean((v - 1.0) ** 2)))
  return out


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--arm", default="base64", choices=sorted(ARMS))
  ap.add_argument("--steps", type=int, default=800)
  ap.add_argument("--log_every", type=int, default=20)
  ap.add_argument("--seed", type=int, default=0)
  ap.add_argument("--out", type=str, default="")
  ap.add_argument("--cpu", action="store_true",
                  help="force the CPU backend (the JAX_PLATFORMS env "
                       "var alone is overridden by the axon plugin)")
  ap.add_argument("--scene", default="a", choices=["a", "b"])
  args = ap.parse_args()

  import jax
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp
  from snerf_tpu.data import make_synthetic_scene
  from snerf_tpu.data.raygen import rays_for_image
  from snerf_tpu.data.sampler import scene_to_device
  from snerf_tpu.models.zipnerf import ZipNerfConfig
  from snerf_tpu.train.zip_trainer import (
      ZipTrainConfig, create_zip_train_state, make_zip_train_step)

  spec = ARMS[args.arm]
  if args.scene == "a":
    scene = make_synthetic_scene(num_images=24, H=192, W=256,
                                 datahold=8)
  else:
    scene = make_synthetic_scene(num_images=24, H=160, W=160,
                                 focal=80.0, detail_blobs=48,
                                 datahold=8)
  dev = scene_to_device(scene)

  mkw = dict(encoder_type="cp_ipe", ipe_max_deg=12, cp_num_levels=4,
             cp_level_dim=spec["level_dim"], cp_base_resolution=128,
             cp_max_resolution=1024, **COMMON)
  mkw.update(spec.get("mcfg", {}))
  mcfg = ZipNerfConfig(**mkw)
  f = spec["lr_delay_frac"]
  tkw = dict(batch_size=BATCH, max_steps=args.steps, lr_init=2e-3,
             lr_final=2e-4, lr_delay_steps=int(f * args.steps),
             lr_delay_mult=1e-3 if f > 0 else 1.0,
             encoder_lr_mult=4.0, debug_grad_norms=True)
  tkw.update(spec.get("tcfg", {}))
  tcfg = ZipTrainConfig(**tkw)

  cpu = jax.devices("cpu")[0]
  with jax.default_device(cpu):
    model, state = create_zip_train_state(
        jax.random.PRNGKey(args.seed), mcfg, tcfg)
  state = jax.device_put(state, jax.devices()[0])
  step = make_zip_train_step(model, mcfg, tcfg, dev, scene.i_train,
                             scene.near, scene.far, donate=True)

  # fixed probe rays: 512 rays from the first held-out view
  ti = int(np.asarray(scene.i_test)[0])
  rays = rays_for_image(jnp.asarray(scene.poses[ti]),
                        jnp.asarray(scene.intrinsics[ti]),
                        scene.hw[0], scene.hw[1], scene.near, scene.far)
  flat = jax.tree_util.tree_map(
      lambda x: x.reshape(-1, x.shape[-1]), rays)
  idx = np.linspace(0, flat.origins.shape[0] - 1, 512).astype(int)
  probe_rays = jax.tree_util.tree_map(lambda x: x[idx], flat)

  @jax.jit
  def diag(params, rays):
    rend, hist = model.apply({"params": params}, rays, rng=None)
    out = {}
    for li, h in enumerate(hist):
      out[f"dens_mean_{li}"] = jnp.mean(h["density"])
      out[f"dens_max_{li}"] = jnp.max(h["density"])
    out["acc_mean"] = jnp.mean(rend[-1]["acc"])
    out["rgb_std"] = jnp.std(rend[-1]["rgb"])
    return out

  recs = []
  key = jax.random.PRNGKey(args.seed + 1)
  t0 = time.perf_counter()
  for i in range(1, args.steps + 1):
    key, k = jax.random.split(key)
    state, m = step(state, k)
    if i % args.log_every == 0 or i == 1:
      rec = {"step": i,
             "loss": float(m["loss"]),
             "psnr": float(m.get("psnr", 0.0)),
             "gnorm_grid": float(m.get("gnorm_grid", -1.0)),
             "gnorm_net": float(m.get("gnorm_net", -1.0))}
      d = diag(state.params, probe_rays)
      rec.update({k2: round(float(v), 6) for k2, v in d.items()})
      rec.update({k2: round(v, 5)
                  for k2, v in factor_stats(state.params).items()})
      line = json.dumps(rec)
      print(line, flush=True)
      recs.append(line)
  print(f"# arm={args.arm} wall={time.perf_counter() - t0:.1f}s",
        flush=True)
  if args.out:
    with open(args.out, "w") as fo:
      fo.write("\n".join(recs) + "\n")


if __name__ == "__main__":
  main()
