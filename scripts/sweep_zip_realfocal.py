"""Round-4 sweep: close (or bound) the zip-vs-mip gap on the committed
street-focal fixture (VERDICT r3 next #1).

Facts the sweep is built on (BENCH_QUALITY_r03.json): every zip arm
underfits the TRAIN views (31.6-31.9 dB) while mip fits them at 41.6 —
so the deficit is model/sampling capacity under this protocol, not
generalization. The knobs swept are exactly the ones the reference
itself tunes per scene family: sample budget (zipnerf waymo.gin trains
with prop (64,64) + 32 nerf samples — our bench arm halved them),
raydist warp (internal/coord.py power_transformation vs linear over a
2.4-5.2 m metric band), IPE frequency ceiling, trunk width, and depth
supervision (internal/train.py inverse-depth loss).

Usage: python scripts/sweep_zip_realfocal.py [--steps 2000] [--arms a b]
Emits one JSON line per arm (same schema as bench_quality).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench_quality as bq

# The batch-7 composite: every mip-equivalence at once. Model side:
# unit-ball world (contraction identity), deg-16 IPE, 512x8 trunk
# (mip: hidden 512, net_depth 8 vs zip ipe_density_depth 4), deg_view 4
# (mip default; the reference's waymo.gin pins zip to deg_view 1),
# mip's sample ladder with dilation off and point evaluation (n=1),
# linear raydist (mip lindisp=False), anneal off. Loss side: MSE
# (charb_padding -> 0), no distortion loss; depth supervision at mip's
# strength rides the arm spec (depth_mult=0.1).
_MIPEQ_MODEL = dict(scene_scale=0.2725, ipe_max_deg=16,
                    ipe_density_width=512, ipe_density_depth=8,
                    deg_view=4, num_prop_samples=(64, 64),
                    num_nerf_samples=64, dilation_multiplier=0.0,
                    dilation_bias=0.0, sample_n=1, raydist_fn=None,
                    anneal_slope=0.0)
_MIPEQ_LOSS = dict(distortion_loss_mult=0.0, charb_padding=1e-6)

# arm -> (encoder, model-config overrides, trainer overrides, extras)
ARMS = {
    # the shipped bench arm, as-is (baseline for the sweep)
    "base": dict(encoder="ipe"),
    # reference sample budget: waymo.gin prop (64,64), 32 nerf samples
    "samples": dict(encoder="ipe",
                    overrides=dict(num_prop_samples=(64, 64),
                                   num_nerf_samples=32)),
    # frequency ceiling to mip's deg 16
    "deg16": dict(encoder="ipe", overrides=dict(ipe_max_deg=16)),
    # trunk capacity to mip's 512
    "wide": dict(encoder="ipe", overrides=dict(ipe_density_width=512)),
    # linear raydist over the narrow metric band (power_transformation
    # warps toward near — wrong prior for a 2.4-5.2 m band?)
    "lin": dict(encoder="ipe", overrides=dict(raydist_fn=None)),
    # lidar depth supervision at the mip arm's strength
    "depth": dict(encoder="ipe", depth_mult=0.1),
    # combinations of single-knob winners
    "samples_deg16": dict(encoder="ipe",
                          overrides=dict(num_prop_samples=(64, 64),
                                         num_nerf_samples=32,
                                         ipe_max_deg=16)),
    "samples_deg16_wide": dict(
        encoder="ipe",
        overrides=dict(num_prop_samples=(64, 64), num_nerf_samples=32,
                       ipe_max_deg=16, ipe_density_width=512)),
    "samples_deg16_lin": dict(
        encoder="ipe",
        overrides=dict(num_prop_samples=(64, 64), num_nerf_samples=32,
                       ipe_max_deg=16, raydist_fn=None)),
    # anneal off (anneal_slope=10 biases early prop weights)
    "samples_deg16_noanneal": dict(
        encoder="ipe",
        overrides=dict(num_prop_samples=(64, 64), num_nerf_samples=32,
                       ipe_max_deg=16, anneal_slope=0.0)),
    # the winner stack on the production cp_hash encoder
    "cp_hash_stack": dict(
        encoder="cp_hash", ema=0.999, lr_delay_frac=0.1,
        overrides=dict(cp_level_dim=64, num_prop_samples=(64, 64),
                       num_nerf_samples=32, ipe_max_deg=16)),
    # batch 2: the structural suspects (batch-1 knobs all landed within
    # 0.5 dB — train PSNR pinned at ~30.5-30.9)
    "lr4": dict(encoder="ipe", tcfg_overrides=dict(lr_init=4e-3,
                                                   lr_final=4e-4)),
    "nodist": dict(encoder="ipe",
                   tcfg_overrides=dict(distortion_loss_mult=0.0)),
    "noreg": dict(encoder="ipe",
                  tcfg_overrides=dict(distortion_loss_mult=0.0,
                                      anti_interlevel_loss_mult=0.0)),
    "raydist_none": dict(encoder="ipe", overrides=dict(raydist_fn=None)),
    "mse": dict(encoder="ipe", tcfg_overrides=dict(charb_padding=1e-6)),
    # batch 3: the contraction hypothesis. The fixture is loaded
    # no_align (metric world): content sits at radius ~3.1-3.3 from the
    # origin, DEEP in the contracted tail where radial encoder
    # resolution falls as 1/r^2 (the whole 0.23 m depth band collapses
    # to a 0.023-thick shell of contract space). The reference never
    # sees this because transform_poses_pca pre-scales the world
    # (internal/camera_utils.py:162-203). scene_scale = 1/far keeps
    # content inside the unit ball (zero contraction distortion).
    "scale": dict(encoder="ipe", overrides=dict(scene_scale=0.2725)),
    "scale_half": dict(encoder="ipe", overrides=dict(scene_scale=0.5)),
    "scale_lr4": dict(encoder="ipe",
                      overrides=dict(scene_scale=0.2725),
                      tcfg_overrides=dict(lr_init=4e-3, lr_final=4e-4)),
    "scale_stack": dict(encoder="ipe",
                        overrides=dict(scene_scale=0.2725,
                                       ipe_max_deg=16,
                                       ipe_density_width=512),
                        tcfg_overrides=dict(lr_init=4e-3,
                                            lr_final=4e-4)),
    "scale_cp_hash": dict(encoder="cp_hash", ema=0.999,
                          lr_delay_frac=0.1,
                          overrides=dict(scene_scale=0.2725,
                                         cp_level_dim=64)),
    # batch 4: the reference-schedule hypothesis. Every batch-1..3 knob
    # lands within 0.7 dB at 2k steps with curves still climbing; the
    # reference trains zipnerf for 25-50k steps (config.gin:3-14,
    # train.py:152) while the r03 bench compared families at 4k. Run
    # the best single-knob stack at the reference budget.
    "wide_lr4": dict(encoder="ipe",
                     overrides=dict(ipe_density_width=512),
                     tcfg_overrides=dict(lr_init=4e-3, lr_final=4e-4)),
    "f64": dict(encoder="cp_hash", ema=0.999, lr_delay_frac=0.1,
                overrides=dict(cp_level_dim=64)),
    # batch 5: proposal-refinement suspects (never ran in batch 1 — the
    # 'lin' crash aborted the tail). zip dilates each level's weight
    # distribution before resampling (dilation_multiplier 0.5 +
    # bias 0.0025 in s-space) and anneals prop weights (slope 10);
    # both widen the final-level intervals the nerf MLP must integrate
    # over — along-ray IPE frequencies above ~1/interval cancel in the
    # multisample mean, so interval width IS the sharpness budget here.
    "nodil": dict(encoder="ipe",
                  overrides=dict(dilation_multiplier=0.0,
                                 dilation_bias=0.0)),
    "noanneal": dict(encoder="ipe", overrides=dict(anneal_slope=0.0)),
    "nodil_noanneal": dict(encoder="ipe",
                           overrides=dict(dilation_multiplier=0.0,
                                          dilation_bias=0.0,
                                          anneal_slope=0.0)),
    "jitter": dict(encoder="ipe", overrides=dict(single_jitter=False)),
    # more multisamples per interval (n=4 -> 7 ref hexagon)
    "n7": dict(encoder="ipe", overrides=dict(sample_n=7)),
    # oracle-adjacent: deeper hierarchy (32,32,32)+32
    "deep_hier": dict(encoder="ipe",
                      overrides=dict(num_prop_samples=(32, 32, 32),
                                     num_nerf_samples=32,
                                     num_levels=4)),
    # dilation off + reference sample budget: the final-interval width
    # is the along-ray sharpness budget; on this fixture the content
    # band is 0.93 m viewed at grazing incidence (ground plane), so
    # texture varies ALONG the ray and interval width blurs it.
    "nodil_samples": dict(encoder="ipe",
                          overrides=dict(dilation_multiplier=0.0,
                                         dilation_bias=0.0,
                                         num_prop_samples=(64, 64),
                                         num_nerf_samples=32)),
    "nodil_samples_wide": dict(
        encoder="ipe",
        overrides=dict(dilation_multiplier=0.0, dilation_bias=0.0,
                       num_prop_samples=(64, 64), num_nerf_samples=32,
                       ipe_density_width=512)),
    # batch 6: interval-width diagnostics. Give zip mip's final-interval
    # width outright — 64 nerf samples, dilation off (reciprocal of
    # bench_quality's mip_fine16 arm: if interval width is the binding
    # constraint, TRAIN psnr must climb past ~33 here and mip_fine16's
    # must fall toward it).
    "nerf64": dict(encoder="ipe",
                   overrides=dict(dilation_multiplier=0.0,
                                  dilation_bias=0.0,
                                  num_prop_samples=(64, 64),
                                  num_nerf_samples=64)),
    # multisample-blur control: one sample per interval (mip-like point
    # evaluation; removes the along-interval feature averaging without
    # touching the interval count)
    "n1": dict(encoder="ipe", overrides=dict(sample_n=1)),
    "nerf64_n1": dict(encoder="ipe",
                      overrides=dict(dilation_multiplier=0.0,
                                     dilation_bias=0.0,
                                     num_prop_samples=(64, 64),
                                     num_nerf_samples=64, sample_n=1)),
    # batch 7: the composite oracle. Batches 1-6 refuted every SINGLE
    # knob (incl. interval width: mip_fine16 still fits 41.6 train; zip
    # nerf64 stays at 30.9) — but no arm ever combined ALL the
    # mip-equivalences at once. If the gap is a sum of ~0.5 dB factors,
    # singles can't see it. mipeq = zip configured to be maximally
    # mip-like: unit-ball world (contraction identity), deg-16 IPE,
    # 512 trunk, mip's sample ladder with dilation off and point
    # evaluation (n=1), linear raydist (mip lindisp=False), MSE, no distortion loss, depth
    # supervision at mip's strength, mip's lr schedule. If mipeq ~= mip,
    # bisect back with the minus-arms; if it stays at ~28, the deficit
    # is in code paths no config reaches (IPE impl, density activation,
    # optimizer) and the hunt moves to activations-level diffing.
    "mipeq": dict(encoder="ipe", depth_mult=0.1,
                  overrides=dict(_MIPEQ_MODEL),
                  tcfg_overrides=dict(_MIPEQ_LOSS)),
    # bisection minus-arms (run only after mipeq's verdict)
    "mipeq_nodepth": dict(encoder="ipe",
                          overrides=dict(_MIPEQ_MODEL),
                          tcfg_overrides=dict(_MIPEQ_LOSS)),
    "mipeq_zipsamp": dict(encoder="ipe", depth_mult=0.1,
                          overrides={k: v for k, v in
                                     _MIPEQ_MODEL.items()
                                     if k in ("scene_scale",
                                              "ipe_max_deg",
                                              "ipe_density_width",
                                              "ipe_density_depth",
                                              "deg_view", "raydist_fn",
                                              "anneal_slope")},
                          tcfg_overrides=dict(_MIPEQ_LOSS)),
    "mipeq_ziploss": dict(encoder="ipe", depth_mult=0.1,
                          overrides=dict(_MIPEQ_MODEL)),
    # round-2 structural knobs that no batch ever touched (found by a
    # code diff of the two model configs): the reference waymo.gin
    # pins deg_view=1 on zip while mip ships deg_view=4, and mip's
    # trunk is 8 layers deep vs zip's ipe_density_depth=4.
    "degview4": dict(encoder="ipe", overrides=dict(deg_view=4)),
    "depth8": dict(encoder="ipe", overrides=dict(ipe_density_depth=8)),
    # batch 8: below-config bisects after mipeq itself scored 27.36 /
    # 31.25 — the composite of every config equivalence stays in the
    # 27-28 band, so the deficit is in (a) the proposal/resampling
    # chain, (b) the core forward path, or (c) the optimizer — the
    # three places the composite could not reach.
    # (a) prop chain removed: num_levels=1 makes the model one
    # stratified-uniform pass (sdist init [0,1], uniform weights), like
    # mip's coarse level with 128 samples. If train psnr jumps to ~41,
    # the prop/resample chain is the deficit; if it stays ~31, the core
    # forward path is.
    "noprop": dict(encoder="ipe",
                   overrides=dict(num_levels=1, num_nerf_samples=128),
                   tcfg_overrides=dict(anti_interlevel_loss_mult=0.0)),
    "mipeq_noprop": dict(
        encoder="ipe", depth_mult=0.1,
        overrides={**{k: v for k, v in _MIPEQ_MODEL.items()
                      if k not in ("num_prop_samples",
                                   "dilation_multiplier",
                                   "dilation_bias", "anneal_slope")},
                   "num_levels": 1, "num_nerf_samples": 128},
        tcfg_overrides={**_MIPEQ_LOSS,
                        "anti_interlevel_loss_mult": 0.0}),
    # (c) mip's optimizer: optax.adam defaults (b2 0.999, eps 1e-8) and
    # NO global grad clip, vs zip's reference-parity b2 0.99, eps 1e-15,
    # grad_max_norm 1e-3.
    "mipeq_mipopt": dict(encoder="ipe", depth_mult=0.1,
                         overrides=dict(_MIPEQ_MODEL),
                         tcfg_overrides={**_MIPEQ_LOSS,
                                         "adam_beta2": 0.999,
                                         "adam_eps": 1e-8,
                                         "grad_max_norm": 0.0}),
    # batch 9: TOPOLOGY bisects. The mipeq composite (27.36/31.25 at
    # 2k) equalized every config knob, but a code diff of the two MLPs
    # shows the zip trunk differs structurally from mip's NerfMLP in
    # ways no config reached: (1) no skip-cat of the encoding back into
    # the trunk (mip: after layer 4, models.py:268-272 — the classic
    # NeRF topology fix for 8-deep relu stacks), (2) the 64-wide
    # density_hidden choke between trunk and bottleneck (instant-NGP
    # heritage: right when hash tables carry capacity, wrong when the
    # trunk does), (3) IPE on scene_scale-shrunk coords loses
    # log2(1/0.2725) ~ 1.9 effective degrees vs mip's raw-coord IPE.
    "mipeq_skip4": dict(encoder="ipe", depth_mult=0.1,
                        overrides={**_MIPEQ_MODEL, "ipe_skip_layer": 4},
                        tcfg_overrides=dict(_MIPEQ_LOSS)),
    "mipeq_dh512": dict(encoder="ipe", depth_mult=0.1,
                        overrides={**_MIPEQ_MODEL,
                                   "density_hidden_width": 512},
                        tcfg_overrides=dict(_MIPEQ_LOSS)),
    "mipeq_deg18": dict(encoder="ipe", depth_mult=0.1,
                        overrides={**_MIPEQ_MODEL, "ipe_max_deg": 18},
                        tcfg_overrides=dict(_MIPEQ_LOSS)),
    "mipeq_arch": dict(encoder="ipe", depth_mult=0.1,
                       overrides={**_MIPEQ_MODEL, "ipe_skip_layer": 4,
                                  "density_hidden_width": 512,
                                  "ipe_max_deg": 18},
                       tcfg_overrides=dict(_MIPEQ_LOSS)),
    # the arch fixes on the SHIPPED zip config (power raydist, zip
    # samples, anneal, charb, distortion) — does the topology fix move
    # production zip, not just the mip-clone?
    "arch_ship": dict(encoder="ipe",
                      overrides=dict(ipe_skip_layer=4,
                                     density_hidden_width=512,
                                     ipe_density_width=512,
                                     ipe_density_depth=8,
                                     ipe_max_deg=16,
                                     scene_scale=0.2725)),
    # batch 10: the featurization transplant. mipeq_arch (topology
    # equalized) still lands at 27.65/31.95, so configs, optimizer,
    # prop chain AND trunk topology are all exonerated. 'mipcast'
    # swaps in mip's exact featurization (per-interval cylindrical
    # Gaussian cast + anisotropic diag IPE on raw world coords; no
    # multisample, no contraction) inside the zip hierarchy/trainer.
    # If it fits like mip (~41 train), the zip featurization chain is
    # the deficit and we bisect WHICH stage; if it stays ~31, the
    # trainer/data path is, and the sampler goes under the microscope.
    "mipcast": dict(encoder="mipcast", depth_mult=0.1,
                    overrides={**_MIPEQ_MODEL, "ipe_skip_layer": 4,
                               "density_hidden_width": 512},
                    tcfg_overrides=dict(_MIPEQ_LOSS)),
    "mipcast_plain": dict(encoder="mipcast", depth_mult=0.1,
                          overrides=dict(_MIPEQ_MODEL),
                          tcfg_overrides=dict(_MIPEQ_LOSS)),
    # batch 11: sample-placement + rendering bisects. The feature-
    # spectrum probe (scripts/probe_feature_spectrum.py) REFUTED
    # featurization band-limiting analytically (zip encodes to deg 15
    # vs mip's 13 on identical intervals), and noprop's 27 vs mipeq's
    # 27 may have DIFFERENT causes (128 uniform samples = 22 mm
    # spacing vs possible proposal collapse once mipeq stripped
    # dilation+anneal with resample_padding still 0).
    # (a) oracle density of samples: one level, 512 uniform — if
    # placement is the whole deficit this must fit ~41 train.
    "noprop512": dict(encoder="ipe",
                      overrides=dict(num_levels=1,
                                     num_nerf_samples=512),
                      tcfg_overrides=dict(anti_interlevel_loss_mult=0.0)),
    # (b) mip's anti-collapse floor on the mipeq resampler
    "mipeq_pad": dict(encoder="ipe", depth_mult=0.1,
                      overrides={**_MIPEQ_MODEL,
                                 "resample_padding": 0.01},
                      tcfg_overrides=dict(_MIPEQ_LOSS)),
    # (c) mip's compositing semantics: transparent background
    "mipeq_bg": dict(encoder="ipe", depth_mult=0.1,
                     overrides={**_MIPEQ_MODEL,
                                "opaque_background": False,
                                "bg_intensity_range": (0.0, 0.0)},
                     tcfg_overrides=dict(_MIPEQ_LOSS)),
    # batch 12: PRODUCTION form of the mipcast win (36.88/44.54 —
    # beats mip's own 33.65/41.57): anisotropic interval-cast IPE
    # through the contraction + trunk topology. 'aniso' = mipcast
    # protocol for 1:1 comparability (isolates the contraction's
    # cost vs raw-world coords); 'aniso_ship' = the same on the
    # SHIPPED zip protocol (power raydist, zip sample ladder, charb,
    # distortion, anneal, dilation) — the production candidate.
    "aniso": dict(encoder="ipe", depth_mult=0.1,
                  overrides={**_MIPEQ_MODEL, "ipe_anisotropic": True,
                             "ipe_skip_layer": 4,
                             "density_hidden_width": 512},
                  tcfg_overrides=dict(_MIPEQ_LOSS)),
    "aniso_ship": dict(encoder="ipe",
                       overrides=dict(ipe_anisotropic=True,
                                      ipe_skip_layer=4,
                                      density_hidden_width=512,
                                      ipe_density_width=512,
                                      ipe_density_depth=8,
                                      ipe_max_deg=16,
                                      scene_scale=0.2725)),
    # aniso_ship minus the depth/loss equalizers but with mip's lr?
    # keep one knob-free control: stock zip protocol + aniso featurizer
    # only (no topology) to separate the two factors on-protocol.
    "aniso_only": dict(encoder="ipe",
                       overrides=dict(ipe_anisotropic=True,
                                      ipe_max_deg=16,
                                      scene_scale=0.2725)),
    # batch 13: the anisotropic cast + topology on the cp_hash family
    # (per-axis CP profiles take the per-axis variances natively)
    "cns_aniso": dict(encoder="cp_hash",
                      overrides=dict(cp_anisotropic=True,
                                     ipe_skip_layer=4,
                                     density_hidden_width=512,
                                     ipe_density_width=512,
                                     ipe_density_depth=8,
                                     ipe_max_deg=16,
                                     scene_scale=0.2725)),
}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=2000)
  ap.add_argument("--batch", type=int, default=2048)
  ap.add_argument("--arms", nargs="+", default=list(ARMS))
  ap.add_argument("--seeds", type=int, nargs="+", default=[0],
                  help="seed-replication (VERDICT r4 #4: protocol "
                       "noise is +-0.4-1.2 dB; production-arm claims "
                       "need 3 seeds)")
  ap.add_argument("--out", type=str, default="")
  ap.add_argument("--milestones", type=float, nargs="+",
                  default=[0.25, 0.5, 1.0])
  args = ap.parse_args()

  scene = bq.load_fixture()
  lines = []
  for arm in args.arms:
    spec = ARMS[arm]
    for seed in args.seeds:
      r = bq.run_zip(scene, args.steps, args.batch, spec["encoder"],
                     milestones=tuple(args.milestones),
                     ema=spec.get("ema", 0.0),
                     overrides=spec.get("overrides"),
                     lr_delay_frac=spec.get("lr_delay_frac", 0.0),
                     depth_mult=spec.get("depth_mult", 0.0),
                     tcfg_overrides=spec.get("tcfg_overrides"),
                     seed=seed)
      rec = {"arm": arm, "steps": args.steps, "seed": seed,
             "wall_s": round(r["wall_s"], 1),
             "psnr": round(r["psnr"], 2),
             "train_psnr": round(r["train_psnr"], 2),
             "curve": r["curve"]}
      line = json.dumps(rec)
      print(line, flush=True)
      lines.append(line)
      if args.out:
        with open(args.out, "w") as f:
          f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
  main()
